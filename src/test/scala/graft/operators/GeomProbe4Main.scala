package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scheme shootout for the cross-band correlation found by probe 3: planted
  * pair recall (>=1 agreeing band) at (8,4) and (12,8) under
  *   A: shared base hash, xor seeds (current engine),
  *   B: per-band independent md5 base + xor seeds within band,
  *   C: per-band multiply-scramble of the shared base + xor seeds.
  */
object GeomProbe4Main {
  private val M60 = (1L << 60) - 1

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = spark
    import session.implicits._

    val vocabSize = 5000
    val nBg = 256000
    val N_PAIRS = 200
    val DOC_WORDS = 60
    val PLANT_BASE = 1000000L
    val rnd = new Random(42 + vocabSize)
    val vocab = (0 until vocabSize).map(i => s"w${i}x")
    def doc(): Array[String] = Array.fill(DOC_WORDS)(vocab(rnd.nextInt(vocab.size)))
    val bg = (0 until nBg).map(i => (i.toLong, doc().mkString(" ")))
    val pairs = (0 until N_PAIRS).map { p =>
      val base = doc()
      val edits = if (p < N_PAIRS / 2) 1 else 2
      val near = base.clone()
      (0 until edits).foreach(e => near(7 + 17 * e) = vocab(rnd.nextInt(vocab.size)))
      val (ida, idb) = (PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)
      Seq((ida, base.mkString(" ")), (idb, near.mkString(" ")))
    }
    val docs = (bg ++ pairs.flatten).toDF("doc_id", "text").repartition(col("doc_id"))
    val sets = DedupText.withWordShingles(docs)
      .filter(size(col("s")) > 0).cache()
    sets.count()

    def h60c(seed: Int, x: Column): Column = Hashing.h60(
      concat(lit(s"$seed:"), x))
    // 60-bit rotation + xor constant: overflow-free (mask before shift),
    // expressible identically in DuckDB
    def rot60(g: Int, h: Column): Column = {
      val k = (7 * g + 3) % 60
      val c = (0xD1B54A32D192ED03L * (g + 1)) & M60
      (shiftleft(h.bitwiseAND(lit((1L << (60 - k)) - 1)), k)
        .bitwiseOR(shiftright(h, 60 - k))).bitwiseXOR(lit(c))
    }

    def recallOf(label: String, r: Int, b: Int, baseFor: Int => Column): Unit = {
      val t0 = System.nanoTime()
      val withSigs = (0 until b).foldLeft(sets.select(col("doc_id"), col("s"))) {
        (df, g) =>
          val hsg = baseFor(g)
          df.withColumn(s"sig_$g", md5(concat_ws(",", (0 until r).map { k =>
            array_min(transform(hsg, h =>
              h.bitwiseXOR(lit(DedupText.seed(g * r + k)))))
          }: _*)))
      }
      val bands = withSigs.select(col("doc_id"),
        explode(array((0 until b).map(g =>
          struct(lit(g).as("band"), col(s"sig_$g").as("sig"))): _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .filter(col("a.doc_id") >= PLANT_BASE)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .as[(Long, Long)].collect().toSet
      val hit1 = (0 until N_PAIRS / 2)
        .count(p => cand.contains((PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)))
      val hit2 = (N_PAIRS / 2 until N_PAIRS)
        .count(p => cand.contains((PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label r=$r b=$b: 1-edit ${hit1 * 2.0 / N_PAIRS}%.3f  " +
        f"2-edit ${hit2 * 2.0 / N_PAIRS}%.3f  mixed ${(hit1 + hit2).toDouble / N_PAIRS}%.3f  (${secs}%.1f s)")
    }

    for ((r, b) <- Seq((8, 4), (12, 8))) {
      val shared = transform(col("s"), x => h60c(0, x))
      recallOf("A shared-xor    ", r, b, _ => shared)
      recallOf("B per-band-md5  ", r, b, g => transform(col("s"), x => h60c(1000 + g, x)))
      recallOf("C rot-mix       ", r, b, g => transform(shared, h => rot60(g, h)))
    }
    spark.stop()
  }
}
