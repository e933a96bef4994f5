package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Model-based randomized drive of the versioned sink: random batches of
  * upserts and tombstones (with in-batch key collisions, where DELETE WINS
  * by contract), random replayed batch ids (which must no-op), and random
  * half-open zonemap range scans — each step compared against a plain
  * in-memory Map applying the declared semantics. This compresses the
  * example-based PersistentSinkSpec/ZonemapSpec contracts into seeded
  * random evidence: any divergence between the bucket rewrite machinery
  * (staging, combiner, tombstone anti-join, zonemap carry/recompute,
  * pointer swap) and the abstract table semantics fails with a
  * reproducible seed.
  *
  * Raw ScalaCheck generators under fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache) — the MergeSpec convention.
  */
class SinkModelSpec extends SparkTestBase {

  private case class Op(rows: Seq[(Long, Long, Long, Boolean)], replay: Boolean)

  // batch: ≤8 rows over a tiny key space (forced cross-batch collisions),
  // ~1/4 deletes. Upsert keys are unique per batch (duplicate same-key
  // upserts in ONE batch are outside the combiner contract — real pipelines
  // dedup first), but a delete MAY collide with a same-batch upsert: that
  // is the contract-covered delete-wins case.
  private val opGen: Gen[Op] = for {
    n <- Gen.choose(0, 8)
    gs <- Gen.listOfN(n, Gen.choose(0L, 3L))
    ks <- Gen.listOfN(n, Gen.choose(0L, 5L))
    xs <- Gen.listOfN(n, Gen.choose(0L, 100L))
    ds <- Gen.listOfN(n, Gen.frequency(3 -> false, 1 -> true))
    replay <- Gen.frequency(4 -> false, 1 -> true)
  } yield {
    val raw = gs.lazyZip(ks).lazyZip(xs).lazyZip(ds).toList.map {
      case (g, k, x, d) => (g, k, x, d)
    }
    val (dels, ups) = raw.partition(_._4)
    Op(ups.distinctBy(r => (r._1, r._2)) ++ dels.distinctBy(r => (r._1, r._2)), replay)
  }

  private def sample(seed: Long): Op =
    opGen.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Op(Nil, replay = false))

  private def frame(rows: Seq[(Long, Long, Long, Boolean)]): DataFrame = {
    val session = spark
    import session.implicits._
    rows.toDF("g", "k", "x", ParquetTableSink.DeleteCol)
  }

  private def canon(df: DataFrame): Set[(Long, Long, Long)] = {
    val session = spark
    import session.implicits._
    df.select("g", "k", "x").as[(Long, Long, Long)].collect().toSet
  }

  // ---- schema-evolution histories: eras add columns, zones stay conservative ----

  /** Hostile string pool for the zone sidecar's line format: tabs,
    * newlines, URL metacharacters, unicode, the empty string, and the
    * literal text of the null sentinel itself — every one must round-trip
    * the URL-encoded (tab-separated, newline-framed) sidecar and the
    * TRY-cast back, or degrade to a conservative keep. */
  private val hostile = Vector(
    "plain", "a\tb", "c\nd", "pct%2Fenc", "sp ace", "uni✓code", "",
    "\u0000null", "zz~!@#$", "Ämlaut")

  private case class EvRow(g: Long, k: Long, x: Long, s: String,
                           y: Option[Long], t: Option[String], del: Boolean)

  test("evolution histories: era-mixed zones never silently drop buckets; hostile strings round-trip") {
    (0 until 3).foreach { drive =>
      val rnd = new scala.util.Random(9000 + drive)
      val dir = Files.createTempDirectory(s"graft-sink-evo-$drive").toString
      val session = spark
      import session.implicits._
      def frameOf(rows: Seq[EvRow], era: Int): DataFrame = {
        val base = rows.map(r => (r.g, r.k, r.x, r.s, r.y, r.t, r.del))
          .toDF("g", "k", "x", "s", "y", "t", ParquetTableSink.DeleteCol)
        // era 0 has no y/t, era 1 adds y, era 2 adds t — ADD-only evolution
        era match {
          case 0 => base.drop("y", "t")
          case 1 => base.drop("t")
          case _ => base
        }
      }
      // zonemap on x (long), s (hostile strings), and y — a column that
      // does not exist until era 1: its zones must begin recording then,
      // with era-0 buckets conservatively unskippable on y forever
      val sink = new ParquetTableSink(spark, dir,
        frameOf(Nil, 0).drop(ParquetTableSink.DeleteCol), keys = Seq("g", "k"),
        buckets = 4, route = col("g").cast("int"), zonemapCols = Seq("x", "s", "y"))
      val model = scala.collection.mutable.Map.empty[(Long, Long), EvRow]
      var batchId = -1L
      (0 until 9).foreach { step =>
        val era = step / 3
        val rows = (0 until 1 + rnd.nextInt(6)).map { _ =>
          EvRow(rnd.nextInt(4).toLong, rnd.nextInt(6).toLong,
            rnd.nextInt(100).toLong, hostile(rnd.nextInt(hostile.size)),
            if (era >= 1) Some(rnd.nextInt(50).toLong) else None,
            if (era >= 2) Some(hostile(rnd.nextInt(hostile.size))) else None,
            rnd.nextInt(4) == 0)
        }.distinctBy(r => (r.g, r.k, r.del)).toSeq
        val (ups, dels) = rows.partition(!_.del)
        val batch = ups.distinctBy(r => (r.g, r.k)) ++ dels
        batchId += 1
        sink.merge(frameOf(batch, era), batchId)
        batch.foreach(r => if (!r.del) model((r.g, r.k)) = r)
        batch.foreach(r => if (r.del) model.remove((r.g, r.k)))

        // 1. full state matches the model under the evolved (unified) schema
        val got = sink.current
          .select(col("g"), col("k"), col("x"), col("s"),
            (if (era >= 1) col("y") else lit(null).cast("long")).as("y"),
            (if (era >= 2) col("t") else lit(null).cast("string")).as("t"))
          .as[(Long, Long, Long, String, Option[Long], Option[String])]
          .collect().toSet
        val want = model.values
          .map(r => (r.g, r.k, r.x, r.s, r.y, r.t)).toSet
        assert(got == want, s"drive $drive step $step: state diverged")

        // 2. zonemap range scan on the base column never loses a row
        val lo = rnd.nextInt(90).toLong; val hi = lo + 1 + rnd.nextInt(20)
        assert(canon(sink.scanRange("x", lo, hi)) ==
          model.values.collect { case r if r.x >= lo && r.x < hi => (r.g, r.k, r.x) }.toSet,
          s"drive $drive step $step: scanRange x [$lo,$hi) diverged")

        // 3. auto-routed string filter over hostile zone content
        val pivot = hostile(rnd.nextInt(hostile.size))
        val gotS = sink.table().filter(col("s") >= pivot)
          .select("g", "k", "x").as[(Long, Long, Long)].collect().toSet
        assert(gotS == model.values
          .collect { case r if r.s >= pivot => (r.g, r.k, r.x) }.toSet,
          s"drive $drive step $step: routed filter s >= ${pivot.map(_.toInt)} diverged")

        // 4. the era-added column: absent-era buckets keep (no entry),
        // post-era buckets prune — and values never diverge
        if (era >= 1) {
          val (ylo, yhi) = (rnd.nextInt(40).toLong, rnd.nextInt(40) + 10L)
          assert(canon(sink.scanRange("y", ylo, yhi)) ==
            model.values.collect {
              case r if r.y.exists(v => v >= ylo && v < yhi) => (r.g, r.k, r.x)
            }.toSet,
            s"drive $drive step $step: scanRange y [$ylo,$yhi) diverged")
        }
      }
      // era-0 data dirs can still be live in the current manifest; their
      // zone entries must simply lack y — provably-unskippable, never wrong
      val zones = sink.readZones(sink.versions.last)
      assert(zones.values.forall(cols => cols.contains("x") && cols.contains("s")),
        "every committed bucket keeps zones for the base columns")
    }
  }

  test("random upsert/delete/replay drives match the Map model; range scans match the filter") {
    (0 until 3).foreach { drive =>
      val dir = Files.createTempDirectory(s"graft-sink-model-$drive").toString
      val sink = new ParquetTableSink(spark, dir,
        frame(Nil).drop(ParquetTableSink.DeleteCol), keys = Seq("g", "k"),
        buckets = 4, route = col("g").cast("int"), zonemapCols = Seq("x"))
      val model = scala.collection.mutable.Map.empty[(Long, Long), Long]
      var batchId = -1L
      (0 until 6).foreach { step =>
        val op = sample(drive * 1000L + step)
        if (op.replay && batchId >= 0) {
          // a replayed (already-committed) batch id must be a no-op even
          // with DIFFERENT content — the exactly-once guard, not idempotence
          sink.merge(frame(op.rows), batchId)
        } else {
          batchId += 1
          sink.merge(frame(op.rows), batchId)
          // model semantics: upserts apply in order (last writer wins),
          // then this batch's tombstones (delete wins over same-batch upsert)
          op.rows.foreach { case (g, k, x, d) => if (!d) model((g, k)) = x }
          op.rows.foreach { case (g, k, _, d) => if (d) model.remove((g, k)) }
        }
        assert(canon(sink.current) ==
          model.map { case ((g, k), x) => (g, k, x) }.toSet,
          s"drive $drive step $step: table diverged from model (op=$op)")
        val lo = (drive * 7 + step * 13) % 90
        val hi = lo + 1 + (step * 17) % (101 - lo)
        assert(canon(sink.scanRange("x", lo, hi)) ==
          model.collect { case ((g, k), x) if x >= lo && x < hi => (g, k, x) }.toSet,
          s"drive $drive step $step: scanRange($lo,$hi) diverged (op=$op)")
      }
    }
  }
}
