package graft.operators

import java.nio.file.Files

import graft.SparkTestBase

/** Controlled-fixture tests for the near-dup and ANN pipelines: plant known
  * duplicates/neighbors in temp parquet tables shaped like the driver
  * testdata and assert the pipelines find exactly them.
  */
class DedupSimilaritySpec extends SparkTestBase {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-docs").toString
    rows.map { case (id, text) => (id, text, "en", "test", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def writeVecs(rows: Seq[(Long, Array[Float], Int)]): String = {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-vecs").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm mat near the old oak door and the clock ticks softly"

  test("planesFor: one extra bit per corpus doubling, base-anchored, capped") {
    // base regime: everything at or below the calibration size stays at 6
    assert(Seq(1L, 500L, 2000L, 3999L).map(Similarity.planesFor) == Seq(6, 6, 6, 6))
    // doubling steps: floor(log2(n/N0)) — integer division first, like the
    // oracle's `//`, so 3999 rounds down and 4000 steps up
    assert(Similarity.planesFor(4000L) == 7)
    assert(Similarity.planesFor(20000L) == 9)   // sf1
    assert(Similarity.planesFor(200000L) == 12) // sf10
    // cap: never beyond MAX_PLANES (the oracle computes exactly that many
    // sign bits, so a P past it would break the mask)
    assert(Similarity.planesFor(Long.MaxValue / 2) == Similarity.MAX_PLANES)
    // monotone: occupancy control must never DECREASE resolution with n
    val samples = Seq(1L, 1999L, 2000L, 4000L, 8000L, 1000000L, 100000000L)
    assert(samples.map(Similarity.planesFor) == samples.map(Similarity.planesFor).sorted)
  }

  test("tablesFor: T(P) compensation engages past the graded scales, monotone, pinned") {
    // bit-identity guard: every graded corpus (sf0.01 200 vecs .. sf10 200k
    // vecs, P <= 12) must keep the historical 3 tables
    assert((6 to 12).map(Similarity.tablesFor).forall(_ == 3))
    // the pinned step table: smallest T with 1-(1-0.898922^P)^T >= 0.6
    // (design-point cosine 0.95), floored at 3
    assert(Seq(13, 14, 15, 16, 17, 18, 19, 20).map(Similarity.tablesFor) ==
      Seq(4, 4, 5, 5, 6, 6, 7, 8))
    def recall(p: Int, t: Int): Double = 1 - math.pow(1 - math.pow(0.898922, p), t)
    (13 to 20).foreach { p =>
      val t = Similarity.tablesFor(p)
      assert(recall(p, t) >= 0.6, s"P=$p T=$t must clear the 0.6 design floor")
      assert(t == 3 || recall(p, t - 1) < 0.6, s"P=$p T=$t must be the SMALLEST such T")
    }
    assert((6 to 20).map(Similarity.tablesFor) == (6 to 20).map(Similarity.tablesFor).sorted)
  }

  test("md5 planes are pairwise near-orthogonal across the FULL plane budget") {
    // The round-19 LCG lattice failure mode, spec-pinned so it cannot
    // return: planes 4 and 13 measured cos = 0.9987 (one bucket bit fully
    // redundant; 230x candidate inflation at 5M vectors) and every pair 9
    // apart ~0.91. Independence is the property planesFor's occupancy
    // model STANDS ON — a correlated pair halves effective P and doubles
    // occupancy at that scale, invisible to every oracle grade (the
    // oracle mirrors the same planes). Assert it over ALL planes any
    // table/probe configuration can touch — the full MAX_TABLES x
    // MAX_PLANES layout, including the P = 18-20 extension region no
    // graded corpus reaches yet — so a generator regression fails HERE,
    // in milliseconds, not in the next 5M-vector smoke. Bound calibration:
    // random pairs in 64-dim concentrate near cos 0 with sd ~ 1/8, and the
    // EXPECTED MAX over these 12,720 pairs is ~ (1/8)*sqrt(2 ln 12720) ~
    // 0.54 — the honest generator's measured worst pair (97, 103) sits at
    // 0.509, ON that curve (deterministic: md5 never changes, so neither
    // does this number). 0.6 separates cleanly: above every honest tail,
    // far below the lattice's 0.91 / 0.9987 family.
    val planes = (for (t <- 0 until Similarity.MAX_TABLES;
                       p <- 0 until Similarity.MAX_PLANES)
      yield Similarity.planeIndex(t, p)).distinct.sorted
      .map(i => i -> Similarity.planeVals(i))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val worst = (for {
      ((i, a), x) <- planes.zipWithIndex
      (j, b) <- planes.drop(x + 1)
    } yield (i, j, math.abs(cos(a, b)))).maxBy(_._3)
    assert(worst._3 <= 0.6,
      s"planes ${worst._1} and ${worst._2} measure |cos|=${worst._3} — " +
        "generator correlation; the occupancy model (and planesFor) no longer hold")
  }

  test("plane layout is frozen: legacy bits keep their planes, extension bits are disjoint") {
    // every graded bucket bit at every scale was computed on plane
    // table*16 + p — the MAX_PLANES raise must not move ANY of them
    for (t <- 0 until 8; p <- 0 until 16)
      assert(Similarity.planeIndex(t, p) == t * 16 + p)
    // extension bits (P > 16, engages at 4.1M vectors) live far above the
    // legacy region and never collide across (table, p)
    val ext = for (t <- 0 until 8; p <- 16 until Similarity.MAX_PLANES)
      yield Similarity.planeIndex(t, p)
    assert(ext.forall(_ >= 4096) && ext.distinct.size == ext.size)
    val legacy = for (t <- 0 until 8; p <- 0 until 16) yield Similarity.planeIndex(t, p)
    assert((legacy.toSet & ext.toSet).isEmpty)
  }

  test("MinHash LSH finds the planted near-dup pair and only it") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(
      1L -> base,
      2L -> base.replace("clock", "bell"), // near-dup of 1
      3L -> "completely unrelated content about spark catalyst optimizer rules and physical plans"))
    val pairs = DedupText.queries("dedup_lsh_pairs")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(pairs.head._3 > 0.7 && pairs.head._3 < 1.0)

    val dropped = DedupText.queries("dedup_drop_list")(spark, dir)
      .as[Long].collect().toSeq
    assert(dropped == Seq(2L), "keep-lowest-id policy drops doc 2")
  }

  test("identical documents reach Jaccard 1.0; exact dedup counts them once") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(1L -> base, 2L -> base))
    val pairs = DedupText.queries("dedup_lsh_pairs")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
    val (nDocs, nDistinct) = DedupText.queries("dedup_exact")(spark, dir)
      .as[(Long, Long)].collect().head
    assert(nDocs == 2L && nDistinct == 1L)
  }

  test("duplicated-span detection finds exactly the planted verbatim passage") {
    val session = spark
    import session.implicits._
    // two docs globally dissimilar except a 12-token verbatim passage; with
    // SPAN_N = 8 the grams fully inside the passage are positions 10..14 in
    // both docs → one run of 5; every straddling gram mixes in unique
    // prefix/suffix tokens and must not match
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    val dir = writeDocs(Seq(
      1L -> s"one two three four five six seven eight nine ten $shared acorn birch cedar dogwood elm fir ginkgo hazel ivy juniper",
      2L -> s"red orange yellow green blue indigo violet magenta cyan teal $shared mercury venus earth mars jupiter saturn uranus neptune pluto ceres",
      3L -> "totally distinct filler prose with nothing repeated anywhere else in this corpus at all"))
    val got = DedupText.queries("dedup_spans")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 25L, 5L, 5L), (2L, 25L, 5L, 5L)),
      "each doc: 32 tokens -> 25 gram positions, 5 duplicated, one run of 5")
  }

  test("hamming banding has EXACT recall vs brute force when no bucket caps") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    // small corpus → every (band, bits) bucket far under MAX_BUCKET, so the
    // pigeonhole guarantee is testable as strict set equality: 6 bands of 10
    // bits over 60 must find EVERY pair with hamming <= 2, not just most
    val dir = writeDocs(Seq(
      1L -> base,
      2L -> base,                           // identical → hamming 0
      3L -> base.replace("clock", "bell"),  // near-identical token set
      4L -> "completely different content about catalyst optimizer internals",
      5L -> "yet another unrelated document mentioning parquet row groups",
      6L -> "the quick brown fox appears here too but with mostly new words around it"))
    val banded = DedupText.queries("dedup_hamming")(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("hs", DedupText.tokenHashes)
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), DedupText.simhash60(col("hs")).as("sig"))
    val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("h"))
      .filter(col("h") <= DedupText.HAM_K)
      .as[(Long, Long, Int)].collect().toSet
    assert(brute.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0),
      "the identical pair must be in the ground truth at hamming 0")
    assert(banded == brute,
      s"banding must find exactly the brute-force pairs: banded=$banded brute=$brute")
  }

  test("hamming combo keys survive single-band bucket saturation (the 65k-doc cliff)") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    // planted pair: sigs differ in 2 bits, BOTH inside band 0 — so the pair
    // agrees on bands 1..5 and on every 4-band combo excluding band 0.
    // 70 filler docs per band j share the planted sig's band-j bits (zero)
    // but carry distinct nonzero bits in every OTHER band: under the OLD
    // single-band keys every (band, bits=0) bucket held 72 > MAX_BUCKET=64
    // docs and the planted pair was silently dropped; under the 4-band
    // combo keys each filler's key differs from the planted key in ≥ 3
    // bands, so the planted combo bucket holds exactly the pair.
    val r = DedupText.SIM_BITS / DedupText.SIM_BANDS
    val planted = Seq((1L, 0L), (2L, 3L)) // hamming 2, both bits in band 0
    val fillers = for {
      j <- 0 until DedupText.SIM_BANDS
      i <- 0 until 70
    } yield {
      val sig = (0 until DedupText.SIM_BANDS).map { b =>
        if (b == j) 0L else ((i * 6 + b) % 1023 + 1).toLong << (b * r)
      }.reduce(_ | _)
      (100L + j * 100 + i, sig)
    }
    val sigs = (planted ++ fillers).toDF("doc_id", "sig")
    val got = DedupText.hammingPairs(sigs)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 2)),
      "the planted pair must survive saturation of every single-band bucket")
    // and nothing false: every emitted pair really is within HAM_K
    val bySig = (planted ++ fillers).toMap
    assert(got.forall { case (a, b, h) =>
      java.lang.Long.bitCount(bySig(a) ^ bySig(b)) == h && h <= DedupText.HAM_K })
  }

  test("hamming cluster fold groups the replica cluster the pair kernel's cap sheds") {
    val session = spark
    import session.implicits._
    // The saturation audit's sf100 catch in miniature: 70 IDENTICAL sigs
    // (> MAX_BUCKET = 64) saturate every combo bucket, so the PAIR kernel
    // sheds the whole replica cluster by its declared contract — while the
    // fold collapses them to ONE sig-node before any bucket forms, so the
    // cluster lane still groups all 70. A second, unsaturated near-dup pair
    // (hamming 1) must cluster through a real rep edge in the same run.
    val sigs = ((1L to 70L).map(i => (i, 0x0F0F0F0F0FL)) ++
      Seq((100L, 0x123456789AL), (101L, 0x123456789BL)))
      .toDF("doc_id", "sig")
    val shed = DedupText.hammingPairs(sigs)
      .filter($"doc_a" <= 70L && $"doc_b" <= 70L).count()
    assert(shed == 0L, "the pair kernel must shed the saturated replica bucket")
    val clusters = DedupText.hammingClustersFrom(sigs)
      .as[(Long, Long)].collect().toMap
    assert(clusters.size == 72, "every doc must receive a cluster label")
    assert((1L to 70L).forall(clusters(_) == 1L),
      "all 70 replicas must fold into the min-doc cluster the pair kernel lost")
    assert(clusters(100L) == 100L && clusters(101L) == 100L,
      "the hamming-1 pair must cluster through the rep graph")
  }

  test("hamming clusters are the transitive closure of the pair lane when nothing sheds") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(
      1L -> base,
      2L -> base,                           // hamming 0 of 1
      3L -> base.replace("clock", "bell"),  // near-identical token set
      4L -> "completely different content about catalyst optimizer internals",
      5L -> "yet another unrelated document mentioning parquet row groups"))
    val pairs = DedupText.queries("dedup_hamming")(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    // doc-level closure of the (uncapped) pair graph, computed in the test
    val parent = scala.collection.mutable.Map((1L to 5L).map(i => i -> i): _*)
    def root(x: Long): Long = if (parent(x) == x) x else { val r = root(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (root(a), root(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (1L to 5L).map(i => i -> root(i)).toMap
    val got = DedupText.queries("dedup_hamming_clusters")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == expected,
      s"cluster lane must equal the pair graph's transitive closure: got=$got expected=$expected")
  }

  test("brute-force cosine top-k ranks the colinear vector first") {
    val session = spark
    import session.implicits._
    // vec 0 is a probe (vec_id % 100 == 0); vec 1 is colinear (cos = 1),
    // vec 2 orthogonal (cos = 0), vec 3 opposite (cos = -1)
    val dir = writeVecs(Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(2f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 3f, 0f, 0f), 1),
      (3L, Array(-1f, 0f, 0f, 0f), 2)))
    val got = Similarity.queries("sim_topk_brute")(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1, 1L, 1.0), (0L, 2, 2L, 0.0), (0L, 3, 3L, -1.0)))
  }

  test("simhash of identical docs is identical; different docs differ") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(1L -> base, 2L -> base,
      3L -> "alpha beta gamma delta epsilon zeta eta theta"))
    val hs = DedupText.queries("dedup_simhash")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(2L))
    assert(hs(1L) != hs(3L))
  }
}
