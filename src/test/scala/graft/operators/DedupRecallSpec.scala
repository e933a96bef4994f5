package graft.operators

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Dedup-family recall, measured — not argued — against exact-Jaccard
  * ground truth on planted corpora (the dedup twin of AnnRecallSpec,
  * added after the r14 char-lane band widening traded one borderline
  * pair at sf0.01: the geometry's recall now has a pinned floor).
  *
  * Fixture: 300 background docs of 60 words each, plus 40 planted
  * near-dup pairs — 20 light (one word replaced) and 20 heavier (two
  * words replaced). Recall is measured on the planted pairs (verified
  * brute-force to clear each lane's graded threshold: word-3-shingles
  * ≥ 0.5 for dedup_lsh_pairs, char-6-grams ≥ 0.6 for dedup_ngram); the
  * graded queries verify candidates with the same exact Jaccard, so any
  * recall loss is candidate generation alone: band non-collision plus
  * MAX_BUCKET drops. Exactness is pinned the other way too — every
  * emitted pair must be in the brute-force threshold-truth.
  *
  * Two background-similarity levels exercise exactly the regime the 3×8
  * char geometry was widened for:
  *   - vocab 5000: organic low background (char-gram J ≈ 0)
  *   - vocab 30:   template-heavy background (shared vocabulary pushes
  *     char-gram background J to the 0.3–0.5 band where the old 2×4
  *     geometry went quadratic; bucket sizes grow, MAX_BUCKET engages)
  *
  * Expected from the band geometry (p = 1 − (1 − J^r)^b):
  *   - word lane 4×2: 1-edit J ≈ 0.9 → p ≈ 0.9997; 2-edit J ≈ 0.7 →
  *     p ≈ 0.93 — mixed expectation ≈ 0.96
  *   - char lane 3×8: 1-edit J ≈ 0.94 → p ≈ 0.94; 2-edit J ≈ 0.89 →
  *     p ≈ 0.77 — mixed expectation ≈ 0.85
  * The asserted floors (0.85 word, 0.65 char) sit under those rates but
  * far above what a broken geometry or an over-eager bucket cap yields.
  */
class DedupRecallSpec extends SparkTestBase {

  private val N_BG = 300
  private val N_PAIRS = 40
  private val DOC_WORDS = 60
  /** Planted-pair id base — above any background id at every corpus size. */
  private val PLANT_BASE = 1000000L

  /** Planted corpus: background docs + near-dup pairs, deterministic. */
  private def plantCorpus(vocabSize: Int, nBg: Int = N_BG): String = {
    val rnd = new Random(42 + vocabSize)
    val vocab = if (vocabSize >= 1000)
      (0 until vocabSize).map(i => s"w${i}x") // distinct, no substring overlap
    else
      (0 until vocabSize).map(i => s"word${i}q")
    def doc(): Array[String] = Array.fill(DOC_WORDS)(vocab(rnd.nextInt(vocab.size)))
    val bg = (0 until nBg).map(i => (i.toLong, doc().mkString(" ")))
    val pairs = (0 until N_PAIRS).map { p =>
      val base = doc()
      val edits = if (p < N_PAIRS / 2) 1 else 2
      val near = base.clone()
      (0 until edits).foreach { e =>
        near(7 + 17 * e) = vocab(rnd.nextInt(vocab.size))
      }
      val (ida, idb) = (PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)
      Seq((ida, base.mkString(" ")), (idb, near.mkString(" ")))
    }
    val dir = Files.createTempDirectory(s"graft-dedup-recall-$vocabSize-$nBg").toString
    val session = spark
    import session.implicits._
    (bg ++ pairs.flatten).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Exact ground truth: every (a < b) pair whose Jaccard over `sets`'
    * shingle column clears `threshold` — brute force over the small
    * planted corpus (the graded queries must never do this; the TEST may). */
  private def exactTruth(sets: DataFrame, threshold: Double): Set[(Long, Long)] = {
    val session = spark
    import session.implicits._
    val a = sets.select(col("doc_id").as("doc_a"), col("s").as("s_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("s").as("s_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j", DedupText.jaccard(col("s_a"), col("s_b")))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSet
  }

  private def gotPairs(query: String, dir: String): Set[(Long, Long)] = {
    val session = spark
    import session.implicits._
    DedupText.queries(query)(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
  }

  private def recallAt(vocabSize: Int): (Double, Double) = {
    val dir = plantCorpus(vocabSize)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val wordTruth = exactTruth(
      DedupText.withWordShingles(docs).filter(size(col("s")) > 0), 0.5)
    val charTruth = exactTruth(
      docs.withColumn("s",
          graft.functions.ShingleExpression.charShingles(col("text"), 6))
        .select(col("doc_id"), col("s")), 0.6)
    // recall is measured on the PLANTED near-dups (J ≈ 0.9 — the pairs the
    // geometry is built to catch). The full threshold-truth additionally
    // contains borderline background pairs at J barely over the threshold,
    // where the S-curve (p = 1 − (1 − J^r)^b, centered near (1/b)^(1/r))
    // is DESIGNED to pass almost nothing — at vocab 30 the char lane's
    // threshold-truth is dominated by such J ≈ 0.6 background pairs.
    val planted = (0 until N_PAIRS)
      .map(p => (PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)).toSet
    assert(planted.subsetOf(wordTruth) && planted.subsetOf(charTruth),
      s"every planted pair must clear both thresholds " +
        s"(word ${wordTruth.size}, char ${charTruth.size})")

    val wordGot = gotPairs("dedup_lsh_pairs", dir)
    val charGot = gotPairs("dedup_ngram", dir)
    // the graded outputs verify with exact Jaccard — they can only MISS
    // truth pairs, never add false ones
    assert(wordGot.subsetOf(wordTruth), "word-lane output must be truth-exact")
    assert(charGot.subsetOf(charTruth), "char-lane output must be truth-exact")
    info(s"threshold-truth sizes: word ${wordTruth.size} " +
      s"(found ${wordTruth.count(wordGot.contains)}), " +
      s"char ${charTruth.size} (found ${charTruth.count(charGot.contains)})")

    (planted.count(wordGot.contains).toDouble / planted.size,
      planted.count(charGot.contains).toDouble / planted.size)
  }

  test("recall floors vs exact Jaccard: low-similarity background (vocab 5000)") {
    val (word, char) = recallAt(5000)
    info(f"vocab 5000: word-lane recall $word%.3f, char-lane recall $char%.3f")
    assert(word >= 0.85, f"word-lane (4×2) recall floor 0.85, measured $word%.3f")
    assert(char >= 0.65, f"char-lane (3×8) recall floor 0.65, measured $char%.3f")
  }

  test("recall floors hold under template-heavy background (vocab 30, buckets engage)") {
    val (word, char) = recallAt(30)
    info(f"vocab 30: word-lane recall $word%.3f, char-lane recall $char%.3f")
    assert(word >= 0.85, f"word-lane (4×2) recall floor 0.85, measured $word%.3f")
    assert(char >= 0.65, f"char-lane (3×8) recall floor 0.65, measured $char%.3f")
  }

  /** Planted recall at an ELEVATED adaptive geometry: ~8.2k docs → corpus
    * ratio 4 → word r0+2 (4×4), char r0+1 at its half-rate schedule
    * (3×9). Ground truth here
    * is the planted pairs alone — the graded queries verify every candidate
    * with exact Jaccard, so emitted ⊆ threshold-truth holds by
    * construction and the 33M-pair brute-force adds nothing. The planted
    * pairs' own threshold clearance IS re-proven (cheap 80-doc self-join). */
  private def plantedRecallAt(vocabSize: Int, nBg: Int): (Double, Double) = {
    val dir = plantCorpus(vocabSize, nBg)
    val n = graft.Tables.cachedCount(spark, dir, "documents")
    assert(DedupText.rowsFor(n, DedupText.WORD_R0, DedupText.WORD_MAX_R)
        == DedupText.WORD_R0 + 2,
      s"fixture must force the r0+2 geometry (n = $n)")
    val planted = (0 until N_PAIRS)
      .map(p => (PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)).toSet
    val plantedDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= PLANT_BASE)
    val wordTruth = exactTruth(
      DedupText.withWordShingles(plantedDocs).filter(size(col("s")) > 0), 0.5)
    val charTruth = exactTruth(
      plantedDocs.withColumn("s",
          graft.functions.ShingleExpression.charShingles(col("text"), 6))
        .select(col("doc_id"), col("s")), 0.6)
    assert(planted.subsetOf(wordTruth) && planted.subsetOf(charTruth),
      "every planted pair must clear both thresholds")
    val wordGot = gotPairs("dedup_lsh_pairs", dir)
    val charGot = gotPairs("dedup_ngram", dir)
    (planted.count(wordGot.contains).toDouble / planted.size,
      planted.count(charGot.contains).toDouble / planted.size)
  }

  test("adaptive rows-per-band: planted recall floors at elevated r (8.2k docs)") {
    // expected from p = 1-(1-J^r)^b: word 4×4 — 1-edit J≈0.9 → 0.99,
    // 2-edit J≈0.81 → 0.88; char 3×9 (half-rate schedule: +1 row at
    // ratio 4) — 1-edit J≈0.94 → 0.92, 2-edit J≈0.89 → 0.73. Floors sit
    // under the mixed expectations.
    val (word, char) = plantedRecallAt(5000, 8100)
    info(f"elevated r (vocab 5000, 8.2k docs): word $word%.3f, char $char%.3f")
    assert(word >= 0.80, f"word-lane (4×4) recall floor 0.80, measured $word%.3f")
    assert(char >= 0.65, f"char-lane (3×9) recall floor 0.65, measured $char%.3f")
  }

  test("rowsFor schedule: one row per `step` corpus doublings from N0, capped") {
    import DedupText._
    // base geometry through 2×N0 — the sf0.01 gate (500 docs) and the
    // small recall fixtures (~680 docs) stay exactly as graded
    assert(rowsFor(1, WORD_R0, WORD_MAX_R) == WORD_R0)
    assert(rowsFor(500, WORD_R0, WORD_MAX_R) == WORD_R0)
    assert(rowsFor(2 * DOC_N0 - 1, WORD_R0, WORD_MAX_R) == WORD_R0)
    // word lane: one row per doubling
    assert(rowsFor(2 * DOC_N0, WORD_R0, WORD_MAX_R) == WORD_R0 + 1)
    assert(rowsFor(5000, WORD_R0, WORD_MAX_R) == WORD_R0 + 1)   // sf0.1
    assert(rowsFor(4 * DOC_N0, WORD_R0, WORD_MAX_R) == WORD_R0 + 2)
    assert(rowsFor(50000, WORD_R0, WORD_MAX_R) == WORD_R0 + 4)  // sf1 organic
    // char lane: one row per TWO doublings (NGRAM_STEP = 2)
    assert(rowsFor(5000, NGRAM_R0, NGRAM_MAX_R, NGRAM_STEP) == NGRAM_R0)      // sf0.1
    assert(rowsFor(4 * DOC_N0, NGRAM_R0, NGRAM_MAX_R, NGRAM_STEP) == NGRAM_R0 + 1)
    assert(rowsFor(50000, NGRAM_R0, NGRAM_MAX_R, NGRAM_STEP) == NGRAM_R0 + 2) // sf1
    assert(rowsFor(500000, NGRAM_R0, NGRAM_MAX_R, NGRAM_STEP) == NGRAM_R0 + 3) // sf10
    // word lane past the OLD r = 8 cap (retired round 18): r keeps growing
    // to 12, with bands compensating (see the bandsFor test below)
    assert(rowsFor(500000, WORD_R0, WORD_MAX_R) == WORD_R0 + 7)  // sf10 → r = 9
    assert(rowsFor(5400000, WORD_R0, WORD_MAX_R) == WORD_MAX_R)  // sf100 → 2+11 ≥ 12
    // caps
    assert(rowsFor(Long.MaxValue / 2, WORD_R0, WORD_MAX_R) == WORD_MAX_R)
    assert(rowsFor(Long.MaxValue / 2, NGRAM_R0, NGRAM_MAX_R, NGRAM_STEP) == NGRAM_MAX_R)
  }

  test("bandsFor: compensating bands hold the S-curve midpoint at ~0.84 past r = 8") {
    import DedupText._
    // fixed b = 4 through the old cap — every corpus under 128k docs keeps
    // the exact geometry it was graded with
    (WORD_R0 to 8).foreach(r => assert(bandsFor(r) == BANDS, s"r=$r"))
    // past it, b = r − 4: the midpoint J* = (1/b)^(1/r) stays put
    assert(bandsFor(9) == 5 && bandsFor(10) == 6 && bandsFor(11) == 7 && bandsFor(12) == 8)
    (9 to 12).foreach { r =>
      val jStar = math.pow(1.0 / bandsFor(r), 1.0 / r)
      assert(math.abs(jStar - 0.84) < 0.006,
        f"J*(r=$r, b=${bandsFor(r)}) = $jStar%.4f must hold the graded 0.84 midpoint")
    }
  }

  test("ngramBandsFor: char compensating bands hold the S-curve midpoint at ~0.872") {
    import DedupText._
    // fixed b = 3 through r = 9 — every corpus under 32k docs keeps the
    // exact geometry it was graded with (sf0.01, sf0.1, the fixtures above)
    (NGRAM_R0 to 9).foreach(r => assert(ngramBandsFor(r) == NGRAM_BANDS, s"r=$r"))
    // past it the pinned step table tracks b ≈ 3^(r/8), holding the char
    // base midpoint (1/3)^(1/8) = 0.872 instead of drifting to 0.934 at
    // the r = 16 cap like fixed b = 3 would
    assert(ngramBandsFor(10) == 4 && ngramBandsFor(11) == 5 && ngramBandsFor(12) == 5)
    assert(ngramBandsFor(13) == 6 && ngramBandsFor(14) == 7)
    assert(ngramBandsFor(15) == 8 && ngramBandsFor(16) == 9)
    (NGRAM_R0 to NGRAM_MAX_R).foreach { r =>
      val jStar = math.pow(1.0 / ngramBandsFor(r), 1.0 / r)
      assert(math.abs(jStar - 0.872) < 0.015,
        f"J*(r=$r, b=${ngramBandsFor(r)}) = $jStar%.4f must hold the 0.872 midpoint")
    }
  }

  /** Char-lane planted recall at ITS first compensated geometry (r = 10,
    * b = 4 — the first corpus size where ngramBandsFor departs from the
    * old fixed b = 3): 33k background docs force ratio 16 at the
    * half-rate schedule. Expectation from p = 1−(1−J^r)^b: 1-edit
    * J ≈ 0.94 → 0.96, 2-edit J ≈ 0.89 → 0.78 — mixed ≈ 0.87 (fixed b = 3
    * would give ≈ 0.79 and keep falling with r; the compensation is what
    * holds the floor). */
  test("char lane: planted recall floor at the first compensated geometry (33k docs, r=10 b=4)") {
    val dir = plantCorpus(5000, 33000)
    val n = graft.Tables.cachedCount(spark, dir, "documents")
    assert(DedupText.rowsFor(n, DedupText.NGRAM_R0, DedupText.NGRAM_MAX_R,
        DedupText.NGRAM_STEP) == 10 && DedupText.ngramBandsFor(10) == 4,
      s"fixture must force the first char-compensated geometry (n = $n)")
    val planted = (0 until N_PAIRS)
      .map(p => (PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)).toSet
    val plantedDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= PLANT_BASE)
    val charTruth = exactTruth(
      plantedDocs.withColumn("s",
          graft.functions.ShingleExpression.charShingles(col("text"), 6))
        .select(col("doc_id"), col("s")), 0.6)
    assert(planted.subsetOf(charTruth), "every planted pair must clear the threshold")
    val charGot = gotPairs("dedup_ngram", dir)
    val char = planted.count(charGot.contains).toDouble / planted.size
    info(f"char compensated geometry (33k docs): char-lane recall $char%.3f")
    assert(char >= 0.70, f"char-lane (4×10) planted recall floor 0.70, measured $char%.3f")
  }

  /** Planted recall at the first COMPENSATED geometry (r = 9, b = 5 —
    * past the retired r = 8 cap): 256k background docs force ratio 128.
    * Ground truth is the planted pairs (verified to clear the threshold);
    * the expectation from p = 1−(1−J^r)^b: 1-edit J ≈ 0.9 → 0.91,
    * 2-edit J ≈ 0.81 → 0.56 — mixed ≈ 0.74. The floor sits under that
    * but far above the ~0.45 a non-compensated b = 4 at r = 9 would
    * deliver for the 2-edit half, and MILES above a saturated-bucket
    * collapse. */
  test("planted recall floor at the compensated geometry (256k docs, r=9 b=5)") {
    val dir = plantCorpus(5000, 256000)
    val n = graft.Tables.cachedCount(spark, dir, "documents")
    assert(DedupText.rowsFor(n, DedupText.WORD_R0, DedupText.WORD_MAX_R) == 9 &&
        DedupText.bandsFor(9) == 5,
      s"fixture must force the first compensated geometry (n = $n)")
    val planted = (0 until N_PAIRS)
      .map(p => (PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)).toSet
    val plantedDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= PLANT_BASE)
    val wordTruth = exactTruth(
      DedupText.withWordShingles(plantedDocs).filter(size(col("s")) > 0), 0.5)
    assert(planted.subsetOf(wordTruth), "every planted pair must clear the threshold")
    val wordGot = gotPairs("dedup_lsh_pairs", dir)
    val word = planted.count(wordGot.contains).toDouble / planted.size
    info(f"compensated geometry (256k docs): word-lane recall $word%.3f")
    assert(word >= 0.60, f"word-lane (5×9) planted recall floor 0.60, measured $word%.3f")
  }

  /** The containment-index audit lane's invariants, pinned on a corpus
    * constructed so every value is hand-computable: 12 docs of one unique
    * word-trigram-chain each (grams df = 1), plus one shared 5-word chain
    * copied into DF_MAX + 2 = 12 of them (those 3 grams: df = 12 >
    * DF_MAX — dropped). The identities graded here are the ones the
    * oracle can't distinguish from luck on organic data: n_grams =
    * rare + dropped, rare_rows ≤ DF_MAX·rare_grams, cand_pairs_bound ≤
    * C(DF_MAX, 2)·rare_grams, and the exact planted values. */
  test("dedup_bucket_stats_contain: df audit identities on a constructed corpus") {
    val session = spark
    import session.implicits._
    val shared = "alpha bravo charlie delta echo" // 3 shared grams, df = 12
    val docs = (0 until 12).map { i =>
      // 8 unique words -> 6 unique grams per doc, then the shared chain
      val uniq = (0 until 8).map(j => s"uniq${i}w$j").mkString(" ")
      (i.toLong, s"$uniq $shared")
    }
    val dir = Files.createTempDirectory("graft-contain-audit").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = DedupText.queries("dedup_bucket_stats_contain")(spark, dir)
      .collect().head
    val (nGrams, rare, dropped) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (maxDf, rareRows, droppedRows, candBound) =
      (row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6))
    // per doc: 13 words -> 11 grams, 3 of them the shared chain's; the 2
    // junction grams (uniq7 alpha bravo / uniq7w7 alpha bravo vary by doc)
    // are doc-unique -> 8 unique + 3 shared... enumerate from truth instead:
    val truth = docs.flatMap { case (id, text) =>
      val t = text.toLowerCase.split(" ")
      t.sliding(3).map(_.mkString(" ")).toSeq.distinct.map(g => (g, id))
    }.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(nGrams == truth.size)
    assert(rare == truth.count(_._2 <= DedupText.DF_MAX))
    assert(dropped == truth.count(_._2 > DedupText.DF_MAX))
    assert(rare + dropped == nGrams, "partition identity")
    assert(maxDf == truth.values.max && maxDf == 12L, "the planted df spike")
    assert(rareRows == truth.values.filter(_ <= DedupText.DF_MAX).sum)
    assert(droppedRows == truth.values.filter(_ > DedupText.DF_MAX).sum)
    assert(candBound == truth.values.filter(_ <= DedupText.DF_MAX)
      .map(d => d * (d - 1) / 2).sum)
    assert(rareRows <= DedupText.DF_MAX * rare, "posting-list bound")
    assert(candBound <= DedupText.DF_MAX.toLong * (DedupText.DF_MAX - 1) / 2 * rare,
      "the structural candidate ceiling the no-quadratic-join argument rests on")
  }

  /** Containment recall floor — planted quote/inclusion pairs (round-20:
    * the last dedup family without a pinned recall floor). Unlike the
    * banded lanes, dedup_containment's guarantee is EXACT recall for any
    * pair sharing ≥ 1 rare gram (df ≤ DF_MAX), so the asserted floor is
    * 1.0, not a probability curve — a miss here is a broken index, not an
    * unlucky band. The fixture makes every planted pair rare-gram-
    * reachable by construction: snippets are fresh random draws from a
    * 5000-word vocab (shingle df = 2 — snippet + its host), and the hosts
    * wrap the snippet (verbatim for even p, its first 90% of words for
    * odd p) in per-pair-unique filler, so Jaccard(snippet, host) ≈ 0.4 —
    * BELOW the minhash lanes' thresholds (the blind spot containment
    * exists for) — while C = |A∩B|/min(|A|,|B|) is 1.0 / ≈ 0.9, clearing
    * CONTAIN_TAU = 0.8 on both halves. */
  test("containment: planted quote pairs are found exactly (recall 1.0, output truth-exact)") {
    val session = spark
    import session.implicits._
    val rnd = new Random(977)
    val vocab = (0 until 5000).map(i => s"w${i}x")
    def words(n: Int): Array[String] = Array.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val bg = (0 until N_BG).map(i => (i.toLong, words(DOC_WORDS).mkString(" ")))
    val pairs = (0 until N_PAIRS).map { p =>
      val snippet = words(40)
      val quoted = if (p % 2 == 0) snippet else snippet.take(36)
      val host = (0 until 20).map(i => s"hostw${p}a$i") ++ quoted ++
        (0 until 20).map(i => s"hostw${p}b$i")
      Seq((PLANT_BASE + 2 * p, snippet.mkString(" ")),
        (PLANT_BASE + 2 * p + 1, host.mkString(" ")))
    }
    val dir = Files.createTempDirectory("graft-contain-recall").toString
    (bg ++ pairs.flatten).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // exact containment truth, brute force over the full corpus (380 docs —
    // the TEST may; the graded query must never): same hashed-shingle sets
    // and C definition as the lane
    val sets = DedupText.withWordShingles(spark.read.parquet(s"$dir/documents.parquet"))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"), array_distinct(transform(col("s"),
        x => Hashing.h60(concat(lit("0:"), x)))).as("hs"))
    val truth = sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")),
        col("doc_a") < col("doc_b"))
      .withColumn("c", size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
        least(size(col("hs_a")), size(col("hs_b"))))
      .filter(col("c") >= DedupText.CONTAIN_TAU)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet

    val planted = (0 until N_PAIRS)
      .map(p => (PLANT_BASE + 2 * p, PLANT_BASE + 2 * p + 1)).toSet
    assert(planted.subsetOf(truth),
      s"every planted quote pair must clear CONTAIN_TAU (truth ${truth.size})")

    val got = gotPairs("dedup_containment", dir)
    // emitted ⊆ truth: the lane verifies candidates with the exact C
    assert(got.subsetOf(truth), "containment output must be truth-exact")
    // EXACT recall on the planted family — the rare-gram guarantee, pinned
    val missed = planted -- got
    assert(missed.isEmpty,
      s"containment must find EVERY rare-gram-reachable quote pair; missed $missed")
    info(s"containment: ${planted.size}/${planted.size} planted quote pairs found, " +
      s"truth ${truth.size}, emitted ${got.size}")
  }
}
