package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Near-duplicate text deduplication over the `documents` table — the
  * MinHash+LSH / SimHash / exact-hash family from the builder brief
  * (SURVEY §7 phase 5).
  *
  * Pipeline shape (the standard web-scale dedup recipe, e.g. Broder '97
  * resemblance + banding as popularized by Mining of Massive Datasets ch.3):
  *
  *   normalize → word 3-shingles → b·r(n) MinHashes → 4 bands × r(n) rows
  *   → band-bucket equi-join (candidates) → exact-Jaccard verify → drop list
  *
  * Rows-per-band r(n) is CORPUS-ADAPTIVE (word lane: base 2, +1 per corpus
  * doubling past N0 = 2000, capped at 12 with COMPENSATING bands
  * b = max(4, r − 4) past r = 8 — see `bandsFor`; char lane: base 8, +1 per
  * TWO doublings, capped at 16 with COMPENSATING bands from the
  * `ngramBandsFor` step table past r = 9) — see the `rowsFor` note for why
  * fixed banding is quadratic at scale and why the growth rate is sized
  * per lane.
  *
  * Scale design (100 TB corpus): everything up to banding is per-row map work
  * over the scan (no shuffle, codegen'd higher-order expressions). Candidate
  * generation is an equi-join on (band, signature) — work is proportional to
  * Σ bucket² within identical-signature buckets, never an all-pairs product.
  * Exact verification touches only candidate pairs. The final drop-list is a
  * distinct over the verified pairs. Skewed buckets (boilerplate) would be
  * salted or capped in production; the plan shape is the same.
  *
  * Hash discipline: shingle/minhash values are the 60-bit integer form of a
  * seed-prefixed md5, so the DuckDB oracle reproduces every value exactly —
  * no engine-specific hash functions anywhere.
  */
object DedupText {

  private[operators] val K = 8      // minhash permutations (word lane, base)
  private[operators] val BANDS = 4  // word-lane band count (fixed; the recall dial)

  /** Char-gram lane BASE signature length: 3 bands x 8 rows. The 10x organic
    * scale smoke measured the old 2x4 geometry at 19x runtime for 10x data
    * — with per-band collision p = J^4, background char-gram similarity
    * (J ~ 0.1 .. 0.3 tail) admits ~1e-4 of ALL pairs as candidates, which
    * is quadratic in corpus size until buckets hit MAX_BUCKET and get
    * dropped (silently shrinking recall as the corpus grows). At r = 8
    * rows the background rate falls to ~3e-8 per pair (a 0.3-tail pair:
    * 8e-3 -> 2e-7) while planted near-dups (J ~ 0.98) still collide with
    * p = 1-(1-0.98^8)^3 = 0.997. Geometry is mirrored in the oracle, so
    * the trade is graded semantics, not a silent truncation. */
  private[operators] val NGRAM_K = 24
  private[operators] val NGRAM_BANDS = 3

  /** Corpus-adaptive rows-per-band — the minhash twin of
    * `Similarity.planesFor` (which retired the fixed-P hyperplane
    * quadratic at the sf1→sf10 decade). With FIXED band geometry the
    * candidate join admits each background pair with probability
    * b·J^r; pairs grow as n² per corpus doubling (×4) while the
    * admission rate stays put — so candidate volume is quadratic until
    * MAX_BUCKET engages, after which recall silently erodes instead.
    * Growing r multiplies the background admission by J_bg per ADDED
    * ROW, so the growth rate is sized per lane to its background:
    *
    *   - word lane (J_bg tail ≲ 0.3): one row per doubling — ×4 pairs ×
    *     ≤0.3 admission ≈ ×1.2 per doubling, near-linear.
    *   - char lane (J_bg ≈ 0.1 mean): one row per TWO doublings —
    *     ×4 pairs per doubling × 0.1^(1/2) ≈ ×1.26, the same envelope
    *     at HALF the signature growth. The full +1/doubling schedule
    *     was measured counterproductive on the clean sf10 corpus
    *     (500k docs): r=15 cost 28.1 s vs 19.7 s at r=11 in the same
    *     JVM — the 3·4 extra minhashes per doc dominate once planted
    *     candidate volume is linear — and passed 476 vs 588 true
    *     J≥0.6 pairs (every added row also shifts the recall S-curve).
    *
    * The band count b is the recall dial: through r = 8 it stays fixed
    * at 4 — planted near-dups at J ≈ 0.9 keep p = 1−(1−J^r)^b high
    * (0.9⁸ = 0.43 → 0.90 recall) while the mid-J S-curve shifts right,
    * an explicit, oracle-mirrored trade measured in DedupRecallSpec's
    * elevated-r corpus. PAST r = 8 (128k docs) b grows with r
    * (`bandsFor`: b = r − 4) so the S-curve midpoint stays ≈ 0.84
    * instead of drifting further right — the old WORD_MAX_R = 8 cap
    * retired without a recall cliff. Both engines derive r AND b from
    * the same documents count by integer arithmetic, so the grade stays
    * hash-exact at every scale. N0 = 2000 keeps every corpus ≤ 2×N0 —
    * including the sf0.01 correctness gate (500 docs) and the recall
    * fixtures — at its BASE geometry. */
  private[operators] val DOC_N0 = 2000L
  private[operators] val WORD_R0 = K / BANDS          // 2 rows at base
  private[operators] val WORD_MAX_R = 12              // cap engages at 2000·2^10 ≈ 2M docs
  private[operators] val WORD_STEP = 1                // doublings per added row
  private[operators] val NGRAM_R0 = NGRAM_K / NGRAM_BANDS // 8 rows at base
  private[operators] val NGRAM_MAX_R = 16             // sigK cap 9×16 = 144 (ngramBandsFor(16) = 9)
  private[operators] val NGRAM_STEP = 2               // doublings per added row
  private[operators] def rowsFor(n: Long, r0: Int, rMax: Int, step: Int = 1): Int = {
    val ratio = math.max(1L, n / DOC_N0)
    math.min(rMax, r0 + (63 - java.lang.Long.numberOfLeadingZeros(ratio)) / step)
  }

  /** Word-lane COMPENSATING band count for a given rows-per-band — the cap
    * retirement (round-17 verdict #1). Growing r alone shifts the banding
    * S-curve's midpoint J* = (1/b)^(1/r) right: at the old fixed b = 4,
    * r = 12 would center at 0.89 and planted J ≈ 0.9 recall falls to 0.74
    * — the silent-erosion shape the adaptivity exists to prevent. Growing
    * b with r holds the midpoint where the r = 8 cap had it:
    *
    *   J*(r=8, b=4) = (1/4)^(1/8) = 0.841, and b = r − 4 keeps
    *   J*(9,5) = 0.836, J*(10,6) = 0.836, J*(11,7) = 0.838,
    *   J*(12,8) = 0.841 — the graded selectivity is scale-stable.
    *
    * Background admission still falls exponentially per added row
    * (b·J_bg^r at the 0.3 tail: r=8 → 2.6e-4, r=12 → 4.3e-6 — 60× less),
    * so the n²-driven candidate regrowth past the old cap is pushed out by
    * ~3 more corpus decades while planted J ≈ 0.9 recall holds ≈ 0.93
    * (= 1−(1−0.9^12)^8) instead of eroding. Cost is per-doc and linear:
    * b·r minhashes (96 at the top vs 32 at the old cap) — the safe kind of
    * cost at 100 TB, vs the quadratic kind it buys off. For r ≤ 8 (every
    * corpus under 128k docs) this is identically the old fixed b = 4:
    * nothing graded below sf10 moves. Mirrored by integer arithmetic in
    * the oracle (adaptiveBandsSqlFor's greatest/least params). */
  private[operators] def bandsFor(r: Int): Int = math.max(BANDS, r - 4)

  /** Char-lane COMPENSATING band count — the same cap-retirement shape the
    * word lane got in round 18 (`bandsFor`), sized to the char geometry.
    * With b fixed at 3, growing r walks the S-curve midpoint
    * J*(r, b) = (1/b)^(1/r) right: 0.872 at the base (r=8) but 0.919 by
    * r=13 (5M docs) and 0.934 at the r=16 cap — pairs at J 0.6–0.9 (all
    * above the lane's τ = 0.6 verify threshold) silently stop becoming
    * candidates, the exact erosion `bandsFor` retired for words. The
    * word lane's linear b = r − 4 doesn't transfer (its midpoint is
    * pinned at 0.841 from a base b = 4/r = 8 geometry); holding the CHAR
    * base midpoint 0.872 needs b ≈ 3^(r/8), pinned here as an explicit
    * integer step table so both engines derive b from r by CASE
    * arithmetic — no float pow for library math to diverge on:
    *
    *   r : 8  9  10 11 12 13 14 15 16
    *   b : 3  3  4  5  5  6  7  8  9     J*: 0.872 0.885 0.871 0.864
    *                                         0.874 0.871 0.870 0.871 0.872
    *
    * Background admission still falls exponentially per added row (tail
    * J = 0.3: 3·6.6e-5 ≈ 2e-4 at the base, 9·4.3e-9 ≈ 3.9e-8 at the cap);
    * the cost is per-doc and linear (b·r minhashes: 24 base → 144 at the
    * cap, engaging at 2000·2³² docs — beyond any graded scale; r = 13/b = 6
    * is what 5M docs gets). Below 8k docs (r = 8) this is identically the
    * old fixed b = 3: sf0.01/sf0.1 graded outputs don't move. Mirrored in
    * the oracle via the SAME table (`ngramBandsCaseSql`). */
  private[operators] val ngramBandTable: Seq[(Int, Int)] =
    Seq(8 -> 3, 9 -> 3, 10 -> 4, 11 -> 5, 12 -> 5, 13 -> 6, 14 -> 7, 15 -> 8, 16 -> 9)
  private[operators] def ngramBandsFor(r: Int): Int = ngramBandTable.toMap.apply(r)
  private def ngramBandsCaseSql: String =
    "CASE r " + ngramBandTable.map { case (r, b) => s"WHEN $r THEN $b" }
      .mkString(" ") + s" ELSE $NGRAM_BANDS END"

  /** 60-bit engine-agnostic hash of "<seed>:" + x (shared Hashing kernel). */
  private def h60(seed: Int, x: Column): Column =
    Hashing.h60(concat(lit(s"$seed:"), x))

  private def normText: Column = regexp_replace(lower(trim(col("text"))), "\\s+", " ")

  /** The documents scan, spread across cores BEFORE the per-row hash chain:
    * a small corpus arrives as one parquet split, and without this the whole
    * md5/MinHash map stage runs on a single thread (measured 3.9 s → 1.1 s
    * for dedup_ngram at sf0.1). The exchange moves raw text once — trivial
    * next to the hashing it parallelizes. At 100 TB the scan has thousands
    * of splits and this repartition is a cheap pass-through; production
    * would gate it on splits < cores.
    */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").repartition(col("doc_id"))

  /** The distinct word-3-shingle set of `text` (empty under 3 tokens) —
    * shared by the batch dedup pipeline and the incremental admission index
    * so both hash identical sets. The fused ShingleSet kernel, NOT the
    * transform/element_at composition: a higher-order lambda body
    * re-evaluates its subtrees per element, and Catalyst inlines any hoisted
    * token-array alias back into the lambda, so the declarative form re-ran
    * normalize+split three times PER SHINGLE — ~9 s over 5 000 sf0.1 docs
    * for what the one-pass kernel does in well under a second
    * (bit-equality with the composition pinned by ShingleExprSpec). */
  private[operators] def wordShingleSet: Column =
    graft.functions.ShingleExpression.wordShingles(col("text"), 3)

  /** (doc_id, s): attach the distinct word-3-shingle set to a (doc_id, text)
    * frame. */
  private[operators] def withWordShingles(docs: DataFrame): DataFrame =
    docs.withColumn("s", wordShingleSet).select(col("doc_id"), col("s"))

  /** doc_id + distinct word-3-shingle set (empty for docs under 3 tokens). */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    withWordShingles(docsSpread(s, dir))

  /** doc_id + distinct character-6-gram set (the n-gram-Jaccard variant:
    * robust to tokenization differences, standard for CJK-ish corpora).
    * 6 chosen over 4 to push background Jaccard down (0.26 → 0.10 here) so
    * banding can discriminate — see dedupNgram's banding note. */
  private val CHAR_GRAM = 6
  private[operators] def shingledChars(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir)
      .withColumn("s", graft.functions.ShingleExpression.charShingles(col("text"), CHAR_GRAM))
      .select(col("doc_id"), col("s"))

  /** XOR-permutation seeds (golden-ratio multiples masked to 60 bits): one
    * md5 per shingle, then K cheap permutations h ⊕ seed_j — the standard
    * single-hash MinHash variant, 8× less hashing than per-seed md5. */
  private[operators] def seed(j: Int): Long =
    (0x9E3779B97F4A7C15L * (j + 1)) & ((1L << 60) - 1)

  /** Per-BAND 60-bit left-rotation applied to the shared base hash before
    * the xor seeds — the cross-band decorrelator. The xor family alone
    * preserves the prefix-trie ownership structure of the ONE base-hash
    * realization, so all bands' collisions are correlated and pair-level
    * recall (P(≥1 band agrees)) lands well under 1−(1−J^r)^b at high r:
    * measured 0.535 vs 0.73 theory at (r=8, b=4) on a 256k-doc planted
    * corpus; with per-band rotations the same corpus measures 0.725 — the
    * theory rate — for two shifts and an OR per component (still ONE md5
    * per shingle). 7g+3 keeps the first 9 bands' amounts distinct. */
  private[operators] def rotFor(g: Int): Int = (7 * g + 3) % 60

  /** Signature-scheme fingerprint for PERSISTED LSH artifacts (the
    * admission index). Every ingredient the stored (band, sig) values
    * depend on is named here; bump the version whenever ANY of them
    * changes. An index written under one scheme never collides with
    * signatures computed under another — the round-18 per-band rotations
    * changed every sig value, so a pre-rotation index would silently stop
    * rejecting new near-duplicates (admission recall degrades to
    * batch-local with no error). LshAdmissionIndex stamps this string
    * beside the table and fails loud on mismatch, forcing a rebuild
    * instead. v2 = per-band rotations (v1 = unrotated xor family). */
  private[operators] val LSH_SCHEME: String =
    s"mh60-v2:shingle=word3:h60seed=0:K=$K:bands=$BANDS:perm=golden-xor:rot=7g+3:sig=md5"

  /** shingle-set frame → + mh_0..mh_7 (NULL minhash for shingle-less docs).
    * The K minima come from the fused native MinHashSignature expression —
    * one pass over the hash array instead of K transform+array_min passes;
    * bit-identical to the composition the DuckDB oracle runs.
    */
  private[operators] def minhashedFrom(sets: DataFrame, sigK: Int = K,
                                        bandRows: Int = K / BANDS): DataFrame = {
    val hashed = sets.withColumn("hs", transform(col("s"), x => h60(0, x)))
      .withColumn("_sig", graft.functions.MinHashExpression.minhash(
        col("hs"), (0 until sigK).map(seed),
        (0 until sigK).map(j => rotFor(j / bandRows))))
    (0 until sigK).foldLeft(hashed) { (df, j) =>
      df.withColumn(s"mh_$j", element_at(col("_sig"), j + 1))
    }.drop("_sig")
  }

  private def minhashed(s: SparkSession, dir: String): DataFrame =
    minhashedFrom(shingled(s, dir))

  /** (doc_id, band, sig) — one md5 signature per band of K/nBands minhashes.
    * Band geometry is the recall/candidate-cost dial: collision probability
    * is 1-(1-J^r)^b with r = K/nBands rows — more rows per band suppresses
    * low-J background pairs exponentially. */
  private[operators] def banded(mh: DataFrame, nBands: Int, sigK: Int = K): DataFrame = {
    val r = sigK / nBands
    mh.select(col("doc_id"), explode(array((0 until nBands).map { g =>
      struct(lit(g).as("band"),
        md5(concat_ws(",", (0 until r).map(k => col(s"mh_${r * g + k}")): _*)).as("sig"))
    }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** (doc_id, hs, band, sig) LSH rows for an arbitrary (doc_id, text) frame —
    * the admission-index feed (LshAdmissionIndex): per banded doc, its
    * 60-bit HASHED shingle set rides along as the verify payload, so
    * candidate verification needs no second pass over the corpus and the
    * persisted index stores 8-byte longs instead of shingle strings
    * (~4× lighter; Jaccard over the hashed sets is what the admission
    * oracle states, so collisions — ~0 at 60 bits — cannot split engines).
    * Shingle-less docs emit no rows (they cannot near-dup).
    */
  private[graft] def lshRows(docs: DataFrame): DataFrame = {
    val mh = minhashedFrom(
      withWordShingles(docs).filter(size(col("s")) > 0))
    val r = K / BANDS
    mh.select(col("doc_id"), col("hs"), explode(array((0 until BANDS).map { g =>
        struct(lit(g).as("band"),
          md5(concat_ws(",", (0 until r).map(k => col(s"mh_${r * g + k}")): _*)).as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("hs"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Exact Jaccard of two shingle-set columns (the verify predicate) —
    * the fused native kernel, bit-equal to
    * `size(array_intersect)/size(array_union)` (JaccardExprSpec). */
  private[operators] def jaccard(a: Column, b: Column): Column =
    graft.functions.JaccardExpression.jaccard(a, b)

  /** Boilerplate guard: identical-signature buckets larger than this pair
    * quadratically (Σ bucket² — a shared header/footer across millions of
    * docs is the classic web-corpus skew bomb) and carry almost no near-dup
    * signal, so candidate generation drops them. The per-bucket count rides
    * the SAME (band, sig) hash partitioning the candidate join needs — the
    * window adds no extra exchange. Mirrored in the DuckDB oracle, so the
    * cap is graded semantics, not a silent truncation. */
  private[operators] val MAX_BUCKET = 64

  /** Verified near-dup pairs: band-bucket candidates with exact Jaccard.
    *
    * Cache discipline (the sf100 lesson): cache the SKINNY (doc_id, band,
    * sig) frame, never the wide signature frame. Through round 17 this
    * cached `mh` — shingle-string array + hash array + sigK long columns —
    * and the columnar cache build on that row shape measured 26 cpu-ms/doc
    * at 400k docs (vs 0.74 compute-only: a 9× tax, super-linear with heap
    * pressure) and was the whole-lane bottleneck at 5M docs. Banding needs
    * only band signatures, and the verify joins need only the shingle sets,
    * which recompute from the scan for ~10 µs/doc (no md5, no minhash) —
    * so the full signature pipeline runs exactly once (the cache build),
    * the cached bytes are ~50 B/doc/band flat strings, and the two verify
    * sides pay one extra scan+shingle pass each. Identical band plans share
    * one CacheManager entry across the graded dedup queries (word + char
    * lanes → two entries per Verify session). Session owners (Verify/Bench)
    * release them with cacheManager.clearCache() once the query batch
    * completes — a library query must not park cache entries for the life
    * of the session. */
  private[operators] def verifiedPairsFrom(sets: DataFrame, threshold: Double,
                                nBands: Int = BANDS, sigK: Int = K): DataFrame = {
    // Shingle-less docs have NULL minhashes: concat_ws drops NULLs, so they
    // would all share one band signature, pair quadratically, and divide by
    // a zero-sized union (ANSI error). They can't be near-dups — exclude.
    val sets2 = sets.filter(size(col("s")) > 0)
    val mh = minhashedFrom(sets2, sigK, sigK / nBands)
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("band", "sig")
    val bands = banded(mh, nBands, sigK)
      .withColumn("bsz", count(lit(1)).over(wB))
      .filter(col("bsz") <= MAX_BUCKET)
      .drop("bsz")
      .cache()
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val shingleSets = sets2.select(col("doc_id"), col("s"))
    cand
      .join(shingleSets.select(col("doc_id").as("doc_a"), col("s").as("s_a")), Seq("doc_a"))
      .join(shingleSets.select(col("doc_id").as("doc_b"), col("s").as("s_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("s_a"), col("s_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Corpus-adaptive word-lane rows-per-band for a dir (see `rowsFor`). */
  private[operators] def wordRows(s: SparkSession, dir: String): Int =
    rowsFor(Tables.cachedCount(s, dir, "documents"), WORD_R0, WORD_MAX_R)

  /** Corpus-adaptive char-lane rows-per-band for a dir (see `rowsFor`). */
  private[operators] def ngramRows(s: SparkSession, dir: String): Int =
    rowsFor(Tables.cachedCount(s, dir, "documents"), NGRAM_R0, NGRAM_MAX_R, NGRAM_STEP)

  private[operators] def verifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val r = wordRows(s, dir)
    val b = bandsFor(r)
    verifiedPairsFrom(shingled(s, dir), 0.5, nBands = b, sigK = b * r)
  }

  // ---- graded queries ----

  private val dedupMinhashSig: Q = (s, dir) =>
    minhashed(s, dir)
      .select(col("doc_id") +: size(col("s")).as("n_shingles") +:
        (0 until K).map(j => col(s"mh_$j")): _*)
      .orderBy(col("doc_id").asc_nulls_first)

  private val dedupLshPairs: Q = (s, dir) =>
    verifiedPairs(s, dir)
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)

  /** Word-lane bucket-saturation audit — the operator's dial for "is
    * MAX_BUCKET shedding recall". The round-17 dedup_hamming collapse
    * proved runtime gates cannot see recall loss: the cap drops whole
    * buckets silently and the lane LOOKS healthy. This lane makes the
    * shedding an OUTPUT: per band, the bucket count, the largest bucket,
    * and how many buckets/rows the cap excluded from candidate generation.
    * capped_rows > 0 on a corpus where it used to be 0 is the signal to
    * inspect before trusting the dedup family's recall at that scale.
    * O(bands) output rows — value-gradeable against the oracle at ANY sf. */
  /** Shared saturation rollup over a pre-cap (band, sig) frame: per band,
    * the bucket count, the largest bucket, and how many buckets/rows the
    * MAX_BUCKET guard excludes from candidate generation. */
  private def bucketStatsOf(b0: DataFrame): DataFrame =
    b0.groupBy("band", "sig").agg(count(lit(1)).as("bsz"))
      .groupBy("band").agg(
        count(lit(1)).as("n_buckets"),
        max("bsz").as("max_bucket"),
        sum(when(col("bsz") > MAX_BUCKET, 1L).otherwise(0L)).as("capped_buckets"),
        sum(when(col("bsz") > MAX_BUCKET, col("bsz")).otherwise(0L)).as("capped_rows"))
      .orderBy(col("band").asc_nulls_first)

  private val dedupBucketStats: Q = (s, dir) => {
    val r = wordRows(s, dir)
    val b = bandsFor(r)
    val mh = minhashedFrom(shingled(s, dir), b * r, r)
    bucketStatsOf(banded(mh.filter(size(col("s")) > 0), b, b * r))
  }

  /** Char-lane saturation audit — the same O(bands)-row output for the
    * NGRAM kernel, so ITS MAX_BUCKET shedding is graded output too (the
    * word-only audit left the char lane's cap spec-argued). */
  private val dedupBucketStatsNgram: Q = (s, dir) => {
    val r = ngramRows(s, dir)
    val b = ngramBandsFor(r)
    val mh = minhashedFrom(
      shingledChars(s, dir).filter(size(col("s")) > 0), b * r, r)
    bucketStatsOf(banded(mh, b, b * r))
  }

  /** Hamming-lane saturation audit over the pigeonhole (combo, key)
    * buckets — the kernel whose round-17 single-band saturation collapse
    * motivated the audit family in the first place. `band` = combo index. */
  private val dedupBucketStatsHamming: Q = (s, dir) =>
    bucketStatsOf(
      hamBands0(docsSpread(s, dir)
          .withColumn("hs", tokenHashes)
          .filter(size(col("hs")) > 0)
          .select(col("doc_id"), simhash60(col("hs")).as("sig")))
        .select(col("doc_id"), col("combo").as("band"), col("key").as("sig")))

  /** Containment-index audit — the df distribution the rare-gram index
    * stands on, as graded O(1)-row output (round-20; the audit family's
    * fourth member). The containment lane's shed is not a bucket cap but
    * the DF_MAX rarity bound itself: grams with df > DF_MAX leave the
    * index, and a pair whose ENTIRE overlap is such boilerplate is
    * invisible by declared semantics. The 5M-doc grade measured what that
    * means on a template-heavy corpus (199/200 planted quote pairs
    * reachable on originals; 1/200 when quoting rewrite replicas whose
    * every gram has df ≈ 9000 — see BENCH_sf10.md round 20), so the
    * number a corpus owner needs is exactly this distribution:
    * dropped_rows prices the blindness, cand_pairs_bound is the
    * Σ C(df, 2) ≤ C(DF_MAX, 2)·rare_grams structural candidate ceiling
    * the no-quadratic-join argument rests on. One gram-keyed partial
    * aggregate, one global fold — linear, skew-free (the hottest gram
    * contributes one row to the df frame regardless of its df). */
  private val dedupBucketStatsContain: Q = (s, dir) => {
    val gdf = withWordShingles(docsSpread(s, dir))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"),
        array_distinct(transform(col("s"), x => h60(0, x))).as("hs"))
      .select(explode(col("hs")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
    gdf.agg(
      count(lit(1)).as("n_grams"),
      sum(when(col("df") <= DF_MAX, 1L).otherwise(0L)).as("rare_grams"),
      sum(when(col("df") > DF_MAX, 1L).otherwise(0L)).as("dropped_grams"),
      max("df").as("max_df"),
      sum(when(col("df") <= DF_MAX, col("df")).otherwise(0L)).as("rare_rows"),
      sum(when(col("df") > DF_MAX, col("df")).otherwise(0L)).as("dropped_rows"),
      sum(when(col("df") <= DF_MAX, expr("df * (df - 1) DIV 2"))
        .otherwise(0L)).as("cand_pairs_bound"))
  }

  // n-gram-Jaccard variant: char 6-grams through the same MinHash machinery
  // but banded 3×8 instead of 4×2 — char-gram background J (~0.10 mean,
  // tail to ~0.3) is far above word-gram background, so candidate
  // probability must fall as J^8 (~1e-8 at the mean, ~2e-7 at the tail)
  // or verification work grows quadratically with corpus size — the
  // NGRAM_K note has the measured 19×-at-10× failure of the old r = 4
  // geometry. Near-dups (J≈0.98) still collide with p≈0.997.
  private val dedupNgram: Q = (s, dir) => {
    val r = ngramRows(s, dir)
    val b = ngramBandsFor(r) // compensating bands: midpoint pinned ≈ 0.872
    verifiedPairsFrom(shingledChars(s, dir), 0.6,
        nBands = b, sigK = b * r)
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  // Greedy keep-lowest-id survivor policy: any doc appearing as the higher id
  // of a verified pair is dropped. Deterministic and one-pass (a full
  // connected-components pass would iterate the same pair frame).
  private val dedupDropList: Q = (s, dir) =>
    verifiedPairs(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
      .orderBy(col("doc_id").asc_nulls_first)

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the minimum of its closed neighborhood. Edges are kept
    * directed (a, b) with b < a; neighborhoods are computed symmetrized. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    // no distinct here: duplicate edges don't change neighborhood minima,
    // and the small-star that always follows dedups — saves a shuffle/round
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
  }

  /** One small-star round: every node connects its smaller neighbors AND
    * itself to the minimum of its smaller neighborhood. */
  private def smallStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val down = sym.filter(col("v") < col("u"))
    val mins = down.groupBy("u").agg(min("v").as("m"))
    down.join(mins, "u").select(col("v").as("a"), col("m").as("b"))
      .union(mins.select(col("u").as("a"), col("m").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Connected components over distinct undirected pairs (`doc_a` < `doc_b`
    * columns): (node, component = min reachable id); isolated nodes absent
    * by construction. Alternating large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"): each round contracts
    * chains toward the component minimum from BOTH ends, converging in
    * O(log n) rounds vs O(diameter) for plain label propagation — a 3-chain
    * is a star after ONE round. Per round: one materialization
    * (localCheckpoint cuts lineage) and one O(1)-row convergence probe
    * (count + order-free xxhash64 XOR — stable metric ⇒ stable edge set,
    * with the round bound as the collision-paranoia backstop; bit_xor is
    * overflow-free under ANSI where a hash SUM is not, and xor-cancellation
    * needs duplicate rows, which each round's distinct() rules out). The
    * driver loop runs only actions; no row ever crosses to the driver.
    * Shared by the near-dup clusterer and the co-supply graph query.
    */
  private[operators] def connectedComponents(pairs: DataFrame): DataFrame = {
    def metricOf(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(a, b))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // doc_a < doc_b by contract → canonical (a, b) = (larger, smaller);
    // input pairs are distinct by contract, no dedup shuffle needed.
    // localCheckpoint(eager = false): the convergence probe is the round's
    // ONE action — it materializes the checkpoint (truncating lineage for
    // the next round) and computes the metric in the same job, instead of
    // paying a separate checkpoint job per round.
    var edges = pairs.select(col("doc_b").as("a"), col("doc_a").as("b"))
      .localCheckpoint(eager = false)
    var metric = metricOf(edges)
    var converged = false
    var round = 0
    val MaxRounds = 12 // covers components of ~2^12 nodes
    while (!converged && round < MaxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val m2 = metricOf(next)
      converged = m2 == metric // a star set is a fixed point of LS∘SS
      edges = next
      metric = m2
      round += 1
    }
    // fail loud rather than silently emit unconverged labels (the oracle's
    // recursive CTE always converges)
    require(converged, s"connectedComponents did not converge within $MaxRounds rounds")
    // at the fixed point every edge is (node, component-min); roots label
    // themselves
    edges.select(col("a").as("node"), col("b").as("component"))
      .unionByName(edges.select(col("b").as("node"), col("b").as("component")))
      .distinct()
  }

  // Connected components over the verified near-dup pairs: cluster id = min
  // doc_id reachable (the shared large-star/small-star kernel above).
  private val dedupClusters: Q = (s, dir) =>
    connectedComponents(verifiedPairs(s, dir).select("doc_a", "doc_b"))
      .select(col("node").as("doc_id"), col("component").as("cluster"))
      .orderBy(col("doc_id").asc_nulls_first)

  /** Span width for duplicated-substring detection: long enough that a
    * shared span means real copied text (memorization-grade, à la the
    * "deduplicating training data" line of work), short enough that the
    * planted near-dups in the fixture actually share windows. */
  private[operators] val SPAN_N = 8

  // Duplicated-span detection — the substring-level complement to the
  // document-level MinHash family: a doc pair can be globally dissimilar yet
  // share a long verbatim passage (boilerplate, quotes, licenses), which is
  // exactly what an LLM pretraining pipeline wants scrubbed. Approach: the
  // positional word-8-gram inverted index. A position is "duplicated" when
  // its 8-gram occurs in more than one document; consecutive duplicated
  // positions chain into runs (a run of length r = a verbatim shared span of
  // r+7 tokens).
  //
  // Scale (100 TB): the gram index is O(corpus tokens) rows exchanged on the
  // gram key — the same cost class as building any inverted index; the
  // cross-doc filter is a partial-aggregated count-distinct per gram; the
  // run reconstruction exchanges only the duplicated positions on doc_id.
  // No similarity join, no cartesian anywhere. (A production variant caps
  // mega-shared grams the way MAX_BUCKET caps LSH buckets; at this corpus
  // the hottest gram is in the tens, so the cap would be dead semantics —
  // noted, not implemented.)
  private val dedupSpans: Q = (s, dir) => {
    // n_pos (the doc's total gram count) rides along each exploded gram row
    // instead of a third corpus scan + re-aggregation + join: it folds
    // through the two downstream groupBys as a per-doc-constant max().
    // cache(): the gram index feeds BOTH the shared-gram aggregate and the
    // join side, whose differing subtrees defeat exchange reuse — without it
    // the normalize/8-gram/explode map stage runs twice (the multi-consumer
    // recompute pathology; same convention as verifiedPairsFrom's mh cache,
    // released by the session owner). Production materializes the inverted
    // index to storage for the same reason.
    val grams = docsSpread(s, dir)
      .withColumn("ga", graft.functions.ShingleExpression.wordGramSeq(col("text"), SPAN_N))
      .select(col("doc_id"), size(col("ga")).cast("long").as("n_pos"),
        posexplode(col("ga")).as(Seq("pos", "g")))
      .cache()
    val shared = grams.groupBy("g")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select("g")
    val dup = grams.join(shared, Seq("g")).select("doc_id", "n_pos", "pos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("pos").asc)
    // gaps-and-islands: consecutive duplicated positions share pos - rank
    val runs = dup
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(max(col("n_pos")).as("n_pos"), count(lit(1)).as("run"))
    runs.groupBy("doc_id")
      .agg(max(col("n_pos")).as("n_pos"), sum(col("run")).as("n_dup_pos"),
        max(col("run")).as("max_run"))
      .select(col("doc_id"), col("n_pos"), col("n_dup_pos"), col("max_run"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  private val dedupExact: Q = (s, dir) =>
    Tables(s, dir, "documents")
      .select(md5(normText).as("fp"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct"))

  // ---- dedup_prefix: leading-span exact dedup ------------------------------
  //
  // The cheap first pass of the web-scale recipe (used before MinHash in
  // CCNet/RefinedWeb-style pipelines): documents whose normalized leading
  // span is identical are duplicates for training purposes even when tails
  // diverge (truncated mirrors, pagination, appended boilerplate). Exact
  // hashing on the first PREFIX_CHARS chars catches them at hash-groupBy
  // cost — no shingles, no banding.
  //
  // Scale: fingerprint is per-row map work; ONE exchange on the 16-byte fp
  // for the group stats, and the winner join is an equi-join on that same
  // key (AQE reuses the partitioning). Winner = min doc_id, the pinned
  // deterministic survivor policy shared with the LSH drop list. Emits one
  // row per DROPPED doc with its surviving twin — directly anti-joinable
  // against the corpus.
  private[operators] val PREFIX_CHARS = 64
  private val dedupPrefix: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), md5(substring(normText, 1, PREFIX_CHARS)).as("fp"))
    val g = d.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    d.join(g, "fp")
      .filter(col("doc_id") =!= col("kept_doc_id"))
      .select(col("doc_id"), col("kept_doc_id"), col("fp").as("prefix_fp"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  // 16-bit SimHash over distinct whitespace tokens (unit weights): bit b is
  // set iff tokens with H(t) bit b = 1 are at least half. Production note: a
  // custom Expression would compute all 16 bits in one token pass; 16
  // filter() passes keep this oracle-reproducible with zero custom code.
  private val dedupSimhash: Q = (s, dir) => {
    val hs = transform(array_distinct(split(normText, " ")), t => h60(0, t))
    Tables(s, dir, "documents")
      .withColumn("hs", hs)
      .withColumn("simhash16",
        graft.functions.SimHashExpression.simhash(col("hs"), 16))
      .select(col("doc_id"), col("simhash16"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  // ---- dedup_containment: asymmetric quote/inclusion detection ------------
  //
  // Symmetric Jaccard — and the MinHash bands that estimate it — is blind
  // to a snippet embedded in a much larger host document: J collapses as
  // the size ratio grows even when EVERY shingle of the snippet appears in
  // the host (J ≤ |A|/|B|). The asymmetric measure is containment
  // C = |A∩B| / min(|A|, |B|); the corpus-pipeline use is pulling quoted /
  // mirrored / template-wrapped text that exact and near dedup both miss.
  //
  // Candidates come from a RARE-shingle inverted index, not MinHash bands
  // (whose recall is a function of J, exactly the measure containment
  // exists to escape): explode hashed shingles, keep grams with document
  // frequency ≤ DF_MAX, pair docs sharing ≥ 1 rare gram. Recall is EXACT
  // for pairs sharing a rare gram; pairs whose entire overlap is
  // boilerplate grams (df > DF_MAX) are out of scope by declared,
  // oracle-mirrored semantics — the MAX_BUCKET contract again, and the
  // same reasoning: overlap made solely of ubiquitous grams is template
  // noise, not quotation. Candidate volume is structurally bounded at
  // C(DF_MAX, 2) pairs per gram, so the self-join cannot go quadratic in
  // corpus size; the df count and the pair join ride one gram-key
  // partitioning.
  private[operators] val CONTAIN_TAU = 0.8
  private[operators] val DF_MAX = 10

  private val dedupContainment: Q = (s, dir) => {
    val sets = withWordShingles(docsSpread(s, dir))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"),
        array_distinct(transform(col("s"), x => h60(0, x))).as("hs"))
      .cache() // feeds the inverted index and both verify sides; session
               // owners release via clearCache (the dedup-family convention)
    val wG = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val rare = sets.select(col("doc_id"), explode(col("hs")).as("g"))
      .withColumn("df", count(lit(1)).over(wG))
      .filter(col("df") <= DF_MAX)
      .drop("df")
    val cand = rare.as("a").join(rare.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(col("hs_a")).cast("long").as("n_a"),
        size(col("hs_b")).cast("long").as("n_b"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          least(size(col("hs_a")), size(col("hs_b")))).as("c"))
      .filter(col("c") >= CONTAIN_TAU)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        round(col("c"), 6).as("containment"))
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  // ---- dedup_hamming: Manku-style simhash near-dup PAIRS ------------------
  //
  // The hamming-distance join the simhash signature exists for (Manku,
  // Jain & Das Sarma, WWW'07 — Google's web-dedup): two docs are near-dups
  // when their f-bit simhashes differ in ≤ K bits. The scalable shape is
  // EXACT-recall banding by pigeonhole: split f = 60 bits into B = 6 bands
  // of 10; a pair within hamming K differs in at most K bands, so it AGREES
  // on some (B−K)-band combination — an equi-join keyed on each of the
  // C(B, B−K) combinations' concatenated bits finds every qualifying pair,
  // a deterministic guarantee, unlike MinHash banding's probabilistic one
  // (this is Manku's table construction; K = 2 → 15 tables of 40-bit keys).
  //
  // The key must be the (B−K)-band CONCATENATION, not a single band: a
  // 10-bit single-band key has only 2^10 values, so bucket occupancy is
  // n/1024 and the MAX_BUCKET cap starts DROPPING true pairs once the
  // corpus passes ~65k docs (the sf10 gate measured the saturation: at
  // 500k docs every bucket held ~488 docs). A 40-bit combo key keeps
  // occupancy ~n/2^40 — scale-stable the same way planesFor/rowsFor are,
  // but by pigeonhole instead of probability, so recall stays EXACT.
  // The require below pins the bound: raising HAM_K past B−1 would leave
  // zero-band combos (an all-pairs join), i.e. silently lose the guarantee.
  // Verify = bit_count(xor) on the candidate pairs only (agreeing on B−K
  // bands does NOT imply hamming ≤ K overall — the free bands are
  // unconstrained). The MAX_BUCKET guard caps degenerate combos (near-empty
  // docs hash alike), mirrored in the oracle as graded semantics.
  private[operators] val SIM_BITS = 60
  private[operators] val SIM_BANDS = 6
  private[operators] val HAM_K = 2
  require(HAM_K <= SIM_BANDS - 1,
    s"hamming radius $HAM_K breaks the pigeonhole exact-recall bound (B-1 = ${SIM_BANDS - 1})")
  /** Distinct-token 60-bit hashes of `text` (the simhash input). */
  private[operators] def tokenHashes: Column =
    transform(array_distinct(split(normText, " ")), t => h60(0, t))
  /** 60-bit majority signature — the fused native kernel (one pass over the
    * hash array; see functions.SimHash), bit-equal to the declarative
    * per-bit filter/size composition the DuckDB oracle states
    * (SimHashExprSpec pins the equality, including null elements and the
    * empty-array all-bits edge). */
  private[operators] def simhash60(hsCol: Column): Column =
    graft.functions.SimHashExpression.simhash(hsCol, SIM_BITS)

  /** The C(B, B−k) pigeonhole combinations for hamming radius k: each is
    * the band subset one key concatenates. Shared verbatim with the SQL
    * generator so both engines enumerate identical combos in identical
    * order. At the shipped k = 2 this is 15 combos of 4 bands; at k = 5
    * (the payload lane) it degenerates to the 6 single-band keys. */
  private[operators] def hamCombos(k: Int): Seq[Seq[Int]] =
    (0 until SIM_BANDS).combinations(SIM_BANDS - k).map(_.toSeq).toSeq

  /** Pigeonhole hamming pairs over a (doc_id, sig) frame: all pairs within
    * k bits, exact recall (k ≤ B−1), MAX_BUCKET guard riding the (combo,
    * key) join key — see the dedup_hamming note for why the key is a
    * (B−k)-band concatenation. Shared by the text and binary-payload
    * simhash dedups — the kernel is signature-source-agnostic.
    *
    * Cost constant to price in when changing the radius: the kernel
    * explodes C(B, B−k) key rows per doc — 15 at k = 2 (vs 6 for the
    * saturating single-band scheme it replaced, a 2.5× row-explosion into
    * the bucket-count shuffle, and the keys are near-unique 40-bit values
    * so most count-window partitions are size 1). k = 3 would be
    * C(6,3) = 20 rows of 30-bit keys (more rows AND denser buckets);
    * k = 5 degenerates to the 6 single-band keys. */
  /** Pre-cap pigeonhole rows: one (doc_id, sig, combo, key) row per
    * C(B, B−k) band-subset key — the hamming kernel's banding stage,
    * exposed separately so the saturation audit can observe the buckets
    * BEFORE the MAX_BUCKET guard drops any. */
  private[operators] def hamBands0(sigs: DataFrame, k: Int = HAM_K): DataFrame = {
    val r = SIM_BITS / SIM_BANDS
    sigs.select(col("doc_id"), col("sig"),
        explode(array(hamCombos(k).zipWithIndex.map { case (c, ci) =>
          struct(lit(ci).as("combo"),
            c.zipWithIndex.map { case (b, j) =>
              shiftleft(shiftright(col("sig"), b * r).bitwiseAND(lit((1L << r) - 1)), j * r)
            }.reduce(_ bitwiseOR _).as("key"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.combo").as("combo"), col("bb.key").as("key"))
  }

  private[operators] def hammingPairs(sigs: DataFrame, k: Int = HAM_K): DataFrame = {
    require(k <= SIM_BANDS - 1,
      s"hamming radius $k breaks the pigeonhole exact-recall bound (B-1 = ${SIM_BANDS - 1})")
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("combo", "key")
    val bands = hamBands0(sigs, k)
      .withColumn("bsz", count(lit(1)).over(wB))
      .filter(col("bsz") <= MAX_BUCKET)
      .drop("bsz")
    bands.as("a").join(bands.as("b"),
        col("a.combo") === col("b.combo") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= k)
  }

  private val dedupHamming: Q = (s, dir) =>
    hammingPairs(docsSpread(s, dir)
        .withColumn("hs", tokenHashes)
        .filter(size(col("hs")) > 0)
        .select(col("doc_id"), simhash60(col("hs")).as("sig")))
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)

  /** Fold-then-pair hamming CLUSTERS — the replica-heavy scale path the
    * saturation audit's first catch motivated (BENCH_sf10.md round 19: on
    * a 5M-doc corpus of ~5000-rewrite clusters the PAIR kernel's
    * MAX_BUCKET guard sheds ~60% of combo rows, correctly — emitting a
    * 5000-doc mutual-near-dup cluster's pairs is Ω(5000²) output by the
    * problem statement, not a plan defect). The dedup DECISION only needs
    * cluster membership, and the hamming edge predicate is a function of
    * the two SIGNATURES alone, so: fold identical sigs to their min-doc
    * representative (one linear groupBy), run the exact-recall pigeonhole
    * kernel over DISTINCT signatures only, connected-components the rep
    * graph, and expand membership back over docs through the sig key.
    * Identical-sig replica clusters collapse to ONE node before any
    * bucket forms — occupancy (and the MAX_BUCKET guard) is measured over
    * distinct sigs, and output is O(docs), never O(cluster²).
    *
    * Semantics: exactly the transitive closure of dedup_hamming's pair
    * predicate hamming(sig_a, sig_b) ≤ k — INCLUDING closure edges the
    * pair lane's guard sheds when replicas saturate a bucket (the
    * 65-identical-doc case in DedupSimilaritySpec: pair lane emits
    * nothing, this lane groups all of them).
    *
    * Rep edges come from a meet-in-the-middle BALL JOIN, not the capped
    * pigeonhole kernel: the first 5M-doc run of the pigeonhole version
    * measured rep buckets of up to 2302 (rewrite-cluster sigs agree on
    * combo keys even when unequal), so MAX_BUCKET shed 20 of 53
    * qualifying planted pairs — a cap, like the pair lane's, is a recall
    * hole the CLUSTER lane doesn't need. Instead each distinct sig
    * expands to its 61-element radius-1 ball (sig ⊕ {0, 2⁰..2⁵⁹}) and
    * candidates equi-join on the midpoint: two sigs within hamming 2
    * always meet at a middle (d₁ flipped on one side, d₂ on the other;
    * distance 1 meets at either endpoint), and equal midpoints imply
    * distance ≤ 2 — find-all AND no false candidates beyond the ≤ k
    * verify. The skew bomb is structurally impossible: a midpoint group
    * is the distinct sigs within 1 flip of one point, ≤ 61 rows by
    * pigeonhole-free construction — no cap, no shedding, EXACT closure
    * at every scale (the 5M-doc grade: 53/53 qualifying planted pairs).
    * (General k would need radius-⌈k/2⌉ balls — C(60,≤3) ≈ 36k variants
    * at k = 5 — so this kernel requires k ≤ 2; the graded lane's radius
    * is HAM_K = 2, and larger radii stay on the capped pigeonhole
    * kernel, whose shed the saturation audit prices.)
    *
    * Scale (100 TB): one shuffle on sig for the fold, a 61× explode of
    * the DISTINCT-sig reps joined on the 60-bit midpoint (bounded
    * groups), O(log n) CC rounds on the true edge set, one sig-keyed
    * join to expand membership — the comps side is |reps with edges|,
    * broadcast-sized on organic corpora. */
  private[operators] def hammingClustersFrom(sigs0: DataFrame, k: Int = HAM_K): DataFrame = {
    require(k <= 2, s"ball-join cluster kernel holds for radius ≤ 2, got $k")
    // three consumers of the signature frame (fold, ball join's rep input,
    // membership expansion) — cache it so the doc scan + token-hash + simhash
    // chain runs once. (doc_id, sig) is two longs per doc: the SKINNY cache
    // class verifiedPairsFrom's discipline allows, not the wide-frame tax.
    // Lifetime follows the dedup-family convention (see verifiedPairsFrom):
    // the returned frame is LAZY, so this function cannot unpersist without
    // recomputing the chain per consumer — the SESSION OWNER (Verify/Bench/
    // TimeQuery) releases via cacheManager.clearCache() after the query
    // batch; in-between, a ~16 B/doc MEMORY_AND_DISK entry rides LRU
    // eviction, which at 5M docs is ~80 MB — noise against the executors'
    // storage fraction.
    val sigs = sigs0.cache()
    val reps = sigs.groupBy("sig").agg(min("doc_id").as("rep"))
    val mid = reps.select(col("rep").as("doc_id"), col("sig"),
        explode(array((lit(0L) +: (0 until SIM_BITS).map(b => lit(1L << b))): _*)).as("m"))
      .select(col("doc_id"), col("sig"), col("sig").bitwiseXOR(col("m")).as("mid"))
    val edges = mid.as("a").join(mid.as("b"),
        col("a.mid") === col("b.mid") && col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= k)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val comps = connectedComponents(edges)
      .select(col("node").as("rep"), col("component"))
    sigs.join(reps, "sig")
      .join(comps, Seq("rep"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("rep")).as("cluster"))
  }

  private val dedupHammingClusters: Q = (s, dir) =>
    hammingClustersFrom(docsSpread(s, dir)
        .withColumn("hs", tokenHashes)
        .filter(size(col("hs")) > 0)
        .select(col("doc_id"), simhash60(col("hs")).as("sig")))
      .orderBy(col("doc_id").asc_nulls_first)

  val queries: Map[String, Q] = Map(
    "dedup_minhash_sig" -> dedupMinhashSig,
    "dedup_lsh_pairs" -> dedupLshPairs,
    "dedup_ngram" -> dedupNgram,
    "dedup_clusters" -> dedupClusters,
    "dedup_spans" -> dedupSpans,
    "dedup_drop_list" -> dedupDropList,
    "dedup_exact" -> dedupExact,
    "dedup_prefix" -> dedupPrefix,
    "dedup_simhash" -> dedupSimhash,
    "dedup_hamming" -> dedupHamming,
    "dedup_hamming_clusters" -> dedupHammingClusters,
    "dedup_containment" -> dedupContainment,
    "dedup_bucket_stats" -> dedupBucketStats,
    "dedup_bucket_stats_ngram" -> dedupBucketStatsNgram,
    "dedup_bucket_stats_hamming" -> dedupBucketStatsHamming,
    "dedup_bucket_stats_contain" -> dedupBucketStatsContain
  )

  // ---- DuckDB oracle ----

  private[operators] val shSql =
    """toks AS (
      |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3
      |      THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2]))
      |      ELSE [] END AS s
      |  FROM toks)""".stripMargin

  private val chShSql =
    s"""nrm AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(nt) >= $CHAR_GRAM
       |      THEN list_distinct(list_transform(range(1, len(nt)-${CHAR_GRAM - 2}), i -> substr(nt, i, $CHAR_GRAM)))
       |      ELSE [] END AS s
       |  FROM nrm)""".stripMargin

  /** SQL 60-bit left rotation by the LITERAL amount k (0 ≤ k < 60). */
  private def rotSql(h: String, k: Int): String =
    if (k == 0) h
    else s"((($h % ${1L << (60 - k)}) * ${1L << k}) + ($h // ${1L << (60 - k)}))"

  private def mhColsSqlFor(sigK: Int, bandRows: Int): String = (0 until sigK).map { j =>
    s"list_min(list_transform(hs, h -> xor(${rotSql("h", rotFor(j / bandRows))}, ${seed(j)}))) AS mh_$j"
  }.mkString(",\n    ")

  private def mhSqlFor(sigK: Int, bandRows: Int): String =
    s"""hsd AS (
       |  SELECT doc_id, s,
       |    list_transform(s, x -> CAST(('0x'||substr(md5('0:'||x),1,15)) AS BIGINT)) AS hs
       |  FROM sh),
       |mh AS (\n  SELECT doc_id, s,\n    ${mhColsSqlFor(sigK, bandRows)}\n  FROM hsd)""".stripMargin

  private[operators] val mhSql = mhSqlFor(K, K / BANDS)

  private def seedsSql(kMax: Int): String =
    (0 until kMax).map(seed).mkString("[", ", ", "]")

  /** Count-adaptive mirror of the (mh, bands) CTE pair: r(n) is derived
    * from the documents count by PURE INTEGER threshold arithmetic (the
    * same idiom as the hyperplane-LSH oracle — no float log), all
    * rMax·nBands minhashes are computed (static SQL cannot vary its term
    * count on data) and each band consumes its r(n)-row slice via
    * list_slice with the scalar r. Expects `sh(doc_id, s)` in scope;
    * exposes `mh(doc_id, s)` for pairsSql's verification join and
    * `bands(doc_id, band, sig)` with the MAX_BUCKET guard mirrored.
    * `step` mirrors `rowsFor`'s doublings-per-added-row: the k-th extra
    * row engages at ratio 2^(step·k). */
  private def adaptiveBandsSqlFor(nBands: Int, r0: Int, rMax: Int, step: Int = 1,
                                  bSql: String = null, bMaxOver: Int = 0): String = {
    val extra = (1 to rMax - r0).map { k =>
      s"CASE WHEN count(*) // $DOC_N0 >= ${1L << (step * k)} THEN 1 ELSE 0 END"
    }.mkString(" + ")
    val rExpr = s"least($rMax, $r0 + ($extra))"
    // band derivation mirrored per lane: `bSql` is a SQL expression over
    // the derived `r` (word: greatest(b0, r − 4) = bandsFor; char: the
    // ngramBandsFor step table as a CASE); null = the constant band count.
    // The minhash list is sliced to the LIVE b·r before transforming, so
    // the oracle computes exactly the signatures the Spark side does at
    // every corpus size.
    val bExpr = Option(bSql).getOrElse(s"$nBands")
    val bMax = if (bSql == null) nBands else bMaxOver
    s"""params AS (
       |  SELECT r, ($bExpr) AS b FROM (SELECT $rExpr AS r FROM documents)),
       |hsd AS (
       |  SELECT doc_id, s,
       |    list_transform(s, x -> CAST(('0x'||substr(md5('0:'||x),1,15)) AS BIGINT)) AS hs
       |  FROM sh),
       |mh AS (
       |  SELECT doc_id, s,
       |    list_transform(list_slice(${seedsSql(bMax * rMax)}, 1, p.b * p.r),
       |      (sd, j) -> list_min(list_transform(hs, h ->
       |        xor((((h % (1::BIGINT << (60 - ((7 * ((j-1) // p.r) + 3) % 60)))) * (1::BIGINT << ((7 * ((j-1) // p.r) + 3) % 60))) + (h // (1::BIGINT << (60 - ((7 * ((j-1) // p.r) + 3) % 60))))), sd)))) AS sigl
       |  FROM hsd, params p),
       |bands0 AS (
       |  SELECT doc_id, CAST(u.g AS INT) AS band,
       |    md5(array_to_string(list_slice(mh.sigl, CAST(u.g AS INT) * p.r + 1, (CAST(u.g AS INT) + 1) * p.r), ',')) AS sig
       |  FROM mh, params p, UNNEST(range(0, $bMax)) AS u(g)
       |  WHERE len(s) > 0 AND u.g < p.b),
       |bands AS (
       |  SELECT doc_id, band, sig FROM (
       |    SELECT doc_id, band, sig, count(*) OVER (PARTITION BY band, sig) AS bsz
       |    FROM bands0) WHERE bsz <= $MAX_BUCKET)""".stripMargin
  }
  private[operators] val wordBandsSql =
    adaptiveBandsSqlFor(BANDS, WORD_R0, WORD_MAX_R,
      bSql = s"greatest($BANDS, r - 4)", bMaxOver = math.max(BANDS, WORD_MAX_R - 4))
  private val ngramBandsSql =
    adaptiveBandsSqlFor(NGRAM_BANDS, NGRAM_R0, NGRAM_MAX_R, NGRAM_STEP,
      bSql = ngramBandsCaseSql, bMaxOver = ngramBandTable.map(_._2).max)

  private[operators] val pairsSql =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |verified AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
      |  FROM cand c JOIN mh x ON c.doc_a = x.doc_id JOIN mh y ON c.doc_b = y.doc_id)""".stripMargin

  private def simhashBitsSqlFor(bits: Int) = (0 until bits).map { b =>
    s"CASE WHEN 2*len(list_filter(hs, h -> (h >> $b) % 2 = 1)) >= len(hs) THEN ${1L << b} ELSE 0 END"
  }.mkString(" + ")
  private val simhashBitsSql = simhashBitsSqlFor(16)

  /** The C(B, B−k) pigeonhole UNION ALL arms over the `sg(doc_id, sig)`
    * CTE — the capped pair kernel's banding, one arm per combo, each
    * packing its (B−k) bands' bits into one BIGINT key by shift-or —
    * identical integer arithmetic to the Spark side's explode. (The
    * cluster lane no longer shares this: its oracle moved to the midpoint
    * ball join when the pigeonhole-over-reps variant was retired in
    * round 19.) */
  private def hamArmsSql(k: Int): String = {
    val r = SIM_BITS / SIM_BANDS
    hamCombos(k).zipWithIndex.map { case (c, ci) =>
      val key = c.zipWithIndex.map { case (b, j) =>
        s"(((sig >> ${b * r}) & ${(1L << r) - 1}) << ${j * r})"
      }.mkString(" | ")
      s"SELECT doc_id, sig, $ci AS combo, ($key) AS key FROM sg"
    }.mkString("\n  UNION ALL ")
  }

  /** The sg + b0 (pre-cap pigeonhole rows) CTE pair — mirror of
    * `hamBands0`, shared by the pair kernel and the saturation audit. */
  private[operators] def hammingBandsSql(k: Int = HAM_K): String =
    s"""sg AS (
       |  SELECT doc_id, (${simhashBitsSqlFor(SIM_BITS)}) AS sig
       |  FROM hs WHERE len(hs) > 0),
       |b0 AS (
       |  ${hamArmsSql(k)})""".stripMargin

  /** Oracle mirror of `hammingPairs`: expects an `hs(doc_id, hs)` CTE in
    * scope, yields the combo-banded verified pair SELECT (caller appends
    * ORDER BY). Shared by the text and binary-payload hamming dedups. */
  private[operators] def hammingPairsSql(k: Int = HAM_K): String = {
    s"""${hammingBandsSql(k)},
       |bands AS (
       |  SELECT doc_id, sig, combo, key FROM (
       |    SELECT *, count(*) OVER (PARTITION BY combo, key) AS bsz FROM b0)
       |  WHERE bsz <= $MAX_BUCKET)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.combo = b.combo AND a.key = b.key AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $k""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "dedup_minhash_sig" ->
      s"""WITH $shSql,\n$mhSql
         |SELECT doc_id, len(s) AS n_shingles, ${(0 until K).map(j => s"mh_$j").mkString(", ")}
         |FROM mh ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "dedup_lsh_pairs" ->
      s"""WITH $shSql,\n$wordBandsSql,\n$pairsSql
         |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM verified
         |WHERE jaccard >= 0.5
         |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin,
    "dedup_bucket_stats" ->
      s"""WITH $shSql,\n$wordBandsSql
         |SELECT band, count(*) AS n_buckets, CAST(max(bsz) AS BIGINT) AS max_bucket,
         |  CAST(sum(CASE WHEN bsz > $MAX_BUCKET THEN 1 ELSE 0 END) AS BIGINT) AS capped_buckets,
         |  CAST(sum(CASE WHEN bsz > $MAX_BUCKET THEN bsz ELSE 0 END) AS BIGINT) AS capped_rows
         |FROM (SELECT band, sig, count(*) AS bsz FROM bands0 GROUP BY band, sig)
         |GROUP BY band
         |ORDER BY band ASC NULLS FIRST""".stripMargin,
    "dedup_bucket_stats_ngram" ->
      s"""WITH $chShSql,\n$ngramBandsSql
         |SELECT band, count(*) AS n_buckets, CAST(max(bsz) AS BIGINT) AS max_bucket,
         |  CAST(sum(CASE WHEN bsz > $MAX_BUCKET THEN 1 ELSE 0 END) AS BIGINT) AS capped_buckets,
         |  CAST(sum(CASE WHEN bsz > $MAX_BUCKET THEN bsz ELSE 0 END) AS BIGINT) AS capped_rows
         |FROM (SELECT band, sig, count(*) AS bsz FROM bands0 GROUP BY band, sig)
         |GROUP BY band
         |ORDER BY band ASC NULLS FIRST""".stripMargin,
    "dedup_bucket_stats_hamming" ->
      s"""WITH hs AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
         |                   t -> CAST(('0x'||substr(md5('0:'||t),1,15)) AS BIGINT)) AS hs
         |  FROM documents),
         |${hammingBandsSql()}
         |SELECT combo AS band, count(*) AS n_buckets, CAST(max(bsz) AS BIGINT) AS max_bucket,
         |  CAST(sum(CASE WHEN bsz > $MAX_BUCKET THEN 1 ELSE 0 END) AS BIGINT) AS capped_buckets,
         |  CAST(sum(CASE WHEN bsz > $MAX_BUCKET THEN bsz ELSE 0 END) AS BIGINT) AS capped_rows
         |FROM (SELECT combo, key, count(*) AS bsz FROM b0 GROUP BY combo, key)
         |GROUP BY combo
         |ORDER BY band ASC NULLS FIRST""".stripMargin,
    // containment-index audit: df distribution over the hashed word-3-gram
    // inverted index (same md5 gram hash as hsd; DIV 2 exact — df(df−1)
    // is always even; sums CAST from DuckDB's HUGEINT like the sibling
    // audit lanes)
    "dedup_bucket_stats_contain" ->
      s"""WITH $shSql,
         |hsets AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(s, x -> CAST(('0x'||substr(md5('0:'||x),1,15)) AS BIGINT))) AS hs
         |  FROM sh WHERE len(s) > 0),
         |gdf AS (
         |  SELECT g, count(*) AS df
         |  FROM (SELECT doc_id, unnest(hs) AS g FROM hsets) GROUP BY g)
         |SELECT count(*) AS n_grams,
         |  CAST(sum(CASE WHEN df <= $DF_MAX THEN 1 ELSE 0 END) AS BIGINT) AS rare_grams,
         |  CAST(sum(CASE WHEN df > $DF_MAX THEN 1 ELSE 0 END) AS BIGINT) AS dropped_grams,
         |  CAST(max(df) AS BIGINT) AS max_df,
         |  CAST(sum(CASE WHEN df <= $DF_MAX THEN df ELSE 0 END) AS BIGINT) AS rare_rows,
         |  CAST(sum(CASE WHEN df > $DF_MAX THEN df ELSE 0 END) AS BIGINT) AS dropped_rows,
         |  CAST(sum(CASE WHEN df <= $DF_MAX THEN df * (df - 1) // 2 ELSE 0 END) AS BIGINT) AS cand_pairs_bound
         |FROM gdf""".stripMargin,
    "dedup_ngram" ->
      s"""WITH $chShSql,\n$ngramBandsSql,\n$pairsSql
         |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM verified
         |WHERE jaccard >= 0.6
         |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin,
    // the rare-gram inverted index + asymmetric containment, replayed
    // declaratively (hsd is mhSql's hashed-shingle CTE; list_distinct
    // mirrors the Spark side's array_distinct over hashed grams)
    "dedup_containment" ->
      s"""WITH $shSql,\n$mhSql,
         |hsets AS (SELECT doc_id, list_distinct(hs) AS hs FROM hsd WHERE len(s) > 0),
         |inv AS (SELECT doc_id, UNNEST(hs) AS g FROM hsets),
         |rare AS (
         |  SELECT doc_id, g FROM (
         |    SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM inv)
         |  WHERE df <= $DF_MAX),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id),
         |cont AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(len(x.hs) AS BIGINT) AS n_a, CAST(len(y.hs) AS BIGINT) AS n_b,
         |    CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
         |      / least(len(x.hs), len(y.hs)) AS c
         |  FROM cand c JOIN hsets x ON c.doc_a = x.doc_id JOIN hsets y ON c.doc_b = y.doc_id)
         |SELECT doc_a, doc_b, n_a, n_b, round(c, 6) AS containment
         |FROM cont WHERE c >= $CONTAIN_TAU
         |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $shSql,\n$wordBandsSql,\n$pairsSql,
         |p AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION ALL SELECT doc_b, doc_a FROM p),
         |walk(doc_id, cluster) AS (
         |  SELECT DISTINCT src, src FROM e
         |  UNION
         |  SELECT e.src, w.cluster FROM e JOIN walk w ON e.dst = w.doc_id)
         |SELECT doc_id, min(cluster) AS cluster FROM walk GROUP BY doc_id
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "dedup_drop_list" ->
      s"""WITH $shSql,\n$wordBandsSql,\n$pairsSql
         |SELECT DISTINCT doc_b AS doc_id FROM verified WHERE jaccard >= 0.5
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "dedup_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         |    array_to_string(list_slice(w, i, i + ${SPAN_N - 1}), ' ') AS g
         |  FROM t, UNNEST(range(1, len(w) - ${SPAN_N - 2})) AS u(i)
         |  WHERE len(w) >= $SPAN_N),
         |shared AS (SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) > 1),
         |d AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos ASC) AS grp
         |  FROM g JOIN shared USING (g)),
         |runs AS (SELECT doc_id, grp, count(*) AS run FROM d GROUP BY doc_id, grp),
         |pd AS (
         |  SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_dup_pos,
         |    CAST(max(run) AS BIGINT) AS max_run
         |  FROM runs GROUP BY doc_id),
         |np AS (SELECT doc_id, count(*) AS n_pos FROM g GROUP BY doc_id)
         |SELECT pd.doc_id, np.n_pos, pd.n_dup_pos, pd.max_run
         |FROM pd JOIN np USING (doc_id)
         |ORDER BY pd.doc_id ASC NULLS FIRST""".stripMargin,
    "dedup_exact" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct
        |FROM documents""".stripMargin,
    "dedup_prefix" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    md5(substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, $PREFIX_CHARS)) AS fp
         |  FROM documents),
         |g AS (
         |  SELECT fp, min(doc_id) AS kept_doc_id, count(*) AS n
         |  FROM d GROUP BY fp)
         |SELECT d.doc_id, g.kept_doc_id, d.fp AS prefix_fp
         |FROM d JOIN g USING (fp)
         |WHERE g.n > 1 AND d.doc_id <> g.kept_doc_id
         |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin,
    "dedup_hamming" ->
      s"""WITH hs AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
         |                   t -> CAST(('0x'||substr(md5('0:'||t),1,15)) AS BIGINT)) AS hs
         |  FROM documents),
         |${hammingPairsSql()}
         |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin,
    // fold-then-ball-join closure: reps = min doc per DISTINCT sig, each rep
    // expanded to its 61-element radius-1 ball, candidates = equal-midpoint
    // pairs (exact for radius ≤ 2 — see hammingClustersFrom), recursive
    // closure on the rep graph (same walk CTE as dedup_clusters), membership
    // expanded through the sig key; edge-free sigs label themselves.
    "dedup_hamming_clusters" ->
      s"""WITH RECURSIVE hs AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
         |                   t -> CAST(('0x'||substr(md5('0:'||t),1,15)) AS BIGINT)) AS hs
         |  FROM documents),
         |sg AS (
         |  SELECT doc_id, (${simhashBitsSqlFor(SIM_BITS)}) AS sig
         |  FROM hs WHERE len(hs) > 0),
         |sn AS (SELECT min(doc_id) AS doc_id, sig FROM sg GROUP BY sig),
         |mid AS (
         |  SELECT doc_id, sig, xor(sig, u.m) AS mid
         |  FROM sn, UNNEST(list_prepend(0::BIGINT,
         |    list_transform(range(0, $SIM_BITS), i -> (1::BIGINT << i)))) AS u(m)),
         |p AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM mid a JOIN mid b
         |    ON a.mid = b.mid AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= $HAM_K),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION ALL SELECT doc_b, doc_a FROM p),
         |walk(doc_id, cluster) AS (
         |  SELECT DISTINCT src, src FROM e
         |  UNION
         |  SELECT e.src, w.cluster FROM e JOIN walk w ON e.dst = w.doc_id),
         |comp AS (SELECT doc_id AS rep, min(cluster) AS cluster FROM walk GROUP BY doc_id)
         |SELECT g.doc_id AS doc_id, coalesce(c.cluster, n.doc_id) AS cluster
         |FROM sg g JOIN sn n USING (sig) LEFT JOIN comp c ON n.doc_id = c.rep
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "dedup_simhash" ->
      s"""WITH hs AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
         |                   t -> CAST(('0x'||substr(md5('0:'||t),1,15)) AS BIGINT)) AS hs
         |  FROM documents)
         |SELECT doc_id, ($simhashBitsSql) AS simhash16
         |FROM hs ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
