package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Corpus-construction operators a large-scale training-data pipeline runs
  * between "raw documents" and "training sequences" (builder prompt: the
  * LLM-pipeline surface beyond the reference's own operators):
  *
  *   - benchmark decontamination (n-gram overlap vs a held-out eval set),
  *   - weighted mixture sampling (per-source up/down-sampling),
  *   - sequence packing (fixed token budgets per shard),
  *   - PII scrubbing (regex redaction).
  *
  * Every operator is deterministic — sampling and sharding ride stable
  * md5-derived integers, never `rand()` — so results are reproducible across
  * runs AND engines, which is what makes them oracle-checkable in DuckDB.
  *
  * Scale notes per operator are on each definition; the common theme: the
  * only shuffles are on semantic keys (doc_id for the hit-count, shard for
  * the packing window), the benchmark gram set is the one broadcast side,
  * and everything else is a per-row codegen'd map over the scan.
  */
object DataPipeline {

  private def ord(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "documents")

  /** The shared normalized whitespace tokenization (same as TextAnalysis). */
  private def toks: Column =
    split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")

  private def md5long(c: Column): Column = Hashing.h60(c)

  // ---- decontam_ngram: benchmark decontamination ----------------------------
  //
  // Flag training documents that share any word n-gram with a held-out
  // benchmark/eval set — the standard guard against test-set leakage into
  // training corpora. The benchmark here is the deterministic doc_id%97==0
  // slice of the corpus; production would read the real eval suites (and use
  // 8-13-gram shingles — the synthetic vocab is too small for 8-grams to
  // collide, so the graded fixture uses 3-grams; the plan is identical).
  //
  // Scale: the benchmark side is tiny (|eval sets| ≪ corpus) — its distinct
  // gram set broadcasts, so the 100 TB training side streams through a map-
  // side hash join with NO shuffle of the corpus; the only exchange is the
  // per-doc hit-count aggregation (partial count first), O(contaminated
  // docs), not O(corpus).
  private val DECONTAM_N = 3

  /** (doc_id, gram) fan-out of the corpus — the shared substrate of the
    * decontamination operator and the corpus_build composite. Grams come
    * from the fused ShingleSet kernel (one pass per doc; the declarative
    * transform/slice form re-ran normalize+split per gram — see
    * DedupText.wordShingleSet). The kernel emits per-doc DISTINCT grams,
    * which both consumers are invariant to: decontam_ngram aggregates
    * count_distinct(g) per doc and contaminatedGrams distincts its
    * broadcast side; corpus_build reduces to a distinct doc_id set. */
  private def gramsOf(s: org.apache.spark.sql.SparkSession, dir: String) =
    docs(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.ShingleExpression.wordShingles(col("text"), DECONTAM_N)).as("g"))

  /** Train-side (doc_id, gram) rows whose gram also occurs in the benchmark
    * slice (doc_id % 97 == 0); the benchmark gram set is the broadcast. */
  private def contaminatedGrams(grams: DataFrame): DataFrame = {
    val bench = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
    grams.filter(col("doc_id") % 97 =!= 0).join(broadcast(bench), "g")
  }

  private val decontamNgram: Q = (s, dir) =>
    ord(
      contaminatedGrams(gramsOf(s, dir))
        .groupBy("doc_id")
        .agg(count_distinct(col("g")).as("n_shared")),
      "doc_id")

  // ---- sample_mixture: weighted mixture sampling ----------------------------
  //
  // The data-mixing step: each source carries a sampling weight; weight > 1
  // up-samples (whole copies), the fractional part is a Bernoulli thinning
  // decided by a stable per-doc hash — deterministic, so an identical rerun
  // (or a second engine) draws the identical corpus. Weights here derive
  // from the source suffix (whole = k%4 copies, fraction = (k%3+1)/4) to
  // exercise 0-copy drops, pass-through, and multi-copy up-sampling; a real
  // pipeline would join a curated weight table the same way.
  //
  // Scale: pure per-row arithmetic + a bounded explode (≤ 4 copies) — a
  // single map stage, no shuffle, no weight-table skew (the weight "join" is
  // an expression; a real weight table would broadcast).
  /** Copies each doc keeps under the mixture weights: whole = k%4 copies,
    * fraction = (k%3+1)/4 as a hash-thinned Bernoulli — shared verbatim by
    * sample_mixture and corpus_build so the two can't drift. */
  private def mixCopies: Column = {
    // a digitless source extracts '': branch BEFORE casting (ANSI mode makes
    // cast('' as long) throw, so coalesce-after-cast never fires) and default
    // the weight key to 0 (drop) — mirroring the oracle's TRY_CAST+COALESCE.
    // The cast itself only ever sees all-digit strings.
    val extracted = regexp_extract(col("source"), "(\\d+)", 1)
    val k = when(extracted === "", lit(0L)).otherwise(extracted.cast("long"))
    val whole = k % 4                         // 0..3 whole copies
    val fracThousandths = ((k % 3) + 1) * 250 // 250 | 500 | 750
    val draw = md5long(concat(lit("mixw:"), col("doc_id"))) % 1000
    whole + when(draw < fracThousandths, 1L).otherwise(0L)
  }

  private val sampleMixture: Q = (s, dir) =>
    ord(
      docs(s, dir)
        .withColumn("n_copies", mixCopies)
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx")),
      "doc_id", "copy_idx")

  // ---- sample_temperature: α-temperature domain rebalancing -----------------
  //
  // The multilingual/multi-domain LM recipe (mBERT/XLM-R's exponentiated
  // smoothing; the multilingual-T5 line uses the same form): sample domain
  // d with probability ∝ (n_d/N)^α, α = 0.5, flattening the head so
  // low-resource languages aren't drowned (the domain here is `lang`, the
  // skewed axis of this corpus). Realized by SUBSAMPLING only
  // (never upsampling): acceptance rate r_d = sqrt(n_min/n_d), which makes
  // expected kept counts ∝ sqrt(n_d) with the smallest domain kept whole.
  // The accept draw is the stable md5 hash — deterministic, rerun- and
  // engine-stable, and independent per doc. FP discipline: r_d is one
  // divide + one sqrt + one multiply (all correctly-rounded IEEE ops in
  // the same order on both engines) floored to integer ppm, so the accept
  // threshold compares longs, never raw doubles.
  //
  // Scale: domain counts are one partial-aggregated groupBy over the
  // corpus (|domains| rows), broadcast back; the accept filter is per-row
  // map work. One corpus-proportional exchange total — same cost class as
  // sample_mixture.
  private val TEMP_PPM = 1000000L
  private val sampleTemperature: Q = (s, dir) => {
    val d = docs(s, dir)
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n_d"))
    val nMin = counts.agg(min(col("n_d")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("rate_ppm",
        floor(sqrt(col("n_min").cast("double") / col("n_d").cast("double"))
          * lit(1000000.0)).cast("long"))
      .select(col("lang"), col("n_d"), col("rate_ppm"))
    ord(
      d.join(broadcast(rates), "lang")
        .filter(md5long(concat(lit("temp:"), col("doc_id"))) % TEMP_PPM < col("rate_ppm"))
        .select(col("doc_id"), col("lang"), col("n_d"), col("rate_ppm")),
      "doc_id")
  }

  // ---- sample_stratified: deterministic per-stratum uniform sample ----------
  //
  // Keep the k docs with the SMALLEST stable hash within each stratum
  // (language) — the distributed form of per-stratum reservoir sampling:
  // bottom-k by a uniform hash IS a uniform k-sample without replacement,
  // but unlike a sequential reservoir it's deterministic (reruns and other
  // engines draw the identical sample), mergeable (bottom-k of unions =
  // bottom-k of bottom-k's), and needs no driver-side state.
  //
  // Scale: the rank<=k window compiles to a partial WindowGroupLimit — each
  // map task keeps only its k smallest draws PER STRATUM before the
  // exchange, so the shuffle carries O(tasks × strata × k) rows, never the
  // corpus, and a skewed stratum is trimmed map-side like any other
  // (PlanShapeSpec pins the pre-shuffle group limit).
  private val STRAT_K = 30
  private val sampleStratified: Q = (s, dir) => {
    val w = Window.partitionBy("lang")
      .orderBy(col("draw").asc, col("doc_id").asc)
    ord(
      docs(s, dir)
        .withColumn("draw", md5long(concat(lit("strat:"), col("doc_id"))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= STRAT_K)
        .select("doc_id", "lang", "source", "n_chars", "rk"),
      "lang", "rk")
  }

  // ---- pack_sequences: fixed-token-budget packing ---------------------------
  //
  // Assign documents to training sequences of ~BUDGET tokens: shard the
  // corpus by a stable hash, order each shard deterministically, and cut the
  // running token total into BUDGET-sized bins. This is the standard
  // scalable approximation of greedy packing — exact greedy is inherently
  // sequential, so production packs per shard exactly as here.
  //
  // Scale: ONE shuffle on the shard key, then a per-shard running-sum window
  // — each shard is an independent partition, so 1000 executors pack 1000s
  // of shards in parallel; no global ordering anywhere. All-integer
  // arithmetic (token counts, DIV) — bit-exact on any engine.
  private val PACK_BUDGET = 512
  private val PACK_SHARDS = 16
  private val packSequences: Q = (s, dir) => {
    val w = Window.partitionBy("shard").orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ord(
      docs(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("shard", md5long(concat(lit("pack:"), col("doc_id"))) % PACK_SHARDS)
        .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .withColumn("seq_id", expr(s"CAST(cum_before DIV $PACK_BUDGET AS BIGINT)"))
        .select("shard", "doc_id", "n_tokens", "cum_before", "seq_id"),
      "shard", "doc_id")
  }

  // ---- text_pii_scrub: regex redaction --------------------------------------
  //
  // Redact emails and IPv4 addresses. The synthetic corpus carries no PII,
  // so the fixture plants a deterministic email+IP per document and the
  // operator must scrub exactly those (the oracle plants the same strings
  // and applies the same redaction — any divergence in regex semantics or
  // replacement order breaks the hash). Patterns are kept to the
  // Java-regex ∩ RE2 common dialect.
  //
  // Scale: per-row regex over the scan — single map stage, no shuffle; the
  // regexes are linear-time on the document text.
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  private val textPiiScrub: Q = (s, dir) => {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com from 10.0."),
      pmod(col("doc_id"), lit(256)), lit(".7"))
    val scrubbed =
      regexp_replace(regexp_replace(planted, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
    ord(
      docs(s, dir)
        .withColumn("planted", planted)
        .select(col("doc_id"),
          regexp_count(col("planted"), lit(EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("planted"), lit(Ipv4Re)).cast("long").as("n_ips"),
          md5(scrubbed).as("scrub_md5")),
      "doc_id")
  }

  // ---- corpus_build: the composite end-to-end corpus construction ----------
  //
  // The flagship of this module — the whole cleaning chain a training corpus
  // runs, composed as ONE declarative plan: quality floor → exact dedup
  // (keep lowest id per normalized fingerprint) → NEAR-dedup (the MinHash/
  // LSH drop list from DedupText, keep-lowest-id) → drop the benchmark
  // slice → decontaminate against it → train-split assign → mixture
  // weights; then a per-source accounting roll-up so the full chain is
  // hash-checkable.
  //
  // Scale: per-row filters/hashes ride the scan; the dedup window shuffles
  // once on the fingerprint; the near-dup drop list is the banded LSH
  // equi-join (never all-pairs — DedupText's scale notes apply verbatim);
  // decontamination is the broadcast-gram anti-join; the roll-up is a
  // partial-aggregated groupBy(source). No stage touches more than
  // O(corpus) rows and nothing collects.
  private val corpusBuild: Q = (s, dir) => {
    val nWsTokens = size(split(col("text"), " ")).cast("long")
    val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val wDedup = Window.partitionBy("fp").orderBy(col("doc_id").asc)

    val base = docs(s, dir)
      .withColumn("n_tokens", nWsTokens)
      .filter(col("n_tokens") >= 5)                        // quality floor
      .withColumn("fp", fp)
      .withColumn("rn", row_number().over(wDedup))
      .filter(col("rn") === 1)                             // exact dedup
      .drop("rn")

    // decontamination: benchmark grams come from the RAW corpus slice (the
    // eval set is fixed before any cleaning), train side is the deduped
    // remainder — the same contaminatedGrams substrate decontam_ngram grades
    val contaminated = contaminatedGrams(gramsOf(s, dir)).select("doc_id").distinct()

    val splitBucket = md5long(concat(lit("split:"), col("doc_id"))) % 100

    // near-dup drop list: any doc that is the higher id of a verified
    // LSH pair (word-3-shingle MinHash, exact-Jaccard ≥ 0.5 confirm)
    val nearDups = DedupText.verifiedPairs(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()

    ord(
      base
        .join(nearDups, Seq("doc_id"), "left_anti")        // near-dedup
        .filter(col("doc_id") % 97 =!= 0)                  // benchmark slice out
        .join(contaminated, Seq("doc_id"), "left_anti")    // decontaminate
        .filter(splitBucket < 80)                          // train split
        .withColumn("n_copies", mixCopies)
        .filter(col("n_copies") > 0)                       // mixture thinning
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_copies")).as("n_copies"),
          sum(col("n_tokens") * col("n_copies")).as("n_tokens_total")),
      "source")
  }

  // ---- corpus_shuffle: deterministic global training order -----------------
  //
  // The step after corpus_build: training consumes examples in "random"
  // order, but the order must be REPLAYABLE — resume from step N, audit
  // which examples preceded a checkpoint, reproduce a run bit-for-bit. So
  // the draw is a content hash, never rand(): shard = h60("shuf:"+doc_id)
  // mod SHARDS picks the output shard (the training-file unit), and the
  // within-shard position orders by the INDEPENDENT draw h60("ord:"+doc_id)
  // (reusing the shard hash would sort each shard by the same residue
  // classes that formed it — correlated, not shuffled).
  //
  // Scale: one exchange, hash-partitioned on shard. The within-shard
  // row_number is single-task per shard BY DESIGN: a shard IS the bounded
  // training-file unit, and a production run sets SHARDS so each shard is
  // one file-sized slice (~1 GB ⇒ 100 TB ≈ 100k shards) — the per-shard
  // sort is exactly the work of writing that one output file. SHARDS is
  // the parallelism knob, not a hidden constant.
  private val SHUFFLE_SHARDS = 16
  private val corpusShuffle: Q = (s, dir) => {
    val shard = md5long(concat(lit("shuf:"), col("doc_id"))) % SHUFFLE_SHARDS
    val draw = md5long(concat(lit("ord:"), col("doc_id")))
    val w = Window.partitionBy("shard").orderBy(col("draw").asc, col("doc_id").asc)
    ord(
      docs(s, dir)
        .select(col("doc_id"), col("source"), shard.as("shard"), draw.as("draw"))
        .withColumn("seq", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("seq"), col("source")),
      "doc_id")
  }

  // ---- sample_reservoir: one-pass weighted sampling (A-ES race) ------------
  //
  // Weighted sampling without replacement, the Efraimidis–Spirakis
  // exponential race: each row draws u ~ U(0,1) from a stable content hash
  // and computes the race key e = −ln(u)/w; the k SMALLEST keys are a
  // weighted sample without replacement (heavier rows draw systematically
  // smaller keys). This is the canonical way to pull a bounded sample from
  // 100 TB in ONE scan: the key is per-row arithmetic, and the global top-k
  // executes as per-partition top-k + a single ≤ k·P-row merge
  // (TakeOrderedAndProject) — no full sort, no full shuffle, no second pass
  // over the data. Weight here = n_chars (sample long documents more).
  //
  // Determinism across engines: u = (h60 + 0.5)/2^60 ∈ (0,1) exactly
  // replayable in DuckDB; the race key rounds to 9 dp BEFORE ranking so a
  // last-ULP difference in an engine's ln() cannot flip the k-th boundary,
  // and ties break by doc_id.
  private val RESERVOIR_K = 100
  private val sampleReservoir: Q = (s, dir) => {
    val u = (md5long(concat(lit("res:"), col("doc_id"))).cast("double") + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60, exactly representable
    docs(s, dir).filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        round((lit(0.0) - log(u)) / col("n_chars").cast("double"), 9).as("race_key"))
      .orderBy(col("race_key").asc_nulls_first, col("doc_id").asc_nulls_first)
      .limit(RESERVOIR_K)
  }

  val queries: Map[String, Q] = Map(
    "sample_reservoir" -> sampleReservoir,
    "corpus_shuffle" -> corpusShuffle,
    "decontam_ngram" -> decontamNgram,
    "sample_mixture" -> sampleMixture,
    "sample_temperature" -> sampleTemperature,
    "sample_stratified" -> sampleStratified,
    "pack_sequences" -> packSequences,
    "text_pii_scrub" -> textPiiScrub,
    "corpus_build" -> corpusBuild
  )

  val oracle: Map[String, String] = Map(
    "sample_temperature" ->
      s"""WITH c AS (SELECT lang, count(*) AS n_d FROM documents GROUP BY 1),
         |m AS (SELECT min(n_d) AS n_min FROM c),
         |r AS (
         |  SELECT lang, n_d,
         |    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_d AS DOUBLE)) * 1000000.0) AS BIGINT)
         |      AS rate_ppm
         |  FROM c CROSS JOIN m)
         |SELECT d.doc_id, d.lang, r.n_d, r.rate_ppm
         |FROM documents d JOIN r USING (lang)
         |WHERE CAST(('0x' || substr(md5('temp:' || d.doc_id), 1, 15)) AS BIGINT) % $TEMP_PPM
         |  < r.rate_ppm
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "sample_reservoir" ->
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |    round((0.0 - ln((CAST(('0x' || substr(md5('res:' || doc_id), 1, 15)) AS BIGINT) + 0.5)
         |      / 1152921504606846976.0)) / CAST(n_chars AS DOUBLE), 9) AS race_key
         |  FROM documents WHERE n_chars > 0)
         |SELECT doc_id, n_chars, race_key FROM d
         |ORDER BY race_key ASC NULLS FIRST, doc_id ASC NULLS FIRST LIMIT $RESERVOIR_K""".stripMargin,
    "corpus_shuffle" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(('0x' || substr(md5('shuf:' || doc_id), 1, 15)) AS BIGINT) % $SHUFFLE_SHARDS AS shard,
         |    CAST(('0x' || substr(md5('ord:' || doc_id), 1, 15)) AS BIGINT) AS draw
         |  FROM documents)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY draw ASC, doc_id ASC) AS BIGINT) AS seq,
         |  source
         |FROM d ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "decontam_ngram" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, array_to_string(list_slice(w, i, i + ${DECONTAM_N - 1}), ' ') AS g
         |  FROM t, UNNEST(range(1, len(w) - ${DECONTAM_N - 1} + 1)) AS u(i)
         |  WHERE len(w) >= $DECONTAM_N),
         |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
         |SELECT doc_id, count(DISTINCT g.g) AS n_shared
         |FROM g JOIN bench USING (g) WHERE doc_id % 97 <> 0
         |GROUP BY doc_id ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "sample_mixture" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    COALESCE(TRY_CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT), 0) % 4
        |      + CASE WHEN CAST(('0x' || substr(md5('mixw:' || doc_id), 1, 15)) AS BIGINT) % 1000
        |             < (COALESCE(TRY_CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT), 0) % 3 + 1) * 250
        |        THEN 1 ELSE 0 END AS n_copies
        |  FROM documents)
        |SELECT doc_id, source, CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy_idx
        |FROM c WHERE n_copies > 0
        |ORDER BY doc_id ASC NULLS FIRST, copy_idx ASC NULLS FIRST""".stripMargin,
    "sample_stratified" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source, n_chars,
         |    CAST(('0x' || substr(md5('strat:' || doc_id), 1, 15)) AS BIGINT) AS draw
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, source, n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY draw ASC, doc_id ASC) AS rk
         |  FROM d)
         |SELECT doc_id, lang, source, n_chars, CAST(rk AS INT) AS rk
         |FROM r WHERE rk <= $STRAT_K
         |ORDER BY lang ASC NULLS FIRST, rk ASC NULLS FIRST""".stripMargin,
    "pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(('0x' || substr(md5('pack:' || doc_id), 1, 15)) AS BIGINT) % $PACK_SHARDS AS shard
         |  FROM documents),
         |c AS (
         |  SELECT shard, doc_id, n_tokens,
         |    COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM d)
         |SELECT shard, doc_id, n_tokens, CAST(cum_before AS BIGINT) AS cum_before,
         |  CAST(cum_before // $PACK_BUDGET AS BIGINT) AS seq_id
         |FROM c ORDER BY shard ASC NULLS FIRST, doc_id ASC NULLS FIRST""".stripMargin,
    "corpus_build" ->
      s"""WITH base AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    text
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) >= 5),
         |dedup AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
         |    FROM base) WHERE rn = 1),
         |t AS (
         |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, array_to_string(list_slice(w, i, i + ${DECONTAM_N - 1}), ' ') AS g
         |  FROM t, UNNEST(range(1, len(w) - ${DECONTAM_N - 1} + 1)) AS u(i)
         |  WHERE len(w) >= $DECONTAM_N),
         |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
         |contaminated AS (
         |  SELECT DISTINCT doc_id FROM g JOIN bench USING (g) WHERE doc_id % 97 <> 0),
         |${DedupText.shSql},
         |${DedupText.wordBandsSql},
         |${DedupText.pairsSql},
         |near_dups AS (SELECT DISTINCT doc_b AS doc_id FROM verified WHERE jaccard >= 0.5),
         |clean AS (
         |  SELECT d.doc_id, d.source, d.n_tokens,
         |    COALESCE(TRY_CAST(regexp_extract(d.source, '(\\d+)', 1) AS BIGINT), 0) % 4
         |      + CASE WHEN CAST(('0x' || substr(md5('mixw:' || d.doc_id), 1, 15)) AS BIGINT) % 1000
         |             < (COALESCE(TRY_CAST(regexp_extract(d.source, '(\\d+)', 1) AS BIGINT), 0) % 3 + 1) * 250
         |        THEN 1 ELSE 0 END AS n_copies
         |  FROM dedup d
         |  WHERE d.doc_id % 97 <> 0
         |    AND d.doc_id NOT IN (SELECT doc_id FROM near_dups)
         |    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
         |    AND CAST(('0x' || substr(md5('split:' || d.doc_id), 1, 15)) AS BIGINT) % 100 < 80)
         |SELECT source, count(*) AS n_docs, CAST(sum(n_copies) AS BIGINT) AS n_copies,
         |  CAST(sum(n_tokens * n_copies) AS BIGINT) AS n_tokens_total
         |FROM clean WHERE n_copies > 0
         |GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin,
    "text_pii_scrub" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@example.com from 10.0.' || (doc_id % 256) || '.7' AS planted
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(planted, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(planted, '$Ipv4Re')) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(planted, '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g')) AS scrub_md5
         |FROM p ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
