package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators for training-data pipelines (builder prompt; SURVEY §7
  * phase 5): token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure built-in expressions over the `documents` table — per-row, no
  * shuffle, codegen-friendly: at 100 TB these run as a single map stage over
  * the parquet scan. Ratios are single IEEE double divisions (bit-identical on
  * any engine); hashes are md5-based so the DuckDB oracle reproduces them.
  *
  * The language-ID marker lists are tuned to the synthetic corpus vocabulary —
  * in production they'd be per-language stopword lists; the operator shape
  * (score-per-language via array filter, deterministic argmax) is the real
  * deliverable.
  */
object TextAnalysis {

  private def ord(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  // Whitespace tokens + BPE-ish regex tokens (letters run | digit | other symbol).
  private val textTokens: Q = (s, dir) =>
    ord(
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]|[^a-z0-9\\s]")).cast("long").as("n_bpe_tokens")),
      "doc_id")

  // Quality signals: alpha ratio, space ratio, mean token length, stopword ratio.
  // Divisions are guarded: an empty document yields NULL ratios on both engines
  // (Spark double x/0 would be NaN/Inf while DuckDB yields NULL — the guard
  // keeps the degenerate case engine-agnostic).
  private val textQuality: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    def safeDiv(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0, num.cast("double") / den.cast("double"))
    ord(
      Tables(s, dir, "documents")
        .withColumn("n_alpha", regexp_count(col("text"), lit("[a-z]")).cast("long"))
        .withColumn("n_space", regexp_count(col("text"), lit(" ")).cast("long"))
        .withColumn("n_toks", size(toks).cast("long"))
        .withColumn("n_stop", size(filter(toks, t => t.isin("the", "a", "of"))).cast("long"))
        .select(
          col("doc_id"), col("n_chars"),
          safeDiv(col("n_alpha"), col("n_chars")).as("alpha_ratio"),
          safeDiv(col("n_space"), col("n_chars")).as("space_ratio"),
          safeDiv(col("n_chars") - col("n_space"), col("n_toks")).as("mean_tok_len"),
          safeDiv(col("n_stop"), col("n_toks")).as("stopword_ratio")),
      "doc_id")
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("data", "line", "value"),
    "de" -> Seq("window", "row", "group"),
    "fr" -> Seq("query", "stream", "filter"),
    "zh" -> Seq("batch", "vector", "hash"))

  // Marker-token scoring with a deterministic argmax (priority = list order).
  private val textLangid: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    val scored = langMarkers.foldLeft(Tables(s, dir, "documents")) { case (df, (l, ms)) =>
      df.withColumn(s"s_$l", size(filter(toks, t => t.isin(ms: _*))).cast("long"))
    }
    val langs = langMarkers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((l, i), els) =>
      val beats = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(beats, lit(l)).otherwise(els)
    }
    ord(
      scored.select(
        col("doc_id") +: langs.map(l => col(s"s_$l")) :+ pred.as("pred_lang") :+ col("lang").as("actual_lang"): _*),
      "doc_id")
  }

  // Normalized-content fingerprints: md5 hex + a 60-bit integer form
  // (rolling-hash role; md5-based so the oracle can reproduce it).
  private val textFingerprint: Q = (s, dir) => {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    ord(
      Tables(s, dir, "documents").select(
        col("doc_id"),
        md5(norm).as("fp_md5"),
        Hashing.h60(norm).as("fp64")),
      "doc_id")
  }

  // Overlapping token-window chunking — the standard long-document prep for
  // a context-bounded trainer: size-64 windows every 48 tokens (16 overlap).
  // Pure per-row fan-out (posexplode), no shuffle; chunk text is emitted as
  // md5 so the compare stays cheap.
  private val CHUNK = 64
  private val STRIDE = 48
  private val textChunks: Q = (s, dir) => {
    val toks = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    ord(
      Tables(s, dir, "documents")
        .withColumn("t", toks)
        .select(col("doc_id"), col("t"),
          posexplode(sequence(lit(0), floor((size(col("t")) - 1) / STRIDE).cast("int")))
            .as(Seq("pos", "i")))
        .withColumn("chunk", slice(col("t"), col("i") * STRIDE + 1, lit(CHUNK)))
        .select(col("doc_id"), col("i").cast("long").as("chunk_idx"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5")),
      "doc_id", "chunk_idx")
  }

  // Unicode canonicalization ahead of any hash (dedup/fingerprint): NFC
  // composition + accent fold through the native `graft_nfc`/`graft_unaccent`
  // expressions (functions.TextNormalize — Spark has no builtin; a UDF would
  // break whole-stage codegen). The fixture text is ASCII, so each doc gets
  // a DECOMPOSED accented suffix (base letter + combining mark, keyed by
  // doc_id) — NFC must compose it (shorter by exactly one codepoint), the
  // fold must strip it back to the bare letter. Zero shuffle, per-row
  // codegen.
  private val textNormalize: Q = (s, dir) => {
    // combining acute/diaeresis/tilde/cedilla as explicit escapes (a
    // precomposed source literal would make NFC a no-op and the test vacuous)
    val suffixes = array(lit("e\u0301"), lit("u\u0308"), lit("n\u0303"), lit("c\u0327"))
    ord(
      Tables(s, dir, "documents")
        .withColumn("raw", concat(substring(col("text"), 1, 20),
          element_at(suffixes, (col("doc_id") % 4 + 1).cast("int"))))
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("n_raw"),
          expr("graft_nfc(raw)").as("nfc"),
          length(expr("graft_nfc(raw)")).cast("long").as("n_nfc"),
          expr("graft_unaccent(raw)").as("folded")),
      "doc_id")
  }

  // TF-IDF term weighting — the classic relevance/keyword-extraction score,
  // here the top-3 terms per document. Log-free IDF (tf · N/df): the usual
  // ln() dampening is a monotone reshaping that doesn't change per-doc term
  // ranks, and libm logs aren't bit-portable across engines — N/df keeps
  // every arithmetic step an exact IEEE op, so the hash gate holds.
  //
  // Scale: tf pre-aggregates on (doc, term) — the fan-out exchange; df is a
  // second partial-aggregated exchange over the already-collapsed tf rows
  // (vocabulary-sized, ≪ token count); the tf⋈df equi-join shuffles on term;
  // the final top-3 window trims map-side via WindowGroupLimit like
  // sample_stratified. Nothing driver-side; N arrives as a broadcast
  // 1-row cross join.
  private val TFIDF_K = 3
  private val textTfidf: Q = (s, dir) => {
    val toks = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    val d = Tables(s, dir, "documents")
    val tf = d.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    ord(
      tf.join(df, "term").join(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") * (col("n").cast("double") / col("df").cast("double")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TFIDF_K)
        .select("doc_id", "term", "tf", "df", "score", "rk"),
      "doc_id", "rk")
  }

  // BM25 retrieval ranking — the classic probabilistic relevance score
  // (Robertson/Spärck Jones), here the top-20 corpus documents for a fixed
  // query term set. Log-free idf ((N−df+0.5)/(df+0.5), the argument of the
  // usual ln): per-term the reshaping is monotone, and the per-doc sum over
  // a FIXED 4-term query keeps cross-engine totals bit-equal because every
  // step is the same IEEE op in the same syntactic order on both engines
  // (libm ln is not bit-portable — same discipline as text_tfidf). The
  // saturation constants are spelled as the literals 2.2 (= k1+1), 1.2
  // (= k1), 0.25 (= 1−b) and 0.75 (= b) on BOTH sides: computing k1+1 at
  // runtime lands on a half-ulp rounding tie that the literal avoids.
  //
  // FP-sum discipline: the per-doc total is NOT a sum() over scored rows
  // (order-dependent float addition) — each term's score pivots into its
  // own column via a single-element conditional aggregate (exact), and the
  // total adds the four columns in fixed syntactic order.
  //
  // Scale: tf collapses (doc, term) map-side after the query-term filter
  // (≤|terms| rows per doc cross the one fan-out exchange); df and the
  // (N, Σdl) corpus stats are tiny broadcast sides; top-k is
  // TakeOrderedAndProject (per-partition heads, never a global sort).
  private[operators] val BM25_TERMS = Seq("vector", "hash", "window", "merge")
  private val BM25_K = 20

  /** (doc_id, dl, s_<term>…, bm25) for every doc matching ≥ 1 query term —
    * the shared scoring core of `text_bm25` and the RRF hybrid lane
    * (HybridRetrieval). Raw doubles; consumers round/top-k. */
  private[operators] def bm25PerDoc(s: SparkSession, dir: String): DataFrame = {
    val toks = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"), col("t"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(BM25_TERMS: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = d.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
    val idf = (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val norm = lit(1.2) * (lit(0.25) + lit(0.75) *
      (col("dl").cast("double") / (col("sum_dl").cast("double") / col("n").cast("double"))))
    val perDoc = tf.join(broadcast(df), "term").join(broadcast(stats))
      .withColumn("score",
        idf * ((col("tf").cast("double") * lit(2.2)) / (col("tf").cast("double") + norm)))
      .groupBy("doc_id")
      .agg(first(col("dl")).as("dl"), BM25_TERMS.map(t =>
        coalesce(sum(when(col("term") === t, col("score"))), lit(0.0)).as(s"s_$t")): _*)
    val total = BM25_TERMS.map(t => col(s"s_$t")).reduceLeft(_ + _)
    perDoc.withColumn("bm25", total)
  }

  private val textBm25: Q = (s, dir) =>
    ord(
      bm25PerDoc(s, dir)
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(BM25_K)
        .select(col("doc_id") +: col("dl") +:
          BM25_TERMS.map(t => round(col(s"s_$t"), 6).as(s"s_$t")) :+
          round(col("bm25"), 6).as("bm25"): _*),
      "doc_id")

  // Deterministic train/val/test assignment: hash-bucket the stable key so
  // the split is reproducible across runs and engines (never random()).
  private val textSplitAssign: Q = (s, dir) => {
    val bucket = Hashing.h60(concat(lit("split:"), col("doc_id")))
      .cast("long") % 100
    ord(
      Tables(s, dir, "documents")
        .select(col("doc_id"), bucket.as("bucket"),
          when(bucket < 80, "train").when(bucket < 95, "val").otherwise("test").as("split")),
      "doc_id")
  }

  // Per-domain quota sampling (the data-mixing primitive: cap any one
  // source's contribution). Preference is a stable content hash, so the
  // sample is "random" yet reproducible across runs and engines; the window
  // shuffles on `source` — with a pathologically dominant domain one would
  // pre-filter by hash threshold before the exact rank, same as any top-N.
  private val DOMAIN_CAP = 15
  private val textDomainCap: Q = (s, dir) => {
    val pref = Hashing.h60(concat(lit("mix:"), col("doc_id")))
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("pref").asc, col("doc_id").asc)
    ord(
      Tables(s, dir, "documents")
        .withColumn("pref", pref)
        .withColumn("sample_rank", row_number().over(w).cast("long"))
        .filter(col("sample_rank") <= DOMAIN_CAP)
        .select("source", "doc_id", "sample_rank"),
      "source", "doc_id")
  }

  // Repetition / boilerplate scoring (Gopher-style filters): duplicate-token
  // ratio, duplicate-bigram ratio, most-frequent-token dominance. Pure
  // per-row array expressions (the per-doc mode is O(tokens · distinct) in a
  // single codegen'd row pass — no shuffle anywhere).
  private val textRepetition: Q = (s, dir) => {
    val toks = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    def safeDiv(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0, num.cast("double") / den.cast("double"))
    ord(
      Tables(s, dir, "documents")
        .withColumn("t", toks)
        .withColumn("n", size(col("t")).cast("long"))
        .withColumn("bg",
          when(size(col("t")) >= 2,
            transform(sequence(lit(1), size(col("t")) - 1), i =>
              concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1))))
            .otherwise(array().cast("array<string>")))
        .withColumn("top_n",
          array_max(transform(array_distinct(col("t")), x =>
            size(filter(col("t"), y => y === x)))).cast("long"))
        .select(
          col("doc_id"), col("n").as("n_tokens"),
          safeDiv(col("n") - size(array_distinct(col("t"))), col("n")).as("dup_token_ratio"),
          safeDiv(size(col("bg")) - size(array_distinct(col("bg"))), size(col("bg"))).as("dup_bigram_ratio"),
          safeDiv(col("top_n"), col("n")).as("top_token_ratio")),
      "doc_id")
  }

  // Bigram language-model scoring (the CCNet/KenLM-style quality signal,
  // log-free): train bigram document frequencies ON the corpus itself, then
  // score each document by how "expected" its bigrams are — avg_df high =
  // common phrasing, n_novel high = phrasing seen nowhere else (gibberish or
  // genuinely unique). Log-probability dampening is a monotone reshaping that
  // doesn't change per-doc ranks, and libm logs aren't bit-portable across
  // engines — the counts and one IEEE division keep the hash gate exact
  // (same reasoning as text_tfidf).
  //
  // Scale: per-doc DISTINCT bigrams collapse in a partial aggregate before
  // the one fan-out exchange; the df table is vocabulary-sized (≪ corpus) and
  // its join back to doc-bigrams shuffles on the bigram key; the per-doc
  // rollup is a fourth partial-aggregated exchange. The "model" (df table) is
  // never collected or broadcast — at 100 TB it's a distributed join, exactly
  // how a sharded n-gram LM scores a corpus.
  private val textLmScore: Q = (s, dir) => {
    // per-doc DISTINCT bigrams straight from the fused ShingleSet kernel
    // (n=2 word grams): the kernel's per-doc distinct plus doc_id in the
    // key makes every (doc_id, bg) row unique BY CONSTRUCTION, so the
    // distinct() shuffle the exploded transform needed is gone — and the
    // declarative form re-ran normalize+split per bigram on top (see
    // DedupText.wordShingleSet).
    val db = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.ShingleExpression.wordShingles(col("text"), 2)).as("bg"))
    val df = db.groupBy("bg").agg(count(lit(1)).as("df"))
    ord(
      db.join(df, "bg")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_bigrams"),
          sum(col("df")).as("sum_df"),
          count(when(col("df") === 1L, lit(1))).as("n_novel"))
        .withColumn("avg_df", col("sum_df").cast("double") / col("n_bigrams").cast("double")),
      "doc_id")
  }

  // ---- sql_api_pipeline: the SQL string surface, end to end ---------------
  //
  // Everything above uses the Dataset API; a SQL-only consumer gets the same
  // engine through `spark.sql` + the functions GraftExtensions registers.
  // This query is ONE SQL string exercising the custom-expression surface —
  // graft_nfc → graft_unaccent (Unicode canonicalization, no Spark builtin)
  // feeding graft_jaccard (the fused set kernel) — against each language's
  // reference document. Same Catalyst plan discipline as the API form: the
  // per-lang reference is a ≤|langs|-row broadcast side, everything else is
  // per-row map work.
  private val sqlApiPipeline: Q = (s, dir) => {
    Tables(s, dir, "documents").createOrReplaceTempView("graft_sql_docs")
    s.sql("""
      WITH t AS (
        SELECT doc_id, lang,
          array_distinct(split(graft_unaccent(graft_nfc(lower(text))), ' ')) AS toks
        FROM graft_sql_docs),
      refd AS (SELECT lang, min(doc_id) AS ref_id FROM t GROUP BY lang),
      refs AS (
        SELECT refd.lang, t.toks AS ref_toks
        FROM refd JOIN t ON t.doc_id = refd.ref_id)
      SELECT t.doc_id, t.lang,
        round(graft_jaccard(t.toks, refs.ref_toks), 6) AS sim_to_ref
      FROM t JOIN refs ON t.lang = refs.lang
      ORDER BY t.doc_id ASC NULLS FIRST""")
  }

  val queries: Map[String, Q] = Map(
    "sql_api_pipeline" -> sqlApiPipeline,
    "text_lm_score" -> textLmScore,
    "text_chunks" -> textChunks,
    "text_normalize" -> textNormalize,
    "text_tfidf" -> textTfidf,
    "text_bm25" -> textBm25,
    "text_split_assign" -> textSplitAssign,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_fingerprint" -> textFingerprint,
    "text_domain_cap" -> textDomainCap,
    "text_repetition" -> textRepetition
  )

  private val langidScoreCols: String =
    langMarkers.map { case (l, ms) =>
      val set = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS s_$l"
    }.mkString(",\n    ")

  private val langidPred: String = {
    val langs = langMarkers.map(_._1)
    val arms = langs.init.zipWithIndex.map { case (l, i) =>
      val beats = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $beats THEN '$l'"
    }.mkString(" ")
    s"CASE $arms ELSE '${langs.last}' END"
  }

  /** Oracle mirror of `bm25PerDoc` as a CTE chain ending in
    * `agg(doc_id, dl, s_<term>…)` — same log-free idf / literal-constant /
    * fixed-order-sum discipline as the Spark side (see textBm25's
    * scaladoc). Shared with HybridRetrieval's lexical lane. */
  private[operators] val bm25TotalSql: String = BM25_TERMS.map(t => s"s_$t").mkString(" + ")
  private[operators] val bm25CtesSql: String = {
    val terms = BM25_TERMS.map(t => s"'$t'").mkString(", ")
    val sCols = BM25_TERMS.map(t =>
      s"coalesce(sum(score) FILTER (WHERE term = '$t'), 0.0) AS s_$t").mkString(",\n       |    ")
    s"""t AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents),
       |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, t FROM t),
       |tok AS (SELECT doc_id, dl, unnest(t) AS term FROM d),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM tok
       |  WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n, sum(dl) AS sum_dl FROM d),
       |sc AS (
       |  SELECT doc_id, dl, tf.term,
       |    ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |    * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |        (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS score
       |  FROM tf JOIN df ON df.term = tf.term CROSS JOIN n),
       |agg AS (
       |  SELECT doc_id, min(dl) AS dl,
       |    $sCols
       |  FROM sc GROUP BY doc_id)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // nfc_normalize/strip_accents mirror graft_nfc/graft_unaccent (parity
    // pinned by text_normalize); list set ops mirror the jaccard kernel
    "sql_api_pipeline" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    list_distinct(string_split(strip_accents(nfc_normalize(lower(text))), ' ')) AS toks
        |  FROM documents),
        |refd AS (SELECT lang, min(doc_id) AS ref_id FROM t GROUP BY lang),
        |refs AS (
        |  SELECT refd.lang, t.toks AS ref_toks
        |  FROM refd JOIN t ON t.doc_id = refd.ref_id)
        |SELECT t.doc_id, t.lang,
        |  round(CAST(len(list_intersect(t.toks, refs.ref_toks)) AS DOUBLE)
        |        / len(list_distinct(list_concat(t.toks, refs.ref_toks))), 6) AS sim_to_ref
        |FROM t JOIN refs ON t.lang = refs.lang
        |ORDER BY t.doc_id ASC NULLS FIRST""".stripMargin,
    "text_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
        |  FROM t WHERE len(t) >= 2),
        |db AS (SELECT DISTINCT doc_id, bg FROM raw),
        |df AS (SELECT bg, count(*) AS df FROM db GROUP BY 1)
        |SELECT doc_id,
        |  count(*) AS n_bigrams,
        |  CAST(sum(df) AS BIGINT) AS sum_df,
        |  count(*) FILTER (WHERE df = 1) AS n_novel,
        |  CAST(sum(df) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_df
        |FROM db JOIN df USING (bg)
        |GROUP BY doc_id ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "text_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, unnest(range(0, (len(t)-1)//$STRIDE + 1)) AS i, t FROM t)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |  CAST(len(list_slice(t, i*$STRIDE + 1, i*$STRIDE + $CHUNK)) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(list_slice(t, i*$STRIDE + 1, i*$STRIDE + $CHUNK), ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id ASC NULLS FIRST, chunk_idx ASC NULLS FIRST""".stripMargin,
    // DuckDB's nfc_normalize/strip_accents vs the JDK Normalizer kernels:
    // both implement Unicode canonical (de)composition, so outputs agree
    "text_normalize" ->
      """WITH r AS (
        |  SELECT doc_id, substr(text, 1, 20) ||
        |    CASE doc_id % 4 WHEN 0 THEN 'e' || chr(769) WHEN 1 THEN 'u' || chr(776)
        |                    WHEN 2 THEN 'n' || chr(771) ELSE 'c' || chr(807) END AS raw
        |  FROM documents)
        |SELECT doc_id, length(raw) AS n_raw, nfc_normalize(raw) AS nfc,
        |  length(nfc_normalize(raw)) AS n_nfc, strip_accents(raw) AS folded
        |FROM r ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    // same log-free idf / literal-constant / fixed-order-sum discipline as
    // the Spark side (see textBm25's scaladoc) — every arithmetic token in
    // the same order, so the hash gate holds on raw doubles
    "text_bm25" -> {
      val roundCols = BM25_TERMS.map(t => s"round(s_$t, 6) AS s_$t").mkString(", ")
      s"""WITH $bm25CtesSql,
         |top AS (
         |  SELECT doc_id, dl, ${BM25_TERMS.map(t => s"s_$t").mkString(", ")},
         |    $bm25TotalSql AS bm25
         |  FROM agg ORDER BY bm25 DESC, doc_id ASC LIMIT $BM25_K)
         |SELECT doc_id, dl, $roundCols, round(bm25, 6) AS bm25
         |FROM top ORDER BY doc_id ASC NULLS FIRST""".stripMargin
    },
    "text_tfidf" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |r AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) DESC,
         |               term ASC) AS rk
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tf, df, score, CAST(rk AS INT) AS rk
         |FROM r WHERE rk <= $TFIDF_K
         |ORDER BY doc_id ASC NULLS FIRST, rk ASC NULLS FIRST""".stripMargin,
    "text_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('split:' || doc_id), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "text_quality" ->
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_space,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of'))) AS BIGINT) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS alpha_ratio,
        |  CASE WHEN n_chars > 0 THEN CAST(n_space AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS space_ratio,
        |  CASE WHEN n_toks > 0 THEN CAST(n_chars - n_space AS DOUBLE) / CAST(n_toks AS DOUBLE) END AS mean_tok_len,
        |  CASE WHEN n_toks > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_toks AS DOUBLE) END AS stopword_ratio
        |FROM c ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "text_langid" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    $langidScoreCols
         |  FROM documents)
         |SELECT doc_id, ${langMarkers.map(m => "s_" + m._1).mkString(", ")},
         |  $langidPred AS pred_lang, lang AS actual_lang
         |FROM scored ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "text_domain_cap" ->
      s"""WITH p AS (
         |  SELECT source, doc_id,
         |    CAST(('0x' || substr(md5('mix:' || doc_id), 1, 15)) AS BIGINT) AS pref
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY pref ASC, doc_id ASC) AS BIGINT) AS sample_rank
         |  FROM p)
         |SELECT source, doc_id, sample_rank FROM r WHERE sample_rank <= $DOMAIN_CAP
         |ORDER BY source ASC NULLS FIRST, doc_id ASC NULLS FIRST""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, t,
        |    CAST(len(t) AS BIGINT) AS n,
        |    CASE WHEN len(t) >= 2
        |      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |      ELSE [] END AS bg,
        |    CAST(list_max(list_transform(list_distinct(t), x -> len(list_filter(t, y -> y = x)))) AS BIGINT) AS top_n
        |  FROM t)
        |SELECT doc_id, n AS n_tokens,
        |  CASE WHEN n > 0 THEN CAST(n - len(list_distinct(t)) AS DOUBLE) / CAST(n AS DOUBLE) END AS dup_token_ratio,
        |  CASE WHEN len(bg) > 0 THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE) END AS dup_bigram_ratio,
        |  CASE WHEN n > 0 THEN CAST(top_n AS DOUBLE) / CAST(n AS DOUBLE) END AS top_token_ratio
        |FROM c ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5,
        |  CAST(('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS fp64
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
