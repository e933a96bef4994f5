package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q

/** Hybrid lexical + vector retrieval fused by Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher, SIGIR'09) — the standard public recipe for
  * combining a BM25 ranking with an embedding ANN ranking without score
  * calibration: rrf(d) = Σ_lanes 1/(k0 + rank_lane(d)). In an LLM data
  * pipeline this is the retrieval step behind semantic decontamination
  * review and eval-set curation: lexical overlap catches verbatim leaks,
  * the vector lane catches paraphrase, and RRF makes the union robust to
  * either lane's score scale.
  *
  * The corpus convention is one embedding per document (`vec_id ≡ doc_id`,
  * the embeddings/documents contract of this testbed — both tables share
  * the 0..N-1 id domain).
  *
  * Scale shape: each lane is the already-audited bounded pattern — BM25 is
  * three key-partitioned aggregates with only the fixed query-term side
  * broadcast (TextAnalysis.bm25PerDoc); the vector lane broadcasts ONE
  * probe row against the streamed corpus. Each lane cuts to its top
  * LANE_K via TakeOrderedAndProject (per-partition heads, no global
  * sort); ranks are then assigned by a window over ≤ LANE_K rows (a
  * single-partition window over a constant-bounded frame, not the
  * corpus). The fusion join is ≤ LANE_K × 2 rows. At 100 TB the only
  * corpus-proportional work is the two scans the lanes already pay; a
  * production variant swaps the brute vector lane for
  * VectorIndex.search with identical fusion semantics.
  *
  * FP discipline: 1/(k0 + rank) is one IEEE divide on an integer-valued
  * double — bit-equal across engines; the two-lane sum is written in
  * fixed syntactic order (lex + vec) on both sides, so the raw-double
  * sort key and the hash gate agree.
  */
object HybridRetrieval {

  private[operators] val LANE_K = 50 // per-lane candidate depth
  private[operators] val RRF_K0 = 60 // the SIGIR'09 default damping
  private[operators] val OUT_K = 20  // fused result size
  private[operators] val PROBE_ID = 0L

  private def dotD(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** rank over an ALREADY top-k-limited (≤ LANE_K row) frame: the global
    * window is safe because its input is constant-bounded, never the
    * corpus. */
  private def rankOver(df: DataFrame, ord: Seq[Column], as: String): DataFrame =
    df.withColumn(as, row_number().over(Window.orderBy(ord: _*)))

  private val hybridRrf: Q = (s, dir) => {
    // lexical lane: BM25 top-LANE_K for the fixed query-term set
    val lex = rankOver(
      TextAnalysis.bm25PerDoc(s, dir)
        .select(col("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(LANE_K),
      Seq(col("bm25").desc, col("doc_id").asc), "rank_lex")
      .select(col("doc_id"), col("rank_lex"))
    // vector lane: cosine top-LANE_K from the probe embedding
    val corpus = Similarity.vecs(s, dir)
    val probe = corpus.filter(col("vec_id") === PROBE_ID)
      .select(col("embedding").as("p_emb"), col("norm").as("p_norm"))
    val vec = rankOver(
      corpus.filter(col("vec_id") =!= PROBE_ID)
        .crossJoin(broadcast(probe))
        .withColumn("cos_sim",
          dotD(col("embedding"), col("p_emb")) / (col("norm") * col("p_norm")))
        .select(col("vec_id").as("doc_id"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("doc_id").asc).limit(LANE_K),
      Seq(col("cos_sim").desc, col("doc_id").asc), "rank_vec")
      .select(col("doc_id"), col("rank_vec"))
    // RRF fusion: full outer over the two ≤ LANE_K lists, fixed-order sum
    val rrf =
      coalesce(lit(1.0) / (lit(RRF_K0).cast("double") + col("rank_lex").cast("double")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(RRF_K0).cast("double") + col("rank_vec").cast("double")), lit(0.0))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(OUT_K)
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map("sim_hybrid_rrf" -> hybridRrf)

  val oracle: Map[String, String] = Map(
    "sim_hybrid_rrf" ->
      s"""WITH ${TextAnalysis.bm25CtesSql},
         |lex AS (
         |  SELECT doc_id, rank_lex FROM (
         |    SELECT doc_id,
         |      row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
         |    FROM (SELECT doc_id, ${TextAnalysis.bm25TotalSql} AS bm25 FROM agg))
         |  WHERE rank_lex <= $LANE_K),
         |vecs AS (${Similarity.vecsSql}),
         |pv AS (SELECT v AS p_v, norm AS p_norm FROM vecs WHERE vec_id = $PROBE_ID),
         |vr AS (
         |  SELECT doc_id, rank_vec FROM (
         |    SELECT c.vec_id AS doc_id,
         |      row_number() OVER (
         |        ORDER BY list_dot_product(c.v, p.p_v) / (c.norm * p.p_norm) DESC,
         |                 c.vec_id ASC) AS rank_vec
         |    FROM vecs c CROSS JOIN pv p WHERE c.vec_id <> $PROBE_ID)
         |  WHERE rank_vec <= $LANE_K),
         |fused AS (
         |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.rank_lex, v.rank_vec,
         |    coalesce(1.0 / (CAST($RRF_K0 AS DOUBLE) + CAST(l.rank_lex AS DOUBLE)), 0.0)
         |    + coalesce(1.0 / (CAST($RRF_K0 AS DOUBLE) + CAST(v.rank_vec AS DOUBLE)), 0.0) AS rrf
         |  FROM lex l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id)
         |SELECT doc_id, rank_lex, rank_vec, round(rrf, 6) AS rrf
         |FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT $OUT_K)
         |ORDER BY rrf DESC, doc_id ASC NULLS FIRST""".stripMargin)
}
