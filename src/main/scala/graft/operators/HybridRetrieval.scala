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
  // the batched lane: 8 probes through a waveCap of 4 forces the search
  // into hash-waves, grading the LUT-bounding path inside the fused plan
  private[operators] val MULTI_PROBES = 8
  private[operators] val MULTI_WAVE = 4

  private def dotD(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** rank over an ALREADY top-k-limited (≤ LANE_K row) frame: the global
    * window is safe because its input is constant-bounded, never the
    * corpus. */
  private def rankOver(df: DataFrame, ord: Seq[Column], as: String): DataFrame =
    df.withColumn(as, row_number().over(Window.orderBy(ord: _*)))

  /** lexical lane: BM25 top-LANE_K for the fixed query-term set */
  private def lexLane(s: SparkSession, dir: String): DataFrame =
    rankOver(
      TextAnalysis.bm25PerDoc(s, dir)
        .select(col("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(LANE_K),
      Seq(col("bm25").desc, col("doc_id").asc), "rank_lex")
      .select(col("doc_id"), col("rank_lex"))

  /** RRF fusion of the two ≤ LANE_K ranked lists: full outer join,
    * fixed-order (lex + vec) sum, global top-OUT_K. */
  private def fuse(lex: DataFrame, vec: DataFrame): DataFrame = {
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

  private val hybridRrf: Q = (s, dir) => {
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
    fuse(lexLane(s, dir), vec)
  }

  /** The production variant the brute lane's Scaladoc promises: the vector
    * lane is `VectorIndex.search` over the PERSISTED IVFPQ artifact (train
    * on the arrived odd half, encode the corpus, probe with doc 0), so the
    * corpus-proportional vector work is one pruned candidate scan of the
    * probed cells' codes — not a full-corpus cosine pass. Fusion semantics
    * are byte-identical to `sim_hybrid_rrf`: the lane is cut at LANE_K by
    * the search's own rank, the RRF sum is the same fixed-order expression.
    * ADC ranks differ from exact-cosine ranks by construction (that is the
    * ANN trade) — the oracle replays the same quantized chain, so the grade
    * stays hash-exact. */
  private val hybridIndexed: Q = (s, dir) => {
    val (idx, corpus) = VectorIndexOps.freshIndex(s, dir)
    idx.train(corpus.filter(expr(VectorIndexOps.TRAIN_WHERE)))
    idx.encode(corpus, 0L)
    val probe = corpus.filter(col("vec_id") === PROBE_ID)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("norm").as("p_norm"))
    val vec = idx.search(probe, LANE_K)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("rank_vec"))
    // lex lane on the index's cloned session so the fused plan lives in one
    // session (freshIndex narrows shuffle partitions for the small batches)
    fuse(lexLane(corpus.sparkSession, dir), vec)
  }

  /** Batched retrieval: MULTI_PROBES probe documents fused in ONE plan.
    * The vector lane is `VectorIndex.search` over the whole probe set with
    * `waveCap` forced BELOW the probe count, so the per-probe ADC lookup
    * table provably rides the hash-wave bounding (each wave broadcasts
    * ≤ waveCap/2·epochs·M·K LUT rows — the probe-set-bounded contract —
    * and the wave union is exact because results are per-probe). The
    * lexical lane is probe-independent (the fixed query-term set), so it
    * computes ONCE and fans out to every probe's fusion — the
    * production shape for batch decontamination: N suspect documents
    * scored against one blocklist vocabulary in a single pass. */
  private val hybridMultiprobe: Q = (s, dir) => {
    val (idx, corpus) = VectorIndexOps.freshIndex(s, dir)
    idx.train(corpus.filter(expr(VectorIndexOps.TRAIN_WHERE)))
    idx.encode(corpus, 0L)
    val probes = corpus.filter(col("vec_id") < MULTI_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("norm").as("p_norm"))
    val vec = idx.search(probes, LANE_K, waveCap = MULTI_WAVE)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("rank_vec"))
    val lexp = probes.select(col("probe_id"))
      .crossJoin(lexLane(corpus.sparkSession, dir))
    val rrf =
      coalesce(lit(1.0) / (lit(RRF_K0).cast("double") + col("rank_lex").cast("double")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(RRF_K0).cast("double") + col("rank_vec").cast("double")), lit(0.0))
    val w = Window.partitionBy("probe_id").orderBy(col("rrf").desc, col("doc_id").asc)
    lexp.join(vec, Seq("probe_id", "doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= OUT_K)
      .select(col("probe_id"), col("doc_id"), col("rank_lex"), col("rank_vec"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy(col("probe_id").asc_nulls_first, col("rrf").desc,
        col("doc_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "sim_hybrid_rrf" -> hybridRrf,
    "sim_hybrid_indexed" -> hybridIndexed,
    "sim_hybrid_multiprobe" -> hybridMultiprobe)

  /** Oracle twin of the `VectorIndex.search(probe, LANE_K)` lane: the
    * single-epoch IVFPQ chain of `Similarity.ivfpqSql`, prefixed `vx*` so
    * it composes with the BM25 CTEs (which own `sc`/`df`/`agg`) in one
    * WITH, probe set narrowed to doc `PROBE_ID`, rank cut at LANE_K. */
  private def indexedLaneSql(probeWhere: String = s"vec_id = $PROBE_ID",
                             multi: Boolean = false): String = {
    import Similarity.{LLOYD_ROUNDS, PQ_ROUNDS, PQ_M, NPROBE}
    val aCols = (0 until PQ_M).map(i =>
      s"sum(lv) FILTER (WHERE l.m = $i) AS a_$i").mkString(",\n       |    ")
    val adc = (0 until PQ_M).map(i => s"a_$i").mkString(" + ")
    val tw = VectorIndexOps.TRAIN_WHERE
    s"""vecs AS (${Similarity.vecsSql}),
       |${Similarity.lloydCentsSql(LLOYD_ROUNDS, Some(tw), "vx")},
       |${Similarity.pqCentsSql(PQ_ROUNDS, Some(tw), "vx")},
       |vxasg AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT c.vec_id, k.cent_id,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_dot_product(c.v, k.c_v) / (c.norm * k.c_norm) DESC, k.cent_id ASC) AS arn
       |    FROM vecs c CROSS JOIN vxcents k) WHERE arn = 1),
       |vxprobes AS (
       |  SELECT vec_id AS probe_id, v AS p_v, norm AS p_norm
       |  FROM vecs WHERE $probeWhere),
       |vxpcells AS (
       |  SELECT probe_id, cent_id AS p_cent FROM (
       |    SELECT p.probe_id, k.cent_id,
       |      row_number() OVER (PARTITION BY p.probe_id
       |        ORDER BY list_dot_product(p.p_v, k.c_v) / (p.p_norm * k.c_norm) DESC,
       |                 k.cent_id ASC) AS cell_rank
       |    FROM vxprobes p CROSS JOIN vxcents k) WHERE cell_rank <= $NPROBE),
       |vxcodes AS (
       |  SELECT vec_id, norm, m, cent_id AS code FROM (
       |    SELECT s.vec_id, s.norm, s.m, k.cent_id,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY ${Similarity.d2Sql("s.x", "k.c_v")} ASC, k.cent_id ASC) AS rn
       |    FROM sub s JOIN vxpqcents k ON s.m = k.m) WHERE rn = 1),
       |vxpsub AS (SELECT vec_id AS probe_id, norm AS p_norm, m, x AS p_x FROM sub
       |           WHERE $probeWhere),
       |vxlut AS (SELECT p.probe_id, p.p_norm, p.m, k.cent_id,
       |            list_dot_product(p.p_x, k.c_v) AS lv
       |          FROM vxpsub p JOIN vxpqcents k ON p.m = k.m),
       |vxcand AS (
       |  SELECT c.vec_id, c.norm, c.m, c.code, pc.probe_id
       |  FROM vxcodes c JOIN vxasg a ON c.vec_id = a.vec_id
       |  JOIN vxpcells pc ON a.cent_id = pc.p_cent AND c.vec_id <> pc.probe_id),
       |vxsc AS (
       |  SELECT d.probe_id, d.vec_id, min(d.norm) AS norm, min(l.p_norm) AS p_norm,
       |    $aCols
       |  FROM vxcand d JOIN vxlut l ON d.m = l.m AND d.code = l.cent_id
       |    AND d.probe_id = l.probe_id
       |  GROUP BY 1, 2),
       |vxtop AS (
       |  SELECT probe_id, vec_id, adc_sim,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY adc_sim DESC, vec_id ASC) AS rank
       |  FROM (SELECT probe_id, vec_id, ($adc) / (norm * p_norm) AS adc_sim FROM vxsc)),
       |vr AS (SELECT ${if (multi) "probe_id, " else ""}vec_id AS doc_id, rank AS rank_vec
       |       FROM vxtop WHERE rank <= $LANE_K)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // the batched lane: same quantized chain over the 8-probe set (the
    // chain is per-probe throughout — PARTITION BY probe_id windows), the
    // shared lexical ranking fanned out per probe, per-probe RRF top-k
    "sim_hybrid_multiprobe" ->
      s"""WITH ${TextAnalysis.bm25CtesSql},
         |lex AS (
         |  SELECT doc_id, rank_lex FROM (
         |    SELECT doc_id,
         |      row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
         |    FROM (SELECT doc_id, ${TextAnalysis.bm25TotalSql} AS bm25 FROM agg))
         |  WHERE rank_lex <= $LANE_K),
         |${indexedLaneSql(s"vec_id < $MULTI_PROBES", multi = true)},
         |lexp AS (
         |  SELECT p.probe_id, l.doc_id, l.rank_lex
         |  FROM (SELECT DISTINCT probe_id FROM vxprobes) p CROSS JOIN lex l),
         |fused AS (
         |  SELECT coalesce(l.probe_id, v.probe_id) AS probe_id,
         |    coalesce(l.doc_id, v.doc_id) AS doc_id, l.rank_lex, v.rank_vec,
         |    coalesce(1.0 / (CAST($RRF_K0 AS DOUBLE) + CAST(l.rank_lex AS DOUBLE)), 0.0)
         |    + coalesce(1.0 / (CAST($RRF_K0 AS DOUBLE) + CAST(v.rank_vec AS DOUBLE)), 0.0) AS rrf
         |  FROM lexp l FULL OUTER JOIN vr v
         |    ON l.probe_id = v.probe_id AND l.doc_id = v.doc_id)
         |SELECT probe_id, doc_id, rank_lex, rank_vec, round(rrf, 6) AS rrf
         |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY rrf DESC, doc_id ASC) AS rn FROM fused)
         |WHERE rn <= $OUT_K
         |ORDER BY probe_id ASC NULLS FIRST, rrf DESC, doc_id ASC NULLS FIRST""".stripMargin,
    "sim_hybrid_indexed" ->
      s"""WITH ${TextAnalysis.bm25CtesSql},
         |lex AS (
         |  SELECT doc_id, rank_lex FROM (
         |    SELECT doc_id,
         |      row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
         |    FROM (SELECT doc_id, ${TextAnalysis.bm25TotalSql} AS bm25 FROM agg))
         |  WHERE rank_lex <= $LANE_K),
         |${indexedLaneSql()},
         |fused AS (
         |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.rank_lex, v.rank_vec,
         |    coalesce(1.0 / (CAST($RRF_K0 AS DOUBLE) + CAST(l.rank_lex AS DOUBLE)), 0.0)
         |    + coalesce(1.0 / (CAST($RRF_K0 AS DOUBLE) + CAST(v.rank_vec AS DOUBLE)), 0.0) AS rrf
         |  FROM lex l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id)
         |SELECT doc_id, rank_lex, rank_vec, round(rrf, 6) AS rrf
         |FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT $OUT_K)
         |ORDER BY rrf DESC, doc_id ASC NULLS FIRST""".stripMargin,
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
