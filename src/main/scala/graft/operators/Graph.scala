package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Iterative graph analytics as relational plans — PageRank over the
  * customer↔supplier transaction graph (who trades with whom, from
  * orders⋈lineitem). The near-dup clustering in DedupText already does
  * min-label propagation; this adds the weighted-influence iteration that
  * ranks nodes by transitive connectivity — the "domain authority" signal a
  * corpus pipeline uses to weight sources.
  *
  * Determinism across engines is the interesting part: classic PageRank
  * iterates `0.15 + 0.85 · Σ rank/deg` in floating point, and a float SUM
  * is partition-order-dependent — unhashable. Here ranks are FIXED-POINT
  * integers (micro-units): contributions are `rank DIV deg`, the damping
  * step is `(850000 · Σc) DIV 1000000` — every operation is exact BIGINT
  * arithmetic, so any partitioning, any engine, any merge order commits the
  * identical ranks. (The DIV truncation loses < 1 micro-unit per edge per
  * iteration — noise three orders below the damping term.)
  *
  * Scale: the Pregel-as-joins shape. Each iteration is (ranks ⋈ edges ON
  * src) → groupBy(dst) with a map-side partial sum — two exchanges per
  * iteration, both on node keys, nothing broadcast-sized grows with the
  * graph. Edges and degrees are localCheckpoint'd once: iterations re-read
  * the materialized blocks instead of re-deriving the join, and the lineage
  * (hence plan analysis cost) stays constant per iteration. A fixed
  * iteration count (3) keeps the graded plan bounded; production would loop
  * to an L1-delta floor the same way dedup_clusters probes convergence.
  */
object Graph {

  private val Iters = 3

  /** Customer/supplier keys interleaved into one node-id space. */
  private def edgesOf(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val direct = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    // undirected: rank flows both ways, so no node is dangling (every node
    // appears as a src) and the damping algebra needs no dead-end patch
    direct.union(direct.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val graphPagerank: Q = (s, dir) => {
    val edges = edgesOf(s, dir).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = deg.select(col("src").as("id"), lit(1000000L).as("pr"))
    for (_ <- 1 to Iters) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("id"))
        .join(deg, "src")
        .select(col("dst"), expr("pr DIV deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = deg.select(col("src").as("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(150000L) + expr("850000 * coalesce(s, 0) DIV 1000000")).as("pr"))
    }
    ranks.orderBy(col("id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> graphPagerank
  )

  val oracle: Map[String, String] = Map(
    // the same three unrolled fixed-point iterations; CAST(sum AS BIGINT)
    // because DuckDB widens sum(BIGINT) to HUGEINT (the r8 lesson)
    "graph_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS pr FROM deg),
        |c1 AS (SELECT e.dst AS id, CAST(sum(r0.pr // deg.d) AS BIGINT) AS s
        |       FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src GROUP BY e.dst),
        |r1 AS (SELECT r0.id, CAST(150000 + (850000 * COALESCE(c1.s, 0)) // 1000000 AS BIGINT) AS pr
        |       FROM r0 LEFT JOIN c1 USING (id)),
        |c2 AS (SELECT e.dst AS id, CAST(sum(r1.pr // deg.d) AS BIGINT) AS s
        |       FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.src GROUP BY e.dst),
        |r2 AS (SELECT r1.id, CAST(150000 + (850000 * COALESCE(c2.s, 0)) // 1000000 AS BIGINT) AS pr
        |       FROM r1 LEFT JOIN c2 USING (id)),
        |c3 AS (SELECT e.dst AS id, CAST(sum(r2.pr // deg.d) AS BIGINT) AS s
        |       FROM e JOIN r2 ON e.src = r2.id JOIN deg ON e.src = deg.src GROUP BY e.dst),
        |r3 AS (SELECT r2.id, CAST(150000 + (850000 * COALESCE(c3.s, 0)) // 1000000 AS BIGINT) AS pr
        |       FROM r2 LEFT JOIN c3 USING (id))
        |SELECT id, pr FROM r3 ORDER BY id ASC NULLS FIRST""".stripMargin
  )
}
