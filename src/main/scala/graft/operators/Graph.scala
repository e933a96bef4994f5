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

  /** Deterministic sparsifier: keep ~`pct`% of co-supply pairs by a content
    * hash of the pair — the same pair is kept or dropped on every engine and
    * every rerun, unlike Bernoulli `sample()`. */
  private def pairKept(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                       pct: Int): org.apache.spark.sql.Column =
    Hashing.h60(concat(lit("tri:"), a, lit(":"), b)) % 100 < pct

  private val SamplePct = 5

  /** Per-part enumeration bound: at most CapK suppliers per part enter the
    * pair self-join. The pair-level sparsifier alone bounds the OUTPUT but
    * not the ENUMERATION — the join still evaluates all C(s,2) pairs of a
    * hot part before the predicate fires, the classic skewed-self-join bomb
    * at 100×. Capping the per-part fanout BEFORE the join (deterministic
    * bottom-k by content hash, ties by supplier id — same engine-replayable
    * recipe as the sparsifier) drops that to C(CapK,2) per part. CapK=16
    * bites at test scale (mean co-supply fanout ~26, max 41 at sf0.01), so
    * the oracle mirror is genuinely exercised, not vacuously green.
    */
  private val CapK = 16

  // Exact triangle counting over the supplier co-supply graph (suppliers are
  // adjacent when they ship the same part) — the clustering-coefficient
  // substrate, and the classic test of a relational engine's self-join
  // discipline. The co-supply projection of a bipartite table is near-
  // complete at any scale (expected shared parts per supplier pair grows
  // with |parts|), so the graph is bounded twice, both as GRADED semantics
  // mirrored in the oracle (the DedupText.MAX_BUCKET contract, not silent
  // truncation): per-part fanout capped at CapK before the self-join (the
  // enumeration bound) and hash-SPARSIFIED at pair level (5%, the output
  // bound).
  //
  // Algorithm: degree-ordered orientation (Schank/node-iterator++). Every
  // edge points from its (deg, id)-smaller endpoint to the larger; each
  // triangle then has exactly ONE vertex with two out-edges, so
  // wedges ⋈ edges counts each triangle once, and out-degrees are O(√m) —
  // the wedge fan-out is bounded on any degree distribution (the skewed-hub
  // pathology of naive neighbor joins is oriented away). All three stages
  // are equi-joins on vertex keys; nothing is broadcast-sized by the graph.
  /** The co-supply edge build, pre-checkpoint — exposed so PlanShapeSpec can
    * assert the fanout cap compiles to a WindowGroupLimit BELOW the pair
    * self-join (the final query's plan starts at the checkpoint). */
  private[graft] def coSupplyEdges(s: org.apache.spark.sql.SparkSession,
                                   dir: String): DataFrame = {
    // one part-keyed exchange serves the (p, sv) dedup (partitioning on p
    // clusters (p, sv)), the fanout-cap window, AND the self-join on p — a
    // plain distinct() would hash on (p, sv) and force extra exchanges
    val ps = Tables(s, dir, "lineitem")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sv"))
      .repartition(col("p"))
      .dropDuplicates("p", "sv")
    // enumeration bound (see CapK): rank<=k compiles to WindowGroupLimit,
    // trimming each part to CapK rows before any pair is formed
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("p"))
      .orderBy(Hashing.h60(concat(lit("tricap:"), col("p"), lit(":"), col("sv"))).asc,
        col("sv").asc)
    val capped = ps.withColumn("rn", row_number().over(byHash))
      .filter(col("rn") <= CapK).drop("rn")
    capped.as("x").join(capped.as("y"),
        col("x.p") === col("y.p") && col("x.sv") < col("y.sv") &&
          pairKept(col("x.sv"), col("y.sv"), SamplePct))
      .select(col("x.sv").as("a"), col("y.sv").as("b"))
      .distinct()
  }

  private val graphTriangles: Q = (s, dir) => {
    // localCheckpoint (the pagerank convention): the per-part pair join is
    // the expensive stage (|parts| × fanout² candidate rows, each paying the
    // sparsifier hash) and e feeds FOUR consumers (deg, the orientation
    // join, n_edges, and transitively every wedge) — materialize it once
    // instead of recomputing the join per branch (measured 7.1 s → the join
    // ran ~3×)
    val e = coSupplyEdges(s, dir).localCheckpoint()
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient by (degree, id): struct comparison is lexicographic on both
    // engines, giving the same total order; each edge carries its dst's
    // order key so wedge pairs can be re-ordered WITHOUT another deg join,
    // keeping the closure a pure equi-join (an OR-of-directions condition
    // would degrade to a nested-loop join)
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    def ord(d: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      struct(d.as("d"), i.as("i"))
    val lo = ord(col("da"), col("a")) < ord(col("db"), col("b"))
    val oriented = withDeg.select(
      when(lo, col("a")).otherwise(col("b")).as("src"),
      when(lo, col("b")).otherwise(col("a")).as("dst"),
      when(lo, ord(col("db"), col("b"))).otherwise(ord(col("da"), col("a")))
        .as("dord"))
    // wedges at the low vertex: out-neighbor pairs ordered by (deg, id), so
    // the closing edge — which orientation points small→large — is exactly
    // (v → w), one equi-join
    val firstLo = col("e1.dord") < col("e2.dord")
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(
        when(firstLo, col("e1.dst")).otherwise(col("e2.dst")).as("v"),
        when(firstLo, col("e2.dst")).otherwise(col("e1.dst")).as("w"))
    val closed = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
    val tri = closed.agg(count(lit(1)).as("n_triangles"))
    val sizes = e.agg(count(lit(1)).as("n_edges"))
    val verts = deg.agg(count(lit(1)).as("n_vertices"), max(col("d")).as("max_deg"))
    verts.crossJoin(sizes).crossJoin(tri)
      .select(col("n_vertices"), col("n_edges"), col("max_deg"), col("n_triangles"))
  }

  /** Connected components over the same bounded co-supply graph, labeling
    * each supplier with the min supplier id reachable — the shared
    * large-star/small-star kernel (O(log n) rounds, see
    * DedupText.connectedComponents), applied to a second edge source: the
    * kernel is input-agnostic, so the near-dup clusterer and the supplier
    * graph grade the same iterative machinery against two different
    * declarative recursions.
    */
  private val graphComponents: Q = (s, dir) =>
    DedupText.connectedComponents(
        coSupplyEdges(s, dir).select(col("a").as("doc_a"), col("b").as("doc_b")))
      .select(col("node").as("supp"), col("component"))
      .orderBy(col("supp").asc_nulls_first)

  /** Bounded-hop BFS distances from a seed set — the reachability primitive
    * (blast-radius queries, influence frontiers, supply-chain contagion)
    * over the same bounded co-supply graph. Pregel-as-joins like pagerank:
    * each round joins the known-distance table to the edge list and
    * re-minimizes — two node-keyed exchanges per round, the frontier table
    * never exceeds |V| rows, and min() is order-insensitive so any
    * partitioning commits identical distances. A fixed K = 4 rounds bounds
    * the graded plan (the recursive oracle carries the same `d < 4` guard);
    * production loops to an empty frontier exactly as dedup_clusters does.
    */
  private val HopK = 4
  private val graphKhop: Q = (s, dir) => {
    val e = coSupplyEdges(s, dir).localCheckpoint()
    val ee = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .toDF("src", "dst")
    val seeds = ee.select(col("src").as("node")).distinct()
      .filter(col("node") % 50 === 1)
    var dist = seeds.withColumn("d", lit(0L))
    for (_ <- 1 to HopK) {
      val next = dist.join(ee, col("node") === col("src"))
        .select(col("dst").as("node"), (col("d") + 1).as("d"))
      dist = dist.union(next).groupBy("node").agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist.orderBy(col("node").asc_nulls_first)
  }

  /** Neighbor-list cap for graph_jaccard: the wedge enumeration per shared
    * neighbor is C(deg, 2), so an uncapped hub costs deg² pairs on one key —
    * the CapK lesson applied to adjacency lists. Bottom-NbK by content hash
    * (ties by neighbor id) is the same engine-replayable, oracle-mirrored
    * recipe; similarity is then DEFINED over the capped neighbor sets, the
    * declared-semantics contract (Neo4j GDS nodeSimilarity ships the same
    * topK/degree cutoff knob for the same reason). */
  private val NbK = 32
  private val JaccardTau = 0.2

  // ---- graph_jaccard: neighbor-set node similarity -------------------------
  //
  // "Which suppliers play the same structural role" — Jaccard over adjacency
  // sets, the link-prediction / entity-consolidation primitive (two nodes
  // with mostly-shared neighborhoods are interchangeable or colluding). On
  // the bounded co-supply graph: candidate pairs are nodes sharing ≥ 1
  // neighbor (the wedge join — never all-pairs), the intersection size IS
  // the wedge count per pair, and the union size is deg(a)+deg(b)−common —
  // integers end to end, one rounded division at the edge.
  //
  // Scale: adjacency build is one exchange on v (window cap rides it); the
  // wedge join is an equi-join on the shared-neighbor key with per-key
  // fan-out bounded at C(NbK, 2); the pair count is a map-side-partial
  // groupBy on (x, y); the two degree joins broadcast nothing (node-keyed
  // equi-joins). Nothing in the plan is proportional to pairs-of-all-nodes.
  /** The capped adjacency build, pre-checkpoint — exposed so PlanShapeSpec
    * can assert the NbK cap compiles to a WindowGroupLimit (the graded
    * query's plan starts at the checkpoint). */
  private[graft] def cappedAdjacency(edges: DataFrame): DataFrame = {
    val nb0 = edges.select(col("a").as("v"), col("b").as("n"))
      .union(edges.select(col("b").as("v"), col("a").as("n")))
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("v"))
      .orderBy(Hashing.h60(concat(lit("jac:"), col("v"), lit(":"), col("n"))).asc,
        col("n").asc)
    nb0.withColumn("rn", row_number().over(byHash))
      .filter(col("rn") <= NbK).drop("rn")
  }

  private val graphJaccard: Q = (s, dir) => {
    val e = coSupplyEdges(s, dir).localCheckpoint()
    val nb = cappedAdjacency(e).localCheckpoint()
    val deg = nb.groupBy(col("v")).agg(count(lit(1)).as("d"))
    val com = nb.as("p").join(nb.as("q"),
        col("p.n") === col("q.n") && col("p.v") < col("q.v"))
      .groupBy(col("p.v").as("x"), col("q.v").as("y"))
      .agg(count(lit(1)).as("c"))
    com
      .join(deg.select(col("v").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("v").as("y"), col("d").as("dy")), "y")
      .withColumn("jaccard",
        round(col("c").cast("double") / (col("dx") + col("dy") - col("c")), 6))
      .filter(col("jaccard") >= JaccardTau)
      .select(col("x").as("supp_a"), col("y").as("supp_b"),
        col("c").as("n_common"), col("jaccard"))
      .orderBy(col("supp_a").asc_nulls_first, col("supp_b").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> graphPagerank,
    "graph_triangles" -> graphTriangles,
    "graph_components" -> graphComponents,
    "graph_khop" -> graphKhop,
    "graph_jaccard" -> graphJaccard
  )

  /** Shared oracle CTE: the bounded co-supply edge set — CapK fanout bound
    * (deterministic bottom-k by the engine-replayable hash, ties by
    * supplier id) then the 5% pair sparsifier. */
  private def coSupplySql: String =
    s"""ps0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sv FROM lineitem),
       |ps AS (
       |  SELECT p, sv FROM (
       |    SELECT p, sv, row_number() OVER (PARTITION BY p
       |      ORDER BY CAST(('0x'||substr(md5('tricap:'||p||':'||sv),1,15)) AS BIGINT), sv) AS rn
       |    FROM ps0)
       |  WHERE rn <= $CapK),
       |e AS (
       |  SELECT DISTINCT x.sv AS a, y.sv AS b
       |  FROM ps x JOIN ps y ON x.p = y.p AND x.sv < y.sv
       |    AND CAST(('0x'||substr(md5('tri:'||x.sv||':'||y.sv),1,15)) AS BIGINT) % 100 < $SamplePct)""".stripMargin

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
        |SELECT id, pr FROM r3 ORDER BY id ASC NULLS FIRST""".stripMargin,
    // the same degree-ordered orientation; (a, b) tuple comparison is
    // lexicographic in DuckDB exactly like Spark struct comparison
    "graph_triangles" ->
      s"""WITH $coSupplySql,
         |deg AS (
         |  SELECT v, count(*) AS d
         |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
         |wd AS (
         |  SELECT e.a, e.b, dx.d AS da, dy.d AS db
         |  FROM e JOIN deg dx ON e.a = dx.v JOIN deg dy ON e.b = dy.v),
         |o AS (
         |  SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS src,
         |         CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS dst,
         |         CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS dd
         |  FROM wd),
         |wg AS (
         |  SELECT CASE WHEN (e1.dd, e1.dst) < (e2.dd, e2.dst) THEN e1.dst ELSE e2.dst END AS v,
         |         CASE WHEN (e1.dd, e1.dst) < (e2.dd, e2.dst) THEN e2.dst ELSE e1.dst END AS w
         |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst),
         |t AS (
         |  SELECT count(*) AS n_triangles FROM wg
         |  WHERE EXISTS (SELECT 1 FROM o WHERE o.src = wg.v AND o.dst = wg.w)),
         |ne AS (SELECT count(*) AS n_edges FROM e),
         |nv AS (SELECT count(*) AS n_vertices, max(d) AS max_deg FROM deg)
         |SELECT nv.n_vertices, ne.n_edges, nv.max_deg, t.n_triangles
         |FROM nv, ne, t""".stripMargin,
    // the same ≤ K-hop BFS as a depth-guarded recursive walk; UNION (not
    // UNION ALL) dedups (node, d) states so the recursion is bounded by
    // |V|·(K+1) rows, never by path count
    "graph_khop" ->
      s"""WITH RECURSIVE $coSupplySql,
         |ee AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
         |seeds AS (SELECT DISTINCT src AS node FROM ee WHERE src % 50 = 1),
         |walk(node, d) AS (
         |  SELECT node, CAST(0 AS BIGINT) FROM seeds
         |  UNION
         |  SELECT ee.dst, w.d + 1 FROM ee JOIN walk w ON ee.src = w.node
         |  WHERE w.d < $HopK)
         |SELECT node, CAST(min(d) AS BIGINT) AS d FROM walk GROUP BY node
         |ORDER BY node ASC NULLS FIRST""".stripMargin,
    // min-reachable labels as a recursive walk over the same bounded edges
    "graph_components" ->
      s"""WITH RECURSIVE $coSupplySql,
         |ee AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
         |walk(node, comp) AS (
         |  SELECT DISTINCT src, src FROM ee
         |  UNION
         |  SELECT ee.src, w.comp FROM ee JOIN walk w ON ee.dst = w.node)
         |SELECT node AS supp, min(comp) AS component FROM walk GROUP BY node
         |ORDER BY supp ASC NULLS FIRST""".stripMargin,
    // the same capped adjacency (bottom-NbK by hash), wedge-join common
    // counts, and integer union sizes — one rounded division at the edge
    "graph_jaccard" ->
      s"""WITH $coSupplySql,
         |nb0 AS (SELECT a AS v, b AS n FROM e UNION ALL SELECT b AS v, a AS n FROM e),
         |nb AS (
         |  SELECT v, n FROM (
         |    SELECT v, n, row_number() OVER (PARTITION BY v
         |      ORDER BY CAST(('0x'||substr(md5('jac:'||v||':'||n),1,15)) AS BIGINT), n) AS rn
         |    FROM nb0)
         |  WHERE rn <= $NbK),
         |deg AS (SELECT v, count(*) AS d FROM nb GROUP BY v),
         |com AS (
         |  SELECT p.v AS x, q.v AS y, count(*) AS c
         |  FROM nb p JOIN nb q ON p.n = q.n AND p.v < q.v
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT x, y, c,
         |    round(CAST(c AS DOUBLE) / (dx.d + dy.d - c), 6) AS jaccard
         |  FROM com JOIN deg dx ON com.x = dx.v JOIN deg dy ON com.y = dy.v)
         |SELECT x AS supp_a, y AS supp_b, CAST(c AS BIGINT) AS n_common, jaccard
         |FROM j WHERE jaccard >= $JaccardTau
         |ORDER BY supp_a ASC NULLS FIRST, supp_b ASC NULLS FIRST""".stripMargin
  )
}
