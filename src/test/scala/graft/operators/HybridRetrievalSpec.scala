package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.{SparkEntry, SparkTestBase}

class HybridRetrievalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Full traversal incl. adaptive wrappers: the index lanes run on a
    * cloned session where AQE stays on, so the real operators sit under
    * AdaptiveSparkPlanExec / QueryStageExec / ReusedExchangeExec. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(nodes)
  }

  test("sim_hybrid_rrf: rrf is the fixed-order two-lane sum; both-lane docs outrank equal single-lane ranks") {
    val rows = SparkEntry.queries("sim_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= HybridRetrieval.OUT_K)
    rows.foreach { r =>
      val lex = Option(r.getAs[Any]("rank_lex")).map(_.toString.toInt)
      val vec = Option(r.getAs[Any]("rank_vec")).map(_.toString.toInt)
      assert(lex.isDefined || vec.isDefined, "a fused row must come from at least one lane")
      val expect = lex.map(k => 1.0 / (HybridRetrieval.RRF_K0 + k)).getOrElse(0.0) +
        vec.map(k => 1.0 / (HybridRetrieval.RRF_K0 + k)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6,
        s"rrf mismatch for ${r}")
    }
    // ordering: non-increasing rrf, doc_id tiebreak ascending
    val key = rows.map(r => (-r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(key.sameElements(key.sorted), "output must be ordered by rrf DESC, doc_id ASC")
  }

  test("sim_hybrid_rrf plan: lanes cut by TakeOrderedAndProject; corpus never sort-merge-joined; probe/stats sides broadcast") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ns = nodes(SparkEntry.queries("sim_hybrid_rrf")(spark, sf)
        .queryExecution.executedPlan)
      assert(ns.count(_.isInstanceOf[TakeOrderedAndProjectExec]) >= 2,
        "both lanes must top-k via per-partition heads, not a global sort")
      // Spark plans FULL OUTER only as a shuffle join (no broadcast variant)
      // — acceptable here because both inputs are the ≤ LANE_K lane frames.
      // Pin exactly that: every sort-merge join's subtree must contain both
      // lanes' TakeOrdered cuts, i.e. no corpus-proportional frame ever
      // reaches a shuffle join.
      val smjs = ns.filter(_.isInstanceOf[SortMergeJoinExec])
      assert(smjs.size <= 1, "only the constant-bounded fusion join may shuffle")
      smjs.foreach { j =>
        assert(nodes(j).count(_.isInstanceOf[TakeOrderedAndProjectExec]) >= 2,
          "the fusion join's inputs must both be top-k-bounded lane frames")
      }
      assert(ns.exists(_.isInstanceOf[BroadcastExchangeExec]),
        "the probe / query-stats sides ride broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sim_hybrid_multiprobe: probe set rides hash-waves; corpus codes never broadcast; per-probe OUT_K") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("sim_hybrid_multiprobe")(spark, sf)
      val rows = df.collect()
      // the shared lex lane fans out to every probe, so each probe fuses at
      // least LANE_K candidates and cuts to exactly OUT_K
      val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
      assert(byProbe.keySet == (0L until HybridRetrieval.MULTI_PROBES).toSet,
        "every probe id must produce a fused list")
      byProbe.values.foreach(g =>
        assert(g.length == HybridRetrieval.OUT_K, "per-probe cut must be OUT_K"))
      val ns = nodes(df.queryExecution.executedPlan)
      // wave structure: 8 probes through waveCap=4 split into the formula's
      // wave count — the union of that many independent searchWave subtrees
      val expectedWaves =
        ((2 * HybridRetrieval.MULTI_PROBES + HybridRetrieval.MULTI_WAVE - 1)
          / HybridRetrieval.MULTI_WAVE)
      val unions = ns.collect {
        case u: org.apache.spark.sql.execution.UnionExec => u.children.size }
      assert(unions.exists(_ >= expectedWaves),
        s"the vector lane must union >= $expectedWaves wave subtrees, saw $unions")
      // the LUT/probe-side broadcasts are probe-set-bounded; the CORPUS side
      // (the codes table) must always stream — a broadcast subtree that
      // scans the codes table would be the unbounded-at-100TB shape
      ns.collect { case b: BroadcastExchangeExec => b }.foreach { b =>
        val leaves = nodes(b).collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        assert(!leaves.exists(_.relation.location.rootPaths.exists(
            _.toString.contains("/codes/"))),
          "the corpus codes table must never sit under a BroadcastExchange")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
