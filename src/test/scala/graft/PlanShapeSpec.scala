package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, UnionExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import graft.SparkTestBase

/** PLANS.md made executable: the scale-critical plan shapes asserted so a
  * future edit that drops a broadcast hint, adds a shuffle, or degrades a
  * bucket join to a cartesian product fails here instead of at 100 TB.
  * AQE is disabled per-assertion so the static plan shows exactly what
  * Catalyst required.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def staticPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)

  private def withStaticPlans[T](body: => T): T = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("pipeline_hotpath: both lookups broadcast; shuffles only for dedup + final order") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("pipeline_hotpath")(spark, sf)))
      assert(ns.count(_.isInstanceOf[BroadcastHashJoinExec]) == 2,
        "both lookup levels must be broadcast hash joins")
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 2, s"fact side must shuffle only for window dedup (+ oracle orderBy), got $shuffles")
    }
  }

  test("LSH candidate generation is an equi-join, never cartesian") {
    withStaticPlans {
      Seq("sim_lsh_bucket", "dedup_lsh_pairs", "dedup_ngram").foreach { q =>
        val ns = nodes(staticPlan(SparkEntry.queries(q)(spark, sf)))
        assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
          !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
          s"$q must join on the bucket/signature key, not all-pairs")
      }
    }
  }

  test("LSH bucket-cap window rides the candidate join's (band, sig) partitioning") {
    withStaticPlans {
      // the MAX_BUCKET guard must not buy its per-bucket count with an extra
      // exchange: the window partitions by the same keys the self-join hashes
      // on, so each band frame shuffles once for both. The guard window now
      // lives INSIDE the cached (doc_id, band, sig) build (the skinny-cache
      // restructure), so traverse into each distinct InMemoryRelation too.
      // AQE-wrap gotcha: a cache entry registered by an EARLIER suite with
      // AQE on (RegistrySpec builds every graded query that way) stores its
      // cachedPlan as an AdaptiveSparkPlanExec, whose `children` is EMPTY —
      // a plain p.children recursion is blind to the WindowExec inside it
      // and this test fails order-dependently. Unwrap via executedPlan.
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val seen = scala.collection.mutable.Set[SparkPlan]()
      def deep(p: SparkPlan): Seq[SparkPlan] = {
        val inner = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          // a materialized adaptive plan holds its subtrees behind
          // QueryStageExec wrappers — children is empty there too
          case q: QueryStageExec => Seq(q.plan)
          case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
            if seen.add(s.relation.cachedPlan) => Seq(s.relation.cachedPlan)
          case _ => Nil
        }
        p +: (p.children ++ inner).flatMap(deep)
      }
      val ns = deep(staticPlan(SparkEntry.queries("dedup_lsh_pairs")(spark, sf)))
      val windows = ns.count(_.isInstanceOf[WindowExec])
      assert(windows >= 1, "the bucket-size guard window must be present")
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 5,
        s"cap window must reuse the join partitioning (cache build: spread + " +
          s"band shuffle; candidate dedup + verify spread + orderBy), got $shuffles exchanges")
    }
  }

  test("sim_topk_brute broadcasts the probe side (corpus streams once)") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("sim_topk_brute")(spark, sf)))
      assert(ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "bounded probe set must be the broadcast side of a nested-loop join")
    }
  }

  test("ANN broadcast sides are bounded id lists, never a corpus-proportional rate") {
    withStaticPlans {
      // anchored on the pushed cap PREDICATE over vec_id (not a bare digit
      // string), with the caps interpolated from Similarity — renumbering a
      // cap or dropping its filter fails here, an unrelated constant cannot
      // satisfy it
      val capPredicate =
        s"vec_id#\\d+L?\\s*<\\s*(${graft.operators.Similarity.PROBE_CAP}|${graft.operators.Similarity.CENT_CAP})".r
      Seq("sim_topk_brute", "sim_knn_label", "sim_ivf_topk", "sim_pq_topk").foreach { q =>
        val ns = nodes(staticPlan(SparkEntry.queries(q)(spark, sf)))
        val bx = ns.collect { case b: BroadcastExchangeExec => b }
        assert(bx.nonEmpty, s"$q must broadcast its probe/codebook side")
        bx.foreach { b =>
          val sub = b.toString
          // the Lloyd-trained IVF/PQ codebooks broadcast as materialized
          // localCheckpoint scans (lineage truncated per round) — their bound
          // is PHYSICAL, asserted by the row counts below, not a predicate
          val checkpointedCodebook = (q == "sim_ivf_topk" || q == "sim_pq_topk") &&
            nodes(b).exists(_.getClass.getSimpleName.startsWith("RDDScan"))
          assert(capPredicate.findFirstIn(sub).isDefined || checkpointedCodebook,
            s"$q: every broadcast side must be bounded by the constant id-cap " +
              s"predicate (vec_id < PROBE_CAP/CENT_CAP) or be the materialized " +
              s"codebook, got:\n$sub")
        }
      }
      // the physical bound behind the checkpointed-codebook exemption: the
      // trained codebook can never exceed the seed's constant cap (Lloyd
      // only drops cells), independent of corpus size
      assert(graft.operators.Similarity.trainedCodebook(spark, sf).count() <=
        graft.operators.Similarity.CENT_CAP / 50 + 1,
        "trained codebook must stay a constant-size side input")
      // same bound for the PQ codebooks: M subspaces × ≤(SEED_CAP/50 + 1)
      // codewords each, regardless of corpus size
      assert(graft.operators.Similarity.pqCodebooks(spark, sf).count() <=
        graft.operators.Similarity.PQ_M * (graft.operators.Similarity.PQ_SEED_CAP / 50 + 1),
        "PQ codebooks must stay a constant-size side input")
    }
  }

  test("sim_index_search: only stored codebooks/probe LUTs broadcast; codes table streams") {
    withStaticPlans {
      import org.apache.spark.sql.functions.{col, expr}
      val all = graft.operators.Similarity.vecs(spark, sf)
      val work = graft.Scratch.dir("graft-vidx-plan")
      val idx = new graft.operators.VectorIndex(spark, work.toString)
      idx.train(all.filter(expr("vec_id % 2 = 1")))
      idx.encode(all, 0L)
      val probes = all.filter(graft.operators.Similarity.isProbe)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
          col("norm").as("p_norm"))
      val ns = nodes(staticPlan(idx.search(probes, 3)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        "candidate generation must ride the stored cell ids, never all-pairs")
      val bx = ns.collect { case b: BroadcastExchangeExec => b }
      assert(bx.nonEmpty, "codebooks and probe LUTs must broadcast")
      // the ONLY corpus-proportional artifact is the codes table: it must
      // stream through the join, never ship as a broadcast side
      bx.foreach(b => assert(!b.toString.contains("/codes"),
        s"codes table must never be broadcast, got:\n$b"))
      assert(ns.exists(n => n.getClass.getSimpleName.startsWith("FileSourceScan") &&
        n.toString.contains("/codes")),
        "search must read the persisted codes table")
      // physical bounds behind the broadcasts: both stored codebooks are
      // constant-size regardless of how many vectors were encoded
      assert(idx.search(probes, 3).count() > 0)
      // probe-wave bound: above the wave cap the plan splits into per-wave
      // subtrees, and EVERY wave's broadcasts still exclude the codes table
      // — the LUT broadcast stays ≈ waveCap/2 · epochs · M · K rows per
      // wave no matter how many probes arrive
      val waved = nodes(staticPlan(idx.search(probes, 3, waveCap = 2)))
      assert(waved.count(_.isInstanceOf[UnionExec]) >= 1,
        "an over-cap probe set must union per-wave search subtrees")
      waved.collect { case b: BroadcastExchangeExec => b }
        .foreach(b => assert(!b.toString.contains("/codes"),
          s"codes table must never be broadcast in any wave, got:\n$b"))
    }
  }

  test("sim_hybrid_indexed: vector lane rides the pruned codes join, never a corpus cosine scan") {
    withStaticPlans {
      // the query runs on a cloned session (freshIndex), which keeps its own
      // AQE default — traverse through the adaptive wrapper to the real tree
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def deep(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: deep(a.executedPlan)
        case _ => p +: p.children.flatMap(deep)
      }
      val ns = deep(staticPlan(
        graft.operators.HybridRetrieval.queries("sim_hybrid_indexed")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        "the indexed lane must never go all-pairs")
      // the probed-cell candidate join reads the persisted codes table...
      assert(ns.exists(n => n.getClass.getSimpleName.startsWith("FileSourceScan") &&
        n.toString.contains("/codes")),
        "the vector lane must read the persisted codes table")
      // ...streamed, never broadcast (it is the corpus-proportional side)
      ns.collect { case b: BroadcastExchangeExec => b }
        .foreach(b => assert(!b.toString.contains("/codes"),
          s"codes table must never be broadcast, got:\n$b"))
      // and the ONLY embeddings reads are probe-row lookups with the point
      // predicate pushed to the scan — a brute lane would scan the whole
      // corpus for the cosine pass
      val embScans = ns.filter(n =>
        n.getClass.getSimpleName.startsWith("FileSourceScan") &&
          n.toString.contains("embeddings"))
      assert(embScans.nonEmpty, "the probe row comes from the embeddings table")
      embScans.foreach(s => assert(
        s.toString.contains("PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,0)"),
        s"embeddings scans must be probe point-lookups, got:\n$s"))
    }
  }

  test("sim_ivf_topk assignment aggregates map-side; no window over n×k scored rows") {
    withStaticPlans {
      val ns = nodes(staticPlan(graft.operators.Similarity.ivfAssigned(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[WindowExec]),
        "nearest-centroid argmax must be an aggregate, not a window sort of every scored row")
      val aggs = ns.count(_.getClass.getSimpleName.contains("AggregateExec"))
      assert(aggs >= 2, s"expect partial + final aggregate (n×k collapses map-side), got $aggs")
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 1, s"assignment moves n pre-reduced rows through ≤1 exchange, got $shuffles")
    }
  }

  test("LevenshteinBandRule: threshold filters gain exactly one implied length-band guard") {
    import org.apache.spark.sql.catalyst.expressions.Abs
    import org.apache.spark.sql.functions.{col, concat, levenshtein, lit, substring}
    // parquet-backed, NOT a LocalRelation: the optimizer folds filters over
    // local relations away before the user-rules batch ever sees them
    val base = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name").as("a"),
        concat(substring(col("c_name"), 1, 17), lit("XY")).as("b")) // length+1 ⇒ band-prunable
    val df = base.filter(levenshtein(col("a"), col("b")) <= 1)

    def bandGuards(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      def absIn(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
        var n = 0
        e.foreach { case _: Abs => n += 1; case _ => () }
        n
      }
      plan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => absIn(f.condition)
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.condition.map(absIn).getOrElse(0)
      }.sum
    }

    // the guard is added once (idempotent under the fixed-point optimizer)
    assert(bandGuards(df.queryExecution.optimizedPlan) == 1,
      "exactly one abs(length-length) band guard must be derived from the threshold")
    // and it is purely additive: the filter keeps exactly the rows whose
    // true distance passes (b = a with the last char replaced by "XY":
    // distance 2, so everything is filtered — by the band check alone)
    assert(df.count() == 0)
    assert(base.filter(levenshtein(col("a"), col("b")) <= 2).count() == base.count(),
      "the guard must not reject rows the real distance admits")

    // integration: the blocked fuzzy join's distance filter gets the guard
    // too — predicate inlining has run by the time the user batch fires
    val er = SparkEntry.queries("fuzzy_name_match")(spark, sf)
    assert(bandGuards(er.queryExecution.optimizedPlan) >= 1,
      "the graded fuzzy join must carry the band short-circuit")
  }

  test("JaccardBandRule: threshold predicates gain the implied size-band guards") {
    import org.apache.spark.sql.catalyst.expressions.Size
    import org.apache.spark.sql.functions.{array_distinct, col, split}
    // sa deliberately keeps DUPLICATE tokens: the kernel dedupes (Jaccard is
    // a set measure), so a guard on raw array lengths would wrongly reject
    // rows here — the band must be derived from distinct-element sizes
    val base = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        split(col("text"), " ").as("sa"),
        array_distinct(split(col("text"), "e")).as("sb"))
    val df = base.filter(
      graft.functions.JaccardExpression.jaccard(col("sa"), col("sb")) >= 0.5)

    def sizeGuards(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      def sizesIn(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
        var n = 0
        e.foreach { case _: Size => n += 1; case _ => () }
        n
      }
      plan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => sizesIn(f.condition)
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.condition.map(sizesIn).getOrElse(0)
      }.sum
    }

    // two guards (each reading two sizes), added once — idempotent under the
    // fixed-point optimizer
    assert(sizeGuards(df.queryExecution.optimizedPlan) == 4,
      "both implied size-band guards must be derived exactly once")
    // additive: guarded result == unguarded semantics (recompute via the
    // composition the kernel is pinned to)
    import org.apache.spark.sql.functions.{array_intersect, array_union, size}
    val reference = base.filter(
      size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))) >= 0.5)
    assert(df.count() == reference.count(),
      "the size band must not change which rows pass the threshold")

    // integration: the LSH verify filter carries the guard in the graded plan
    val lsh = SparkEntry.queries("dedup_lsh_pairs")(spark, sf)
    assert(sizeGuards(lsh.queryExecution.optimizedPlan) >= 2,
      "the graded LSH verify join must carry the size short-circuit")
  }

  test("join_bloom_prefilter probes the bloom AT THE SCAN, before the semi-join") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("join_bloom_prefilter")(spark, sf)))
      // the might_contain filter must sit on the probe scan side, i.e. there
      // is a Filter whose condition mentions might_contain and whose subtree
      // contains NO join — the thinning happens before any exchange/join
      val bloomFilters = ns.collect {
        case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f
      }
      assert(bloomFilters.nonEmpty, "the bloom probe filter must exist in the plan")
      bloomFilters.foreach { f =>
        val below = nodes(f)
        assert(!below.exists(n => n.isInstanceOf[BroadcastHashJoinExec] ||
          n.isInstanceOf[CartesianProductExec] || n.isInstanceOf[BroadcastNestedLoopJoinExec]),
          "bloom thinning must happen below the join, directly over the scan")
      }
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        "the scalar-subquery bloom must not appear as a cartesian side")
    }
  }

  test("range_join is a bucketed equi-join, never cartesian/BNLJ") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("range_join")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "the interval predicate must ride a (key, bucket) equi-join as a residual filter")
    }
  }

  test("asof_join shuffles once on the key (union + ordered window, no row blowup)") {
    withStaticPlans {
      // the tolerance variant must pay NOTHING extra: its TTL bound rides
      // the same ignore-null window as the value
      Seq("asof_join", "asof_tolerance").foreach { q =>
        val ns = nodes(staticPlan(SparkEntry.queries(q)(spark, sf)))
        assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
          !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
          s"$q must not be a non-equi join")
        val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
        assert(shuffles <= 2, s"$q: expect key-window shuffle (+ oracle orderBy), got $shuffles")
        assert(ns.count(_.isInstanceOf[WindowExec]) == 1,
          s"$q: both carried columns must share ONE window operator")
      }
    }
  }

  test("filter_scan pushes its predicate into the parquet scan") {
    val plan = staticPlan(SparkEntry.queries("filter_scan")(spark, sf)).toString
    assert(plan.contains("PushedFilters") && plan.contains("c_nationkey"),
      s"predicate must reach the scan:\n$plan")
  }

  test("sample_stratified trims to k per stratum BEFORE the exchange (partial WindowGroupLimit)") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("sample_stratified")(spark, sf)))
      val limits = ns.filter(_.getClass.getSimpleName == "WindowGroupLimitExec")
      assert(limits.size >= 2,
        s"rank<=k must compile to partial+final WindowGroupLimit so the shuffle " +
          s"carries O(tasks × strata × k) rows, got ${limits.size} group-limit nodes")
      // the partial one must sit BELOW the shuffle (map-side trim)
      val shuffleSubtrees = ns.collect { case e: ShuffleExchangeExec => nodes(e.child) }
      assert(shuffleSubtrees.exists(_.exists(_.getClass.getSimpleName == "WindowGroupLimitExec")),
        "a WindowGroupLimit must appear below the exchange (map-side)")
    }
  }

  test("q5_region_revenue aggregates partially before its single group-key shuffle") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("q5_region_revenue")(spark, sf)))
      val hashAggs = ns.count(_.getClass.getSimpleName == "HashAggregateExec")
      assert(hashAggs >= 2, "expect partial + final HashAggregate (map-side combine)")
    }
  }

  test("scd2_build chains all three windows over ONE key exchange") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("scd2_build")(spark, sf)))
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 2,
        s"lag/lead/row_number share (key, order) — expect the key exchange " +
          s"(+ oracle orderBy) only, got $shuffles")
    }
  }

  test("scd2_point_in_time stays a union+window composition — no non-equi join") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("scd2_point_in_time")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "point-in-time resolution must not fall back to a non-equi join")
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 4,
        s"era window + as-of window + oracle orderBy bound the exchanges, got $shuffles")
    }
  }

  test("interval_merge: island assignment is one key exchange, groupBy reuses it") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("interval_merge")(spark, sf)))
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 2,
        s"running-max + running-sum + (key, island) groupBy must ride one " +
          s"key exchange (+ oracle orderBy), got $shuffles")
    }
  }

  test("interval_concurrency: sweep line shuffles the 2n boundary rows once") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("interval_concurrency")(spark, sf)))
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 3,
        s"boundary window + dim groupBy + oracle orderBy bound the exchanges, got $shuffles")
    }
  }

  test("dq_check: every rule partial-aggregates; FK probes never go non-equi") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("dq_check")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        "no rule may expand to a cartesian product")
      val hashAggs = ns.count(_.getClass.getSimpleName == "HashAggregateExec")
      assert(hashAggs >= 10,
        s"each rule must map-side combine to one row before its exchange, got $hashAggs aggregates")
    }
  }

  test("dedup_admit_incremental: every candidate join is an equi-join on (band, sig)") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("dedup_admit_incremental")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "admission must probe the index by bucket key, never all-pairs")
    }
  }

  test("text_lm_score joins the df model on the bigram key — distributed, never collected") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("text_lm_score")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "doc-bigrams ⋈ df must be an equi-join on the bigram")
    }
  }

  test("graph_triangles: wedge and closure joins stay equi-joins (BNLJ only for 1-row summaries)") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("graph_triangles")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        "no graph-shaped join may go cartesian")
      // the only nested-loop joins allowed are the two cross-combines of
      // single-row scalar aggregates (n_vertices × n_edges × n_triangles)
      assert(ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 2,
        "wedge/closure must join on vertex keys — an OR-of-directions " +
          "closure predicate degrades to a nested loop")
    }
  }

  test("partition_prune_scan: the day predicate prunes at directory-listing time") {
    withStaticPlans {
      val plan = staticPlan(SparkEntry.queries("partition_prune_scan")(spark, sf)).toString
      assert(plan.contains("PartitionFilters") && plan.contains("day"),
        s"the day range must become PartitionFilters, not a row filter:\n$plan")
      // and it must NOT degrade to a post-scan Filter on the partition column
      assert(!plan.contains("PartitionFilters: []"),
        s"partition filters must be non-empty:\n$plan")
    }
  }

  test("bucketed_join: both sides consume the bucket layout — no exchange below the join") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("bucketed_join")(spark, sf)))
      val smjs = ns.collect { case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smjs.size == 1, "the merge hint must pin a sort-merge join")
      val below = smjs.head.children.flatMap(nodes)
      assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "bucketed sides must join WITHOUT shuffling")
      // modern Spark ignores the written sortBy order at scan time
      // (SPARK-28346), so a LOCAL per-bucket sort remains — cheap and
      // shuffle-free; the exchange elision above is the scale win
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 1, s"only the final orderBy may exchange, got $shuffles")
    }
  }

  test("join_skew_adaptive: the final adaptive plan carries the skew-split marker") {
    // runtime property, not a static shape: AQE only marks the join after
    // the map stage exposes real partition sizes, so execute then inspect
    val df = SparkEntry.queries("join_skew_adaptive")(spark, sf)
    assert(df.collect().nonEmpty)
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew="),
      s"the hot partition must be split by OptimizeSkewedJoin:\n$finalPlan")
  }

  test("graph_triangles: per-part fanout cap trims BELOW the pair self-join") {
    withStaticPlans {
      // the pair-level sparsifier bounds the output, not the enumeration — a
      // hot part must be trimmed to CapK rows BEFORE any C(s,2) pair forms
      val ns = nodes(staticPlan(graft.operators.Graph.coSupplyEdges(spark, sf)))
      val joins = ns.filter(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec] ||
          n.isInstanceOf[BroadcastHashJoinExec])
      assert(joins.nonEmpty, "the pair build must be an equi-join on p")
      assert(joins.forall(j => j.children.forall(c =>
          nodes(c).exists(_.getClass.getSimpleName == "WindowGroupLimitExec"))),
        "rank<=CapK must compile to a WindowGroupLimit on BOTH join inputs " +
          "(the enumeration bound, below the join)")
    }
  }

  test("graph_jaccard: capped adjacency, wedge join stays an equi-join") {
    withStaticPlans {
      // the NbK neighbor-list cap must compile to a WindowGroupLimit in the
      // adjacency build (the enumeration bound: C(NbK,2) wedge fan-out per
      // shared neighbor, never deg²)
      val e = graft.operators.Graph.coSupplyEdges(spark, sf).localCheckpoint()
      val adj = nodes(staticPlan(graft.operators.Graph.cappedAdjacency(e)))
      assert(adj.exists(_.getClass.getSimpleName == "WindowGroupLimitExec"),
        "rank<=NbK must compile to a WindowGroupLimit (map-side trim)")
      // the graded query's joins (wedge self-join + two degree joins) must
      // all be equi-joins — a theta/BNLJ here is the deg² bomb
      val ns = nodes(staticPlan(SparkEntry.queries("graph_jaccard")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "wedge and degree joins must stay equi-joins")
    }
  }

  test("dedup_spans: inverted-index equi-join + one doc-keyed window, no similarity join") {
    withStaticPlans {
      val ns = nodes(staticPlan(SparkEntry.queries("dedup_spans")(spark, sf)))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "positions ⋈ shared-grams must be an equi-join on the gram key")
      // run reconstruction is ONE window over doc-keyed positions, and the
      // two stacked groupBys ride its partitioning — extra exchanges past
      // (doc spread, gram index build, gram join side, window, orderBy)
      // mean a lost partitioning reuse
      assert(ns.count(_.isInstanceOf[WindowExec]) == 1, "one gaps-and-islands window")
      val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 6, s"expected ≤6 exchanges, got $shuffles")
    }
  }
}
