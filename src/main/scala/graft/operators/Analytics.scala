package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Micro, Q, Tables}

/** Analytics extension surface (SURVEY.md §7 phase 5; BASELINE.json north star).
  *
  * The reference has no numeric aggregates (§2.4) — this is the extension layer
  * a 100 TB analytics engine needs: grouped/rollup aggregation, event-time
  * windows (tumbling / sliding / session, batch-expressible and identical in
  * semantics to their Structured Streaming forms), JSON prop extraction, and
  * join-heavy reporting queries.
  *
  * Float determinism: every SUM over doubles goes through the exact
  * micro-unit accumulator ([[graft.Micro]] — floor(x·10⁶) summed in
  * DECIMAL(38,0), cast back to DOUBLE at the end): partial aggregation
  * order can never change the result, and neither engine has a
  * double→decimal conversion boundary to disagree on (the DECIMAL(25,6)
  * idiom this file used through round 17 carried exactly that window —
  * the sf10 gate caught it on agg_cube/agg_grouping_sets; rationale at
  * [[graft.Micro]]).
  */
object Analytics {

  private def ord(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  private def dsumMicro(c: org.apache.spark.sql.Column) = Micro.dsumMicro(c)

  // TPC-H Q1 shape: scan-heavy grouped aggregation with derived measures.
  private val q1Agg: Q = (s, dir) =>
    ord(
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsumMicro(col("l_quantity")).as("sum_qty"),
          dsumMicro(col("l_extendedprice")).as("sum_base_price"),
          dsumMicro(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (dsumMicro(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")),
      "l_returnflag", "l_linestatus")

  // Multi-measure grouped stats over the event stream.
  private val aggStats: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          dsumMicro(col("value")).as("sum_v")),
      "event_type")

  // Sketch aggregate with a real oracle gate: the HLL++ estimate itself is not
  // reproducible in DuckDB (different sketch), but the estimate is deterministic
  // on Spark (register merge is a commutative max — partitioning can't change
  // it), so we emit the exact distinct count plus a boolean asserting the
  // sketch landed within 3× its configured 0.05 rsd (0.15 relative error).
  // The oracle asserts the exact count and `true` — a sketch drifting out of
  // tolerance fails the hash check.
  // Why 3×: rsd is a STANDARD deviation, so gating at 1× is a coin toss per
  // cardinality regime (it passed at sf0.01–0.1 and failed at the 10× scale
  // gate's cardinalities); 3σ is the guarantee-backed bound that holds across
  // scales.
  private val approxDistinct: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id"), 0.05).as("approx_users"))
        .select(
          col("event_type"), col("n_users"),
          (abs(col("approx_users") - col("n_users")).cast("double") <=
            col("n_users").cast("double") * 0.15).as("approx_ok")),
      "event_type")

  // Tumbling event-time window via Spark's native window() (streaming-identical
  // semantics); oracle reproduces the epoch-aligned bucketing arithmetically.
  private val windowAggTime: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsumMicro(col("value")).as("sum_v"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_v")),
      "ws", "event_type")

  // Sliding window (1 h span, 30 min slide): each event lands in two windows.
  private val windowSliding: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n")),
      "ws", "event_type")

  // Session window (30 min gap) via Spark's native session_window; end = last
  // event + gap by definition, which the oracle mirrors as max(ts) + 30 min.
  private val sessionWindowQ: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events")),
      "user_id", "session_start")

  // JSON prop extraction (events.props is a JSON string; BASELINE.json:6).
  private val jsonExtract: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val")),
      "event_id")

  // TPC-H Q3 shape: broadcast dim filter + fact-fact join + top-k by revenue.
  private val q3Topk: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(dsumMicro(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      .limit(10)
  }

  // TPC-H Q5 shape: dim-chain broadcast joins down to lineitem, revenue by nation.
  private val q5RegionRevenue: Q = (s, dir) => {
    val dims = Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("c_custkey"), col("n_name"))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(dsumMicro(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("n_name").asc_nulls_first)
  }

  // Rollup: hierarchical subtotals (extension; DuckDB GROUP BY ROLLUP parity).
  private val aggRollup: Q = (s, dir) =>
    ord(
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsumMicro(col("l_quantity")).as("sum_qty")),
      "l_returnflag", "l_linestatus")

  // Cube: all grouping-set combinations (rollup's sibling; same Expand-based
  // plan — one scan, one shuffle, rows ×4 through the Expand).
  private val aggCube: Q = (s, dir) =>
    ord(
      Tables(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        // the lane that CAUGHT the decimal-conversion disagreement window:
        // the 15M-row jittered sf10 orders table (see graft.Micro)
        .agg(count(lit(1)).as("n"), dsumMicro(col("o_totalprice")).as("sum_price")),
      "o_orderstatus", "o_orderpriority")

  // TF-style top terms per language: explode tokens → count per (lang, term)
  // → deterministic top-5 per lang. One shuffle for the count, one bounded
  // window per group — the corpus-statistics shape of a training pipeline.
  private val textTopTerms: Q = (s, dir) => {
    val toks = Tables(s, dir, "documents")
      .select(col("lang"), explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("term"))
    val counts = toks.groupBy("lang", "term").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("n").desc, col("term").asc)
    ord(
      counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("lang", "rank", "term", "n"),
      "lang", "rank")
  }

  // Exact percentiles (percentile_cont semantics match DuckDB quantile_cont:
  // sort + linear interpolation over doubles — bit-reproducible, unlike the
  // approx sketch). At scale prefer approx_percentile and gate with a
  // tolerance like approx_distinct does; the exact form is the oracle-able
  // baseline.
  private val aggPercentiles: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95")),
      "event_type")

  // lead/lag: per-user time delta between consecutive events — the
  // sessionization precursor and a pure single-Exchange window.
  private val windowLagDelta: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    ord(
      Tables(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("micros_since_prev")),
      "user_id", "event_id")
  }

  // Set intersection (extension; §2.6 has union/except only): users who both
  // clicked and purchased.
  private val setIntersect: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    ord(
      ev.filter(col("event_type") === "click").select("user_id")
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id")),
      "user_id")
  }

  // The sketch-based percentile scale path, gated like approx_distinct: the
  // oracle checks the exact value plus a boolean asserting the sketch landed
  // within tolerance — the sketch itself is not oracle-reproducible.
  private val approxPercentiles: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          expr("approx_percentile(value, 0.5, 1000)").as("ap50"))
        .select(col("event_type"), col("p50"),
          // absolute-epsilon floor: a group with p50 = 0 would otherwise
          // demand bit-equality from the sketch
          (abs(col("ap50") - col("p50")) <= greatest(abs(col("p50")) * 0.05, lit(0.001)))
            .as("approx_ok")),
      "event_type")

  // TPC-H Q18 shape: HAVING on an aggregate, then join the survivors back to
  // dims and top-k — aggregation-before-join ordering Catalyst can't derive
  // on its own.
  private val q18TopCustomers: Q = (s, dir) => {
    val bigOrders = Tables(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(dsumMicro(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250)
    bigOrders
      .join(Tables(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(s, dir, "customer").select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
      .orderBy(col("total_qty").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      .limit(20)
  }

  // Pivot with FIXED pivot values: no values-discovery job (an unpinned
  // pivot runs a distinct scan first — a silent extra pass at 100 TB) and a
  // deterministic output schema. Spark leaves absent cells NULL where a
  // FILTER'd count yields 0 — coalesce pins the engine-agnostic semantics.
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val aggPivot: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .select(col("cohort") +: eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*),
      "cohort")

  // Unpivot/melt — the inverse reshape (long-form metrics from wide columns);
  // value columns are cast to one type up front, as the operator requires.
  private val unpivotMelt: Q = (s, dir) =>
    ord(
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_nationkey").cast("double").as("c_nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal"), col("c_nationkey")), "metric", "value"),
      "c_custkey", "metric")

  // Rank-family windows (ntile/percent_rank/cume_dist) — the distribution
  // bucketing every cohort analysis leans on. One Exchange on the partition
  // key; the unique (value, event_id) ordering makes peer groups singletons,
  // so both engines agree bit-for-bit on the rank fractions.
  private val windowNtile: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      .orderBy(col("value").asc, col("event_id").asc)
    ord(
      Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist")),
      "event_type", "event_id")
  }

  // Time-range window frame: per-user trailing-1-hour running sum — RANGE
  // frames bound by the ORDER value (event-time micros), not row position.
  // The streaming sibling of a sliding window, expressed per-row. Micro-unit
  // accumulator as everywhere, so frame evaluation order can't drift the sum.
  private val windowRangeFrame: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("tmicros").asc)
      .rangeBetween(-3600L * 1000000L, 0L)
    ord(
      Tables(s, dir, "events")
        .withColumn("tmicros", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          Micro.fromMicro(Micro.microSum(col("value")).over(w)).as("sum_1h"),
          count(lit(1)).over(w).as("n_1h")),
      "user_id", "event_id")
  }

  // Correlation/covariance via closed-form moments over EXACT micro-unit
  // accumulators: built-in corr()/covar_pop() merge partial moments in
  // doubles, so their low bits depend on partition boundaries — fine for
  // statistics, fatal for a cross-engine hash gate. Summing the five
  // moments through Micro makes the derived statistics bit-identical on
  // any engine and any partitioning, at the cost of one extra multiply per
  // row. Same single-Exchange partial-aggregate shape as every groupBy.
  private val aggCorr: Q = (s, dir) => {
    val e = Tables(s, dir, "events").withColumn("hr", hour(col("ts")).cast("long"))
    val g = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      dsumMicro(col("value")).as("sx"),
      sum(col("hr")).as("sy"),
      dsumMicro(col("value") * col("hr")).as("sxy"),
      dsumMicro(col("value") * col("value")).as("sxx"),
      sum(col("hr") * col("hr")).as("syy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy").cast("double")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    ord(
      g.select(col("event_type"), col("n"),
        round(cov / (n * n), 6).as("covar_vh"),
        // zero-variance guard (project division rule): correlation is
        // undefined when either side is constant — NULL, as corr() returns
        when(vx > 0 && vy > 0, round(cov / (sqrt(vx) * sqrt(vy)), 6)).as("corr_vh")),
      "event_type")
  }

  // Closed-form OLS trend fit per group (value ~ epoch-day): slope,
  // intercept, r² from the same exact-decimal moment algebra as agg_corr —
  // the one-feature regression every metrics pipeline runs ("is this KPI
  // drifting"), computed without any iterative solver. Moments accumulate
  // exactly (integer x, micro-unit y-products) so the fit is
  // partition-order-proof; the closing arithmetic is the identical IEEE
  // double formula on both engines. Zero-variance guards return NULL like
  // agg_corr. One partial-aggregated exchange on the group key.
  private val fitLinear: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
      .withColumn("x", expr("unix_micros(ts) DIV 86400000000"))
    val g = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      dsumMicro(col("value")).as("sy"),
      dsumMicro(col("x") * col("value")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      dsumMicro(col("value") * col("value")).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val cov = n * col("sxy") - sx * col("sy")
    val vx = n * sxx - sx * sx
    val vy = n * col("syy") - col("sy") * col("sy")
    val slope = cov / vx
    ord(
      g.select(col("event_type"), col("n"),
        when(vx > 0, round(slope, 6)).as("slope"),
        when(vx > 0, round((col("sy") - slope * sx) / n, 6)).as("intercept"),
        when(vx > 0 && vy > 0, round(cov * cov / (vx * vy), 6)).as("r2")),
      "event_type")
  }

  // OHLC downsampling — the time-series compaction every metrics store runs
  // (open/high/low/close per series per bucket). Open/close are min_by /
  // max_by over the composite (ts, event_id) order, so same-timestamp ties
  // resolve identically on both engines (arg_min/arg_max with a row value in
  // DuckDB). One partial-aggregated exchange on (series, bucket); min_by
  // partials carry one (value, order-key) pair per group — mergeable, so the
  // map-side combine holds at any scale.
  private val tsOhlc: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .withColumn("bucket", expr("unix_micros(ts) DIV 3600000000"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(
          count(lit(1)).as("n"),
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close")),
      "event_type", "bucket")

  // Deterministic mode — most frequent hour-of-day per event type, ties
  // broken toward the smaller hour (max_by over (count, -hour): Spark's
  // mode() leaves ties unspecified, which can never pass a hash gate).
  // Two stacked partial-aggregated exchanges: (type, hour) counts collapse
  // map-side, then one row per type survives the argmax.
  private val aggMode: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .withColumn("hr", hour(col("ts")).cast("long"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("event_type"))
        .agg(
          max_by(col("hr"), struct(col("cnt"), -col("hr"))).as("modal_hour"),
          max(col("cnt")).as("n_at_mode")),
      "event_type")

  // Fixed-width histogram — the profiling/distribution primitive: floor-
  // division binning (not width_bucket: arithmetic this plain is identical
  // on every engine), one partial-aggregated exchange on the bucket id.
  // Exact stats per bin: count, min/max (exact double comparisons), sum via
  // the micro-unit accumulator rule.
  private val aggHistogram: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events")
        .groupBy(floor(col("value") / 20.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"),
          dsumMicro(col("value")).as("sum_v")),
      "bucket")

  // Per-row anomaly scoring — z-scores against per-group moments, the
  // outlier gate a metrics pipeline runs over raw events. The group stats
  // come from the same exact-decimal moment algebra as agg_corr (a float
  // stddev_samp would be partition-order-dependent); the tiny stats table
  // broadcasts back onto the event scan, so flagging is a map-side join —
  // no second shuffle of the fact stream. round(z, 6) absorbs the last-ulp
  // ambiguity division re-introduces, as the corr query does.
  private val anomalyZscore: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    val g = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      dsumMicro(col("value")).as("sx"),
      dsumMicro(col("value") * col("value")).as("sxx"))
    val nD = col("n").cast("double")
    val stats = g.select(col("event_type"),
      (col("sx") / nD).as("mu"),
      sqrt((nD * col("sxx") - col("sx") * col("sx")) / (nD * (nD - 1))).as("sigma"))
    val z = (col("value") - col("mu")) / col("sigma")
    ord(
      e.join(broadcast(stats), "event_type")
        .filter(col("sigma") > 0 && abs(z) > lit(2.5))
        .select(col("event_id"), col("event_type"), col("value"), round(z, 6).as("z")),
      "event_id")
  }

  // Explicit GROUPING SETS (rollup/cube's general form) with grouping()
  // indicators distinguishing "NULL because aggregated away" from a data
  // NULL — the same single-scan Expand-based plan as rollup/cube.
  private val aggGroupingSets: Q = (s, dir) =>
    ord(
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          // dsumMicro: same jittered-orders conversion window as agg_cube
          dsumMicro(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority")),
      "o_orderstatus", "o_orderpriority")

  // Heavy hitters via the native Misra-Gries aggregate (graft_topk_freq —
  // functions.FreqSketchAgg): one pass, k counters per group, mergeable
  // partials. The fixture plants the classic skew (one 50% hot key, one 25%
  // warm key, unique cold tail ≫ k) so the decrement/merge paths genuinely
  // run; the gate follows the sketch's guarantee — every key with true
  // count > n/(k+1) MUST be present among candidates — because candidate
  // membership below that threshold is legitimately merge-order-dependent
  // (only guarantee-backed facts belong in hash-checked output; the
  // approx_distinct gate pattern).
  private val HHK = 16
  private val aggHeavyHitters: Q = (s, dir) => {
    val keyed = Tables(s, dir, "events").select(col("event_type"),
      when((col("event_id") % 4).isin(0, 2), lit("hot"))
        .when(col("event_id") % 4 === 1, lit("warm"))
        .otherwise(concat(lit("cold"), col("event_id"))).as("k"))
    val exact = keyed.groupBy("event_type", "k").agg(count(lit(1)).as("n"))
    val tot = keyed.groupBy("event_type").agg(count(lit(1)).as("total"))
    val sk = keyed.groupBy("event_type").agg(expr(s"graft_topk_freq(k, $HHK)").as("cand"))
    ord(
      exact.join(tot, Seq("event_type"))
        .filter(col("n") * (HHK + 1) > col("total"))
        .join(sk, Seq("event_type"))
        .select(col("event_type"), col("k").as("hot_key"), col("n"),
          map_contains_key(col("cand"), col("k")).as("covered")),
      "event_type", "hot_key")
  }

  // Time-series gap filling: a dense per-(cohort, day) daily rollup where
  // days with no activity appear explicitly with zero counts — the
  // generate_series/calendar-join every reporting stack needs, expressed as
  // per-cohort date `sequence` + explode + left join. Scale: the grid is
  // O(cohorts × span-days) — calendar-bounded, independent of event volume;
  // the join keys on (cohort, day) like the rollup itself.
  private val tsGapfill: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select((col("user_id") % 50).as("cohort"), to_date(col("ts")).as("day"),
        col("value"))
    val actual = ev.groupBy("cohort", "day")
      .agg(count(lit(1)).as("n"), dsumMicro(col("value")).as("sum_v"))
    val grid = ev.groupBy("cohort")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("cohort"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    ord(
      grid.join(actual, Seq("cohort", "day"), "left")
        .select(col("cohort"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_v"), lit(0.0)).as("sum_v")),
      "cohort", "day")
  }

  // Linear interpolation over the gap-filled day grid: a missing day takes
  // v_prev + (v_next − v_prev) · elapsed/gap between its bookend observed
  // days (time-series repair for downstream models that need a dense,
  // NULL-free signal). The grid spans each cohort's [min(day), max(day)], so
  // every missing day has both bookends by construction. Scale: the grid
  // explode is bounded by the calendar span; both ignore-null bookend scans
  // share ONE cohort-keyed sort (same partition + order ⇒ one window
  // exchange); no self-join — the standard as-of trick of riding running
  // last/first over the union grid. Rounded to 6 so the engines' double
  // formatting cannot drift.
  private val tsInterpolate: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select((col("user_id") % 50).as("cohort"), to_date(col("ts")).as("day"),
        col("value"))
    val actual = ev.groupBy("cohort", "day")
      .agg((dsumMicro(col("value")) / count(lit(1))).as("v"))
    val grid = ev.groupBy("cohort")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("cohort"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort").orderBy(col("day").asc)
    val back = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val joined = grid.join(actual, Seq("cohort", "day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(fwd))
    ord(
      joined.select(col("cohort"), col("day"),
        // Micro.round6, not round(_, 6): the daily mean is a micro-sum
        // quotient, the exact shape whose round-at-1e-6 diverged between
        // engines at sf0.01 (35.871666 vs 35.871667)
        Micro.round6(coalesce(col("v"),
          col("pv") + (col("nv") - col("pv")) *
            datediff(col("day"), col("pd")) / datediff(col("nd"), col("pd")))).as("v"),
        col("v").isNull.as("interpolated")),
      "cohort", "day")
  }

  // Market-basket association mining: part pairs co-purchased within an
  // order, with support counts and LIFT (observed co-occurrence over the
  // independence expectation) — the retail-analytics staple. The pair
  // fan-out is bounded by the basket: C(items-per-order, 2) per order (≤ ~21
  // for TPC-H-shaped data), generated by a within-order self-join on the
  // order key — never a global product. Part frequencies join back on the
  // part key; lift = n_ab·N / (n_a·n_b) is one exact integer ratio per pair,
  // computed in DOUBLE and rounded. Top-K by (support, pair) keeps the
  // released table bounded.
  private val BASKET_TOP = 25
  private val basketPairs: Q = (s, dir) => {
    val items = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    // 1-row scalar rides a broadcast cross-combine (the graph_triangles
    // pattern) — no driver-side action at query-construction time
    val nOrders = items.agg(count_distinct(col("o")).as("n_orders"))
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p_a"), col("b.p").as("p_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(freq.select(col("p").as("p_a"), col("n_p").as("n_a")), Seq("p_a"))
      .join(freq.select(col("p").as("p_b"), col("n_p").as("n_b")), Seq("p_b"))
      .crossJoin(nOrders)
      .select(col("p_a"), col("p_b"), col("n_ab"),
        round(col("n_ab").cast("double") * col("n_orders") / (col("n_a") * col("n_b")), 6)
          .as("lift"))
      .orderBy(col("n_ab").desc, col("p_a").asc_nulls_first, col("p_b").asc_nulls_first)
      .limit(BASKET_TOP)
  }

  // RFM segmentation (recency / frequency / monetary quintiles) — the CRM
  // staple. The scale-honest quintile assignment: NOT a global ntile (a
  // single-partition sort of every customer), but exact percentile
  // BOUNDARIES from one aggregate (a 1-row, 12-value side) broadcast back
  // over the per-customer frame — per-row CASE comparisons, the
  // anomaly_zscore pattern. Boundaries round to 6 dp on both engines before
  // comparison so an interpolation ULP cannot flip a bucket.
  private val customerRfm: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    val per = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_d"),
        count(lit(1)).as("n_orders"),
        dsumMicro(col("o_totalprice")).as("total"))
    val ref = o.agg(max(col("o_orderdate")).as("ref_d"))
    val base = per.crossJoin(ref)
      .withColumn("recency_days", datediff(col("ref_d"), col("last_d")).cast("long"))
    val qs = base.agg(
      expr("percentile(recency_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rq"),
      expr("percentile(n_orders, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fq"),
      expr("percentile(total, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mq"))
    def exceeded(m: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
      (1 to 4).map(i => when(m > round(element_at(q, i), 6), 1).otherwise(0))
        .reduce(_ + _)
    base.crossJoin(broadcast(qs))
      .select(col("o_custkey"), col("recency_days"), col("n_orders"),
        round(col("total"), 6).as("total"),
        (lit(5) - exceeded(col("recency_days"), col("rq"))).as("r"),
        (lit(1) + exceeded(col("n_orders"), col("fq"))).as("f"),
        (lit(1) + exceeded(col("total"), col("mq"))).as("m"))
      .withColumn("segment",
        concat(col("r").cast("string"), col("f").cast("string"), col("m").cast("string")))
      .orderBy(col("o_custkey").asc_nulls_first)
  }

  // first/last/nth over the full partition frame — the "bookend" window
  // family (entry event, exit event, second touch) on one Exchange.
  private val windowFirstLast: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ord(
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type")),
      "user_id", "event_id")
  }

  // ---- window_rolling_median: robust moving location ----------------------
  //
  // The robust counterpart of a moving average: the exact median over each
  // key's trailing 10 observations. A rolling mean chases every spike; the
  // rolling median is the standard robust smoother for noisy operational
  // series (latency, queue depth, sensor drift) and pairs with anomaly_mad
  // as its windowed form.
  //
  // Scale: ONE exchange on the key, then the percentile evaluates per row
  // over a bounded 10-element frame — O(W log W) per row with constant
  // memory, no second shuffle. Exact `percentile` (not approx) is right
  // here BECAUSE the frame is bounded: the sketch's error trade exists for
  // unbounded groups, not 10-row buffers. Both engines interpolate the same
  // p·(n−1) rank over the same ≤10 doubles; round(6) absorbs any last-ulp
  // divergence in the interpolation arithmetic.
  private val windowRollingMedian: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-9, org.apache.spark.sql.expressions.Window.currentRow)
    ord(
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.5D)").over(w), 6).as("roll_med")),
      "user_id", "event_id")
  }

  // ---- ts_ewma: truncated-horizon exponential smoothing --------------------
  //
  // EWMA is inherently recursive (s_t = α·x_t + (1−α)·s_{t−1}) — a
  // sequential per-key chain, the one shape a shared-nothing engine must
  // NOT express literally (it serializes the partition). The scale form
  // truncates the horizon: with α = 1/4 the weights decay by 0.75^j, so
  // after W = 20 lags a term contributes < 0.75²⁰ ≈ 3e-3 of a fresh
  // observation — the W-term window IS the EWMA to ~3 decimal places,
  // computed as an O(W) fold per row inside ONE window exchange instead of
  // an O(n) dependency chain. The fold (collect_list over the row frame,
  // left-fold seeded with the oldest element) has a fixed syntactic order,
  // so Spark's `aggregate` and DuckDB's `list_reduce` accumulate identical
  // IEEE doubles; α = 0.25 and 1−α = 0.75 are dyadic (exact).
  // Output rounding: α = 1/4 makes the exact fold land ON 5e-7 half
  // boundaries, where `round(x, 6)` diverges between engines (Spark rounds
  // the exact binary expansion, DuckDB rounds x·10⁶ after an inexact
  // multiply) — so both sides scale by 10⁶ EXPLICITLY and round the
  // identical product double, then divide back: bit-equal on both engines.
  private val EWMA_W = 20
  private val tsEwma: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-(EWMA_W - 1), org.apache.spark.sql.expressions.Window.currentRow)
    ord(
      Tables(s, dir, "events")
        .withColumn("xs", collect_list(col("value")).over(w))
        .select(col("user_id"), col("event_id"),
          (round(aggregate(slice(col("xs"), 2, EWMA_W), element_at(col("xs"), 1),
            (acc, x) => lit(0.25) * x + lit(0.75) * acc) * lit(1000000.0))
            / lit(1000000.0)).as("ewma")),
      "user_id", "event_id")
  }

  // ---- anomaly_mad: robust outlier detection (modified z-score) ------------
  //
  // anomaly_zscore's mean and stddev are themselves dragged by the very
  // outliers they hunt; the robust form centers on the median and scales by
  // the median absolute deviation, flagging |0.6745·(x − med)/mad| > 3.5
  // (the Iglewicz–Hoaglin modified z-score). Two grouped exact-percentile
  // aggregates (med, then MAD over |x − med|) and a broadcast of the tiny
  // per-group stats back over the scan — the anomaly_zscore/RFM pattern.
  // Exact percentile buffers one group per reducer; at 100 TB swap in
  // approx_percentile exactly as approx_percentiles grades. med and mad
  // round to 6 dp before use so an interpolation ULP cannot flip a flag.
  private val anomalyMad: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val med = ev.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(first(col("med")).as("med"),
        round(expr("percentile(abs(value - med), 0.5D)"), 6).as("mad"))
    ord(
      ev.join(broadcast(mad), "event_type")
        .filter(col("mad") > 0)
        .withColumn("mz", round(lit(0.6745) * (col("value") - col("med")) / col("mad"), 6))
        .filter(abs(col("mz")) > lit(3.5))
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"), col("mz")),
      "event_id")
  }

  val queries: Map[String, Q] = Map(
    "ts_ewma" -> tsEwma,
    "anomaly_mad" -> anomalyMad,
    "ts_gapfill" -> tsGapfill,
    "basket_pairs" -> basketPairs,
    "customer_rfm" -> customerRfm,
    "ts_interpolate" -> tsInterpolate,
    "window_first_last" -> windowFirstLast,
    "window_rolling_median" -> windowRollingMedian,
    "agg_heavy_hitters" -> aggHeavyHitters,
    "agg_corr" -> aggCorr,
    "fit_linear" -> fitLinear,
    "ts_ohlc" -> tsOhlc,
    "agg_mode" -> aggMode,
    "agg_histogram" -> aggHistogram,
    "anomaly_zscore" -> anomalyZscore,
    "agg_grouping_sets" -> aggGroupingSets,
    "window_ntile" -> windowNtile,
    "window_range_frame" -> windowRangeFrame,
    "agg_pivot" -> aggPivot,
    "unpivot_melt" -> unpivotMelt,
    "approx_percentiles" -> approxPercentiles,
    "q18_top_customers" -> q18TopCustomers,
    "agg_percentiles" -> aggPercentiles,
    "window_lag_delta" -> windowLagDelta,
    "set_intersect" -> setIntersect,
    "agg_cube" -> aggCube,
    "text_top_terms" -> textTopTerms,
    "q1_agg" -> q1Agg,
    "agg_stats" -> aggStats,
    "approx_distinct" -> approxDistinct,
    "window_agg_time" -> windowAggTime,
    "window_sliding" -> windowSliding,
    "session_window" -> sessionWindowQ,
    "json_extract" -> jsonExtract,
    "q3_topk" -> q3Topk,
    "q5_region_revenue" -> q5RegionRevenue,
    "agg_rollup" -> aggRollup
  )

  val oracle: Map[String, String] = Map(
    "ts_ewma" ->
      s"""WITH fr AS (
         |  SELECT user_id, event_id,
         |    list(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         |      ROWS BETWEEN ${EWMA_W - 1} PRECEDING AND CURRENT ROW) AS xs
         |  FROM events)
         |SELECT user_id, event_id,
         |  round(list_reduce(xs, (acc, x) -> 0.25 * x + 0.75 * acc) * 1000000.0) / 1000000.0 AS ewma
         |FROM fr ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, any_value(m.med) AS med,
        |         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
        |SELECT event_id, e.event_type, value, m.med, m.mad,
        |       round(0.6745 * (value - m.med) / m.mad, 6) AS mz
        |FROM events e JOIN mad m USING (event_type)
        |WHERE m.mad > 0 AND abs(round(0.6745 * (value - m.med) / m.mad, 6)) > 3.5
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "ts_gapfill" ->
      """WITH ev AS (
        |  SELECT user_id % 50 AS cohort, CAST(ts AS DATE) AS day, value FROM events),
        |actual AS (
        |  SELECT cohort, day, count(*) AS n,
        |    CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_v
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT cohort, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT cohort, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY 1))
        |SELECT g.cohort AS cohort, g.day AS day,
        |  COALESCE(a.n, 0) AS n, COALESCE(a.sum_v, 0.0) AS sum_v
        |FROM grid g LEFT JOIN actual a ON g.cohort = a.cohort AND g.day = a.day
        |ORDER BY g.cohort ASC NULLS FIRST, g.day ASC NULLS FIRST""".stripMargin,
    "customer_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_d, count(*) AS n_orders,
        |    CAST(sum(CAST(floor((o_totalprice) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS total
        |  FROM orders GROUP BY o_custkey),
        |ref AS (SELECT max(o_orderdate) AS ref_d FROM orders),
        |base AS (
        |  SELECT p.o_custkey, p.n_orders, p.total,
        |    CAST(date_diff('day', CAST(p.last_d AS DATE), CAST(r.ref_d AS DATE)) AS BIGINT) AS recency_days
        |  FROM per p CROSS JOIN ref r),
        |qs AS (
        |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
        |         quantile_cont(n_orders, [0.2, 0.4, 0.6, 0.8]) AS fq,
        |         quantile_cont(total, [0.2, 0.4, 0.6, 0.8]) AS mq
        |  FROM base),
        |scored AS (
        |  SELECT b.o_custkey, b.recency_days, b.n_orders, round(b.total, 6) AS total,
        |    CAST(5 - (CASE WHEN b.recency_days > round(rq[1], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.recency_days > round(rq[2], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.recency_days > round(rq[3], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.recency_days > round(rq[4], 6) THEN 1 ELSE 0 END) AS INT) AS r,
        |    CAST(1 + (CASE WHEN b.n_orders > round(fq[1], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.n_orders > round(fq[2], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.n_orders > round(fq[3], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.n_orders > round(fq[4], 6) THEN 1 ELSE 0 END) AS INT) AS f,
        |    CAST(1 + (CASE WHEN b.total > round(mq[1], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.total > round(mq[2], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.total > round(mq[3], 6) THEN 1 ELSE 0 END
        |            + CASE WHEN b.total > round(mq[4], 6) THEN 1 ELSE 0 END) AS INT) AS m
        |  FROM base b CROSS JOIN qs)
        |SELECT o_custkey, recency_days, n_orders, total, r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment
        |FROM scored
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin,
    "basket_pairs" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |no AS (SELECT count(DISTINCT o) AS n_orders FROM items),
         |freq AS (SELECT p, count(*) AS n_p FROM items GROUP BY p),
         |pairs AS (
         |  SELECT a.p AS p_a, b.p AS p_b, count(*) AS n_ab
         |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
         |  GROUP BY a.p, b.p)
         |SELECT p_a, p_b, CAST(n_ab AS BIGINT) AS n_ab,
         |  round(CAST(n_ab AS DOUBLE) * no.n_orders / (fa.n_p * fb.n_p), 6) AS lift
         |FROM pairs
         |JOIN freq fa ON pairs.p_a = fa.p
         |JOIN freq fb ON pairs.p_b = fb.p
         |CROSS JOIN no
         |ORDER BY n_ab DESC, p_a ASC NULLS FIRST, p_b ASC NULLS FIRST
         |LIMIT $BASKET_TOP""".stripMargin,
    "ts_interpolate" ->
      """WITH ev AS (
        |  SELECT user_id % 50 AS cohort, CAST(ts AS DATE) AS day, value FROM events),
        |actual AS (
        |  SELECT cohort, day,
        |    CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*) AS v
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT cohort, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT cohort, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY 1)),
        |j AS (
        |  SELECT g.cohort, g.day, a.v,
        |    last_value(a.v IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN a.v IS NOT NULL THEN g.day END IGNORE NULLS) OVER wb AS pd,
        |    first_value(a.v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN a.v IS NOT NULL THEN g.day END IGNORE NULLS) OVER wf AS nd
        |  FROM grid g LEFT JOIN actual a ON g.cohort = a.cohort AND g.day = a.day
        |  WINDOW
        |    wb AS (PARTITION BY g.cohort ORDER BY g.day ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY g.cohort ORDER BY g.day ASC
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT cohort, day,
        |  round((COALESCE(v,
        |    pv + (nv - pv) * date_diff('day', pd, day) / date_diff('day', pd, nd))) * 1000000.0) / 1000000.0 AS v,
        |  v IS NULL AS interpolated
        |FROM j
        |ORDER BY cohort ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin,
    "window_first_last" ->
      """SELECT user_id, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "window_rolling_median" ->
      """SELECT user_id, event_id,
        |  round(quantile_cont(value, 0.5) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS roll_med
        |FROM events
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "agg_heavy_hitters" ->
      s"""WITH keyed AS (
         |  SELECT event_type,
         |    CASE WHEN event_id % 4 IN (0, 2) THEN 'hot'
         |         WHEN event_id % 4 = 1 THEN 'warm'
         |         ELSE 'cold' || event_id END AS k
         |  FROM events),
         |exact AS (SELECT event_type, k, count(*) AS n FROM keyed GROUP BY 1, 2),
         |tot AS (SELECT event_type, count(*) AS total FROM keyed GROUP BY 1)
         |SELECT event_type, k AS hot_key, n, true AS covered
         |FROM exact JOIN tot USING (event_type)
         |WHERE n * ${HHK + 1} > total
         |ORDER BY event_type ASC NULLS FIRST, hot_key ASC NULLS FIRST""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(value / 20.0) AS BIGINT) AS bucket, count(*) AS n,
        |  min(value) AS lo, max(value) AS hi,
        |  CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_v
        |FROM events GROUP BY 1 ORDER BY bucket ASC NULLS FIRST""".stripMargin,
    "anomaly_zscore" ->
      """WITH g AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sx,
        |    CAST(sum(CAST(floor((value * value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxx
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT event_type, sx / n AS mu,
        |    sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1))) AS sigma
        |  FROM g)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - s.mu) / s.sigma, 6) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE s.sigma > 0 AND abs((e.value - s.mu) / s.sigma) > 2.5
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "agg_corr" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sx,
        |    sum(EXTRACT(hour FROM ts)) AS sy,
        |    CAST(sum(CAST(floor((value * EXTRACT(hour FROM ts)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxy,
        |    CAST(sum(CAST(floor((value * value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxx,
        |    sum(EXTRACT(hour FROM ts) * EXTRACT(hour FROM ts)) AS syy
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  round((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n), 6) AS covar_vh,
        |  CASE WHEN (n * sxx - sx * sx) > 0
        |        AND (CAST(n * syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy) > 0
        |    THEN round((n * sxy - sx * sy)
        |      / (sqrt(n * sxx - sx * sx) * sqrt(CAST(n * syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6)
        |  END AS corr_vh
        |FROM m ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    // the oracle states the order semantics with windows (DuckDB's arg_min
    // takes no composite key); the Spark side is graded on the mergeable
    // min_by/max_by plan
    "ts_ohlc" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket, ts, event_id, value
        |  FROM events),
        |w AS (
        |  SELECT event_type, bucket, value,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts ASC, event_id ASC) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts DESC, event_id DESC) AS rn_z
        |  FROM b),
        |agg AS (
        |  SELECT event_type, bucket, count(*) AS n, max(value) AS high, min(value) AS low
        |  FROM b GROUP BY 1, 2)
        |SELECT a.event_type, a.bucket, a.n, o.value AS open, a.high, a.low, z.value AS close
        |FROM agg a
        |JOIN (SELECT event_type, bucket, value FROM w WHERE rn_a = 1) o
        |  ON a.event_type = o.event_type AND a.bucket = o.bucket
        |JOIN (SELECT event_type, bucket, value FROM w WHERE rn_z = 1) z
        |  ON a.event_type = z.event_type AND a.bucket = z.bucket
        |ORDER BY a.event_type ASC NULLS FIRST, a.bucket ASC NULLS FIRST""".stripMargin,
    "agg_mode" ->
      """WITH c AS (
        |  SELECT event_type, EXTRACT(hour FROM ts) AS hr, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, hr, cnt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, hr ASC) AS rn
        |  FROM c)
        |SELECT event_type, CAST(hr AS BIGINT) AS modal_hour, CAST(cnt AS BIGINT) AS n_at_mode
        |FROM r WHERE rn = 1 ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "fit_linear" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(epoch_us(ts) // 86400000000) AS sx,
        |    CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sy,
        |    CAST(sum(CAST(floor(((epoch_us(ts) // 86400000000) * value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxy,
        |    sum((epoch_us(ts) // 86400000000) * (epoch_us(ts) // 86400000000)) AS sxx,
        |    CAST(sum(CAST(floor((value * value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS syy
        |  FROM events GROUP BY event_type),
        |f AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS vy,
        |    sy, CAST(sx AS DOUBLE) AS sxd, CAST(n AS DOUBLE) AS nd
        |  FROM m)
        |SELECT event_type, n,
        |  CASE WHEN vx > 0 THEN round(cov / vx, 6) END AS slope,
        |  CASE WHEN vx > 0 THEN round((sy - (cov / vx) * sxd) / nd, 6) END AS intercept,
        |  CASE WHEN vx > 0 AND vy > 0 THEN round(cov * cov / (vx * vy), 6) END AS r2
        |FROM f ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_price,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "window_ntile" ->
      """SELECT event_type, event_id,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        |ORDER BY event_type ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "window_range_frame" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) OVER w AS DOUBLE) / 1000000.0 AS sum_1h,
        |  count(*) OVER w AS n_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "agg_pivot" -> {
      val cols = eventTypes.map(t =>
        s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n  ")
      s"""SELECT user_id % 10 AS cohort,
         |  $cols
         |FROM events GROUP BY 1 ORDER BY cohort ASC NULLS FIRST""".stripMargin
    },
    "unpivot_melt" ->
      """SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'c_nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
        |ORDER BY c_custkey ASC NULLS FIRST, metric ASC NULLS FIRST""".stripMargin,
    "approx_percentiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "q18_top_customers" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(floor((l_quantity) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 250)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC NULLS LAST, o_orderkey ASC NULLS FIRST LIMIT 20""".stripMargin,
    "agg_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "window_lag_delta" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |    AS micros_since_prev
        |FROM events
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "text_top_terms" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |counts AS (SELECT lang, term, count(*) AS n FROM toks GROUP BY lang, term)
        |SELECT lang, rank, term, n FROM (
        |  SELECT lang, term, n,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term ASC) AS INT) AS rank
        |  FROM counts) WHERE rank <= 5
        |ORDER BY lang ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor((l_quantity) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_qty,
        |  CAST(sum(CAST(floor((l_extendedprice) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_base_price,
        |  CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
        |  CAST(sum(CAST(floor((l_quantity) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "agg_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  min(value) AS min_v, max(value) AS max_v,
        |  CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_v
        |FROM events GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "window_agg_time" ->
      """SELECT make_timestamp(epoch_us(ts) // 3600000000 * 3600000000) AS ws,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_v
        |FROM events GROUP BY 1, 2
        |ORDER BY ws ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,
    "window_sliding" ->
      """SELECT make_timestamp(epoch_us(ts) // 1800000000 * 1800000000
        |         - k * 1800000000) AS ws,
        |  event_type, count(*) AS n
        |FROM events CROSS JOIN (VALUES (0), (1)) t(k)
        |GROUP BY 1, 2
        |ORDER BY ws ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,
    "session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin,
    "json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC NULLS LAST, o_orderkey ASC NULLS FIRST LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY n_name ORDER BY n_name ASC NULLS FIRST""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(floor((l_quantity) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin
  )
}
