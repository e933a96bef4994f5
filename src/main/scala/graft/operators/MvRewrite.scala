package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.plans.MvRewriteRule

/** Graded surface for the automatic MV rewrite
  * ([[graft.plans.MvRewriteRule]]): refresh a rollup once, register it,
  * then answer a plain `GROUP BY` over the BASE table — the optimizer
  * must route it through the rollup (MvRewriteSpec pins the executed scan
  * to the MV's files), and the values must be indistinguishable from the
  * from-scratch aggregate, which is exactly what the DuckDB oracle
  * computes over the base table.
  *
  * The reference recomputes its per-route rollups from full Postgres
  * tables on every poll cycle; the MV pattern is the 100 TB replacement —
  * refresh incrementally (IncrementalAgg / stream_rollup_table), query
  * the refreshed artifact automatically.
  *
  * Exactness discipline: the double `value` column rides the exact
  * micro-unit integer form ([[graft.Micro]]: floor(value·10⁶) as
  * DECIMAL(38,0)) from the base projection onward, so partial sums and
  * the rolled-up sum-of-sums are bit-equal to any engine's single-level
  * sum (integer addition is associative; float addition is not, and the
  * old DECIMAL(25,6) projection carried the double→decimal conversion
  * window the sf10 gate exposed). The ratio metric
  * (avg) is re-derived ABOVE the aggregate from the rewritten sum and
  * count — derived metrics are never stored in, nor matched against, the
  * MV (the IncrementalAgg mergeable-state discipline).
  */
object MvRewrite {

  /** Refresh + register the rollup at the (event_type, cohort) grain —
    * FINER than the graded queries' grain, so every rewrite has to
    * re-aggregate the partials. Returns the registered base frame. */
  private def registeredBase(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"),
        graft.Micro.micro(col("value")).as("value_mic"), col("ts"))
    val work = graft.Scratch.dir("graft-mv")
    val mvPath = work.resolve("mv_events").toString
    base.groupBy(col("event_type"), pmod(col("user_id"), lit(100)).as("cohort"))
      .agg(count(lit(1)).as("n"),
        count(col("value_mic")).as("n_value"),
        sum(col("value_mic")).as("s_value"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
      .write.mode("overwrite").parquet(mvPath)
    MvRewriteRule.register(mvPath, base, s.read.parquet(mvPath),
      groupCols = Seq("event_type"),
      countStar = Some("n"),
      countOf = Map("value_mic" -> "n_value"),
      sumOf = Map("value_mic" -> "s_value"),
      minOf = Map("ts" -> "min_ts"),
      maxOf = Map("ts" -> "max_ts"))
    base
  }

  private val mvRewriteScan: Q = (s, dir) => {
    // the user-shaped query: a plain GROUP BY over the BASE frame — the
    // analyzer swaps the rollup in underneath (sameResult match), and the
    // projection above derives the ratio from the rewritten partials
    registeredBase(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("value_mic")).as("n_value"),
        sum(col("value_mic")).as("sum_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .select(col("event_type"), col("n_events"),
        graft.Micro.fromMicro(col("sum_value")).as("sum_value"),
        graft.Micro.round6(graft.Micro.fromMicro(col("sum_value")) / col("n_value")).as("avg_value"),
        col("first_ts"), col("last_ts"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  private val mvRewriteFilter: Q = (s, dir) => {
    // the dashboard-slice shape: a WHERE on the grain column between the
    // aggregate and the base — it selects whole groups, so the rule
    // carries it onto the MV instead of falling back to a base scan
    registeredBase(s, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_mic")).as("sum_value"),
        max(col("ts")).as("last_ts"))
      .select(col("event_type"), col("n_events"),
        graft.Micro.fromMicro(col("sum_value")).as("sum_value"), col("last_ts"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "mv_rewrite_scan" -> mvRewriteScan,
    "mv_rewrite_filter" -> mvRewriteFilter)

  val oracle: Map[String, String] = Map(
    // the from-scratch aggregate over the BASE table — what the
    // MV-routed answer must be indistinguishable from
    "mv_rewrite_scan" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value,
        |  round((CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(value)) * 1000000.0) / 1000000.0 AS avg_value,
        |  min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY 1
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "mv_rewrite_filter" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value,
        |  max(ts) AS last_ts
        |FROM events
        |WHERE event_type IN ('click', 'view', 'purchase')
        |GROUP BY 1
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin
  )
}
