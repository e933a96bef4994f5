package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Incremental maintenance of grouped-aggregate tables — the materialized-
  * view delta-merge every warehouse rollup runs: instead of recomputing
  * `GROUP BY` over the full history each refresh, keep a per-group partial
  * STATE (counts, sums, min/max) and fold each new delta batch into it.
  * The reference recomputes its rollups from Postgres on every poll; at
  * 100 TB the recompute is the scale-killer and state-merge is the
  * standard fix (it is exactly what Structured Streaming's stateful
  * aggregation does inside its state store — here the state is an
  * explicit, durable table the caller owns, e.g. a [[graft.streaming.ParquetTableSink]]).
  *
  * Mergeable state discipline: only ASSOCIATIVE partials are stored —
  * count/sum add, max/min take greatest/least; derived metrics (avg =
  * sum/count) are re-derived after the merge, never stored. That is the
  * same partial/final split Catalyst uses inside `HashAggregateExec`,
  * lifted to table granularity.
  *
  * Scale: the merge is ONE full-outer equi-join on the group keys — state
  * shuffles by its key (or not at all, if it lives bucketed by that key),
  * the delta is micro-batch-sized and broadcastable. Per refresh the work
  * is O(|delta| + |touched groups|), never O(history). Double sums ride
  * the exact micro-unit accumulator ([[graft.Micro]]: floor(x·10⁶) summed
  * in DECIMAL(38,0)) so the merged state is bit-equal to a from-scratch
  * recompute on any engine (floating addition is not associative; integer
  * addition is — and unlike the old DECIMAL(25,6) idiom, the micro floor
  * has no double→decimal conversion boundary for engines to disagree on).
  */
object IncrementalAgg {

  /** Merge two partial-aggregate states keyed by `keys`.
    *
    * @param add     additive partial columns (counts, integer micro-sums)
    * @param maxCols high-water partials merged with `greatest`
    * @param minCols low-water partials merged with `least`
    *
    * Groups present on one side only pass through unchanged (additive
    * columns treat the missing side as typed zero; greatest/least skip the
    * missing side's null).
    */
  def mergeStates(state: DataFrame, delta: DataFrame, keys: Seq[String],
                  add: Seq[String], maxCols: Seq[String] = Nil,
                  minCols: Seq[String] = Nil): DataFrame = {
    val valCols = add ++ maxCols ++ minCols
    require(valCols.nonEmpty, "mergeStates needs at least one value column")
    (keys ++ valCols).foreach { c =>
      require(state.columns.contains(c) && delta.columns.contains(c),
        s"mergeStates: column $c must exist in both state and delta")
    }
    def zeroOf(c: String): Column = lit(0).cast(state.schema(c).dataType)
    // suffix the delta's value columns so the using-join output is unambiguous
    val d = valCols.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"${c}__d"))
    val merged: Seq[Column] =
      add.map { c =>
        val sv = col(c)
        val dv = col(s"${c}__d")
        // both-NULL stays NULL: SQL `sum` over an all-NULL group is NULL,
        // and the merged state must be indistinguishable from the
        // from-scratch recompute — coalescing to 0 here would diverge
        when(sv.isNull && dv.isNull, lit(null).cast(state.schema(c).dataType))
          .otherwise(coalesce(sv, zeroOf(c)) + coalesce(dv, zeroOf(c))).as(c)
      } ++
        maxCols.map(c => greatest(col(c), col(s"${c}__d")).as(c)) ++
        minCols.map(c => least(col(c), col(s"${c}__d")).as(c))
    // using-columns full outer join coalesces the key columns natively
    state.join(d, keys, "full_outer")
      .select(keys.map(col) ++ merged: _*)
  }

  // ---- incr_agg_merge: graded — state(old window) ⊕ delta(new window) must
  // hash-equal the from-scratch aggregate over the union window. The oracle
  // is the recompute; the Spark side never runs it.
  private val T1 = "2024-01-12 00:00:00"
  private val T2 = "2024-01-24 00:00:00"

  private val incrAggMerge: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    def partial(df: DataFrame): DataFrame =
      df.groupBy((col("user_id") % 100).as("cohort"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          graft.Micro.microSum(col("value")).as("sum_value"),
          max(col("ts")).as("last_ts"),
          min(col("value")).as("min_value"))
    val state = partial(ev.filter(col("ts") < lit(T1).cast("timestamp")))
    val delta = partial(ev.filter(col("ts") >= lit(T1).cast("timestamp") &&
      col("ts") < lit(T2).cast("timestamp")))
    mergeStates(state, delta, Seq("cohort", "event_type"),
      add = Seq("n_events", "sum_value"),
      maxCols = Seq("last_ts"), minCols = Seq("min_value"))
      .select(col("cohort"), col("event_type"), col("n_events"),
        graft.Micro.fromMicro(col("sum_value")).as("sum_value"),
        // the derived metric, re-derived post-merge (never stored)
        graft.Micro.round6(graft.Micro.fromMicro(col("sum_value")) / col("n_events")).as("avg_value"),
        col("last_ts"), col("min_value"))
      .orderBy(col("cohort").asc_nulls_first, col("event_type").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map("incr_agg_merge" -> incrAggMerge)

  val oracle: Map[String, String] = Map(
    // the from-scratch recompute over the union window — what the
    // incremental merge must be indistinguishable from
    "incr_agg_merge" ->
      s"""SELECT user_id % 100 AS cohort, event_type,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value,
         |  round((CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0) / 1000000.0 AS avg_value,
         |  max(ts) AS last_ts,
         |  min(value) AS min_value
         |FROM events WHERE ts < TIMESTAMP '$T2'
         |GROUP BY 1, 2
         |ORDER BY cohort ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin
  )
}
