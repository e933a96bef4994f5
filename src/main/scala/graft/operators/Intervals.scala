package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Interval algebra over the event stream — the gaps-and-islands family.
  *
  * The reference's fact table is timestamped GPS pings; the first questions a
  * consumer asks of any such stream are interval-shaped: "merge each vehicle's
  * pings into service intervals" and "how many vehicles were live at once".
  * Both are classic warehouse operators (islands = merge overlapping
  * intervals per key; sweep line = max concurrency) that no Spark builtin
  * expresses directly, yet both compile to single-exchange window plans.
  *
  * Scale design:
  *   - `mergeIntervals` partitions every window by the key and orders by
  *     (start, end, tie): ONE exchange on the key, then the island
  *     assignment is a per-partition streaming pass (running max + running
  *     sum over the same window spec — no second shuffle); the final groupBy
  *     (key, island) reuses the same hash partitioning.
  *   - `maxConcurrency` is the textbook sweep line: each interval emits a
  *     +1/-1 boundary row (map-side, 2× fan-out), the running sum windows
  *     over the requested dimension — one exchange keyed on the dimension
  *     whose concurrency is asked, rows 2·n. Ends sort before starts at equal
  *     timestamps (delta ASC), so touching intervals never double-count
  *     (half-open semantics); the default RANGE frame makes tied rows peers,
  *     so the running value is order-independent under duplicate timestamps.
  */
object Intervals {

  /** Merge overlapping/touching half-open intervals per key (gaps-and-islands).
    * Emits one row per island: (key, island, merged start, merged end, count).
    *
    * @param tieCol a column making (start, end, tie) unique per key — keeps
    *               the island numbering deterministic under ties
    */
  def mergeIntervals(iv: DataFrame, key: String, startCol: String,
                     endCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col(startCol).asc_nulls_first, col(endCol).asc_nulls_first,
        col(tieCol).asc_nulls_first)
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    iv
      // an island opens where the interval starts strictly after every
      // previous end (touching intervals merge — half-open adjacency)
      .withColumn("_new", when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("island"))
      .agg(
        min(col(startCol)).as(s"merged_$startCol"),
        max(col(endCol)).as(s"merged_$endCol"),
        count(lit(1)).as("n_events"))
  }

  /** Max simultaneous open intervals per value of `dim` (sweep line), plus
    * the interval count. Half-open: an interval ending at t releases before
    * one starting at t acquires.
    */
  def maxConcurrency(iv: DataFrame, dim: String, startCol: String,
                     endCol: String): DataFrame = {
    val pts = iv.select(col(dim), col(startCol).as("_t"), lit(1L).as("_delta"))
      .unionAll(iv.select(col(dim), col(endCol).as("_t"), lit(-1L).as("_delta")))
    // default frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW: peers of
    // (_t, _delta) fold together, so ties are order-independent
    val w = Window.partitionBy(dim)
      .orderBy(col("_t").asc_nulls_first, col("_delta").asc_nulls_first)
    pts
      .withColumn("_running", sum(col("_delta")).over(w))
      .groupBy(col(dim))
      .agg(
        max(col("_running")).as("max_concurrent"),
        sum(when(col("_delta") === 1L, 1L).otherwise(0L)).as("n_intervals"))
  }

  /** events → deterministic half-open intervals in epoch micros: start = ts,
    * duration = (event_id % 300 + 60) seconds — pure integer arithmetic both
    * engines compute bit-identically (no float durations). */
  private def intervals(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(
      col("user_id"), col("event_id"), col("event_type"),
      expr("unix_micros(ts)").as("start_us"),
      (expr("unix_micros(ts)")
        + (pmod(col("event_id"), lit(300)) + lit(60)) * lit(1000000L)).as("end_us"))

  private val intervalMerge: Q = (s, dir) =>
    mergeIntervals(intervals(s, dir), "user_id", "start_us", "end_us", "event_id")
      .orderBy(col("user_id").asc_nulls_first, col("island").asc_nulls_first)

  private val intervalConcurrency: Q = (s, dir) =>
    maxConcurrency(intervals(s, dir), "event_type", "start_us", "end_us")
      .orderBy(col("event_type").asc_nulls_first)

  // ---- interval_weighted_avg: duration-weighted mean -----------------------
  //
  // The time-weighted average — "what was the mean value, weighted by how
  // long each observation was in force" — the canonical downsampling of a
  // validity-interval table (sensor readings, prices, capacity). A plain
  // avg() overweights keys that report often; duration weighting is the fix,
  // and the contrast column makes the bias visible.
  //
  // Scale: ONE grouped aggregate over the scan with map-side partials — no
  // window, no join; the groups are the tiny event_type dimension. Duration
  // is the interval length in whole seconds (exact integers). Determinism:
  // both numerators sum value·weight through the exact micro-unit
  // accumulator (graft.Micro — a double sum across a shuffle is
  // merge-order-dependent, the integer micro-sum is not) and divide as
  // double once at the end.
  private val intervalWeightedAvg: Q = (s, dir) => {
    val durS = pmod(col("event_id"), lit(300)) + lit(60)
    Tables(s, dir, "events")
      .select(col("event_type"), col("value"), durS.cast("long").as("dur_s"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dur_s")).as("total_s"),
        graft.Micro.round6(graft.Micro.dsumMicro(col("value") * col("dur_s")) /
          sum(col("dur_s"))).as("tw_avg"),
        graft.Micro.round6(graft.Micro.dsumMicro(col("value")) /
          count(lit(1))).as("plain_avg"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "interval_merge" -> intervalMerge,
    "interval_concurrency" -> intervalConcurrency,
    "interval_weighted_avg" -> intervalWeightedAvg
  )

  private val ivSql =
    """SELECT user_id, event_id, event_type,
      |  epoch_us(ts) AS start_us,
      |  epoch_us(ts) + (event_id % 300 + 60) * 1000000 AS end_us
      |FROM events""".stripMargin

  val oracle: Map[String, String] = Map(
    "interval_merge" ->
      s"""WITH iv AS ($ivSql),
         |flag AS (
         |  SELECT *,
         |    CASE WHEN max(end_us) OVER (PARTITION BY user_id
         |           ORDER BY start_us ASC NULLS FIRST, end_us ASC NULLS FIRST,
         |                    event_id ASC NULLS FIRST
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |           OR start_us > max(end_us) OVER (PARTITION BY user_id
         |           ORDER BY start_us ASC NULLS FIRST, end_us ASC NULLS FIRST,
         |                    event_id ASC NULLS FIRST
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS new_island
         |  FROM iv),
         |isl AS (
         |  SELECT *, CAST(sum(new_island) OVER (PARTITION BY user_id
         |    ORDER BY start_us ASC NULLS FIRST, end_us ASC NULLS FIRST,
         |             event_id ASC NULLS FIRST
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
         |  FROM flag)
         |SELECT user_id, island,
         |  min(start_us) AS merged_start_us,
         |  max(end_us) AS merged_end_us,
         |  count(*) AS n_events
         |FROM isl GROUP BY user_id, island
         |ORDER BY user_id ASC NULLS FIRST, island ASC NULLS FIRST""".stripMargin,
    "interval_concurrency" ->
      s"""WITH iv AS ($ivSql),
         |pts AS (
         |  SELECT event_type, start_us AS t, 1 AS delta FROM iv
         |  UNION ALL
         |  SELECT event_type, end_us AS t, -1 AS delta FROM iv),
         |run AS (
         |  SELECT event_type, delta,
         |    sum(delta) OVER (PARTITION BY event_type
         |      ORDER BY t ASC NULLS FIRST, delta ASC NULLS FIRST) AS running
         |  FROM pts)
         |SELECT event_type,
         |  CAST(max(running) AS BIGINT) AS max_concurrent,
         |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals
         |FROM run GROUP BY event_type
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "interval_weighted_avg" ->
      """SELECT event_type,
        |  count(*) AS n_intervals,
        |  CAST(sum(event_id % 300 + 60) AS BIGINT) AS total_s,
        |  round((CAST(sum(CAST(floor((value * (event_id % 300 + 60)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
        |        / sum(event_id % 300 + 60)) * 1000000.0) / 1000000.0 AS tw_avg,
        |  round((CAST(sum(CAST(floor((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)) * 1000000.0) / 1000000.0 AS plain_avg
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin
  )
}
