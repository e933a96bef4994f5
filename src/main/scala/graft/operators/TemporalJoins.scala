package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Temporal joins — the two operators every event/feature pipeline needs
  * that Spark has no native form of (the builder brief's custom-operator
  * archetypes: "as-of join, range join"). Both are built by composition
  * (preference (a) in the brief) so they stay inside whole-stage codegen:
  *
  *   - **as-of join** (`asof_join`): each probe row picks up the latest
  *     version row with version-time ≤ probe-time, per key. The naive form
  *     is a non-equi join (quadratic blowup); the scale-honest Spark shape
  *     is UNION + ordered window: tag both sides, union, and carry the last
  *     non-null version value forward with `last(..., ignoreNulls) over
  *     (partitionBy key orderBy (ts, side, seq) rows unbounded preceding)`.
  *     ONE shuffle on the key, zero row blowup, state = one running value
  *     per partition during the sort — the same plan a feature-store
  *     point-in-time join compiles to.
  *
  *   - **range join** (`range_join`): probe ts ∈ [window start, window end).
  *     A raw inequality join degenerates to BroadcastNestedLoop/cartesian;
  *     the scale path buckets time: each window row explodes into the
  *     day-buckets it covers (bounded fan-out = window length / bucket), the
  *     probe derives its single bucket, and the join becomes an EQUI-join on
  *     (key, bucket) with the exact range predicate evaluated as a residual
  *     filter inside the join. This is precisely what a range-join hint does
  *     in engines that have one; PlanShapeSpec asserts no cartesian/BNLJ
  *     node survives in the plan.
  */
object TemporalJoins {

  private val DayMicros = 86400L * 1000000L

  /** As-of join by composition: for each row of `probes`, the value of the
    * latest `versions` row with `vTs <= pTs` on the same `key` (ties on
    * vTs broken by the highest `vSeq` — "last write wins").
    * Output = probe columns + `asofCol` (null when no version precedes).
    *
    * `toleranceMicros` bounds staleness (the pandas `merge_asof` tolerance
    * knob / feature-store TTL): a match older than the tolerance reads as
    * no-match (NULL). The matched version's timestamp rides the SAME
    * ignore-null window as its value, so the bound costs zero extra
    * exchanges — still one shuffle on the key.
    */
  def joinAsOf(probes: DataFrame, versions: DataFrame, key: String,
               pTs: String, vTs: String, vSeq: String, vVal: String,
               asofCol: String, toleranceMicros: Option[Long] = None): DataFrame = {
    val reserved = Seq("_ts", "_side", "_seq", "_vval", "_vtsc")
    val clash = (probes.columns ++ versions.columns).distinct
      .filter(c => reserved.contains(c) || c == asofCol)
    require(clash.isEmpty,
      s"joinAsOf: input/output column name(s) ${clash.mkString(", ")} collide " +
        s"with the operator's internal columns (${reserved.mkString(", ")}) or asofCol")
    val pCols = probes.columns
    // side 0 = version, side 1 = probe: at equal timestamps the version
    // sorts first, so a same-instant version IS visible to the probe (≤).
    val rest = pCols.filterNot(_ == key).toSeq
    val vTagged = versions.select(
      Seq(col(key), col(vTs).as("_ts"), lit(0).as("_side"),
        col(vSeq).cast("long").as("_seq"), col(vVal).as("_vval"),
        col(vTs).as("_vtsc")) ++
        rest.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val pTagged = probes.select(
      Seq(col(key), col(pTs).as("_ts"), lit(1).as("_side"),
        lit(Long.MaxValue).as("_seq"),
        lit(null).cast(versions.schema(vVal).dataType).as("_vval"),
        lit(null).cast(versions.schema(vTs).dataType).as("_vtsc")) ++
        rest.map(col): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("_ts").asc, col("_side").asc, col("_seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = vTagged.unionByName(pTagged)
      .withColumn(asofCol, last(col("_vval"), ignoreNulls = true).over(w))
      .withColumn("_vtsc", last(col("_vtsc"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = toleranceMicros match {
      case Some(t) => carried.withColumn(asofCol,
        when(unix_micros(col("_ts")) - unix_micros(col("_vtsc")) <= t, col(asofCol)))
      case None => carried
    }
    bounded.select(pCols.toSeq.map(col) :+ col(asofCol): _*)
  }

  /** Range join by time-bucketing: rows of `probes` matched to every
    * `windows` row on the same `key` whose [wStart, wEnd) interval contains
    * the probe's `pTs`. `bucketMicros` is the bucketing granularity — keep
    * it ≥ the typical window length so fan-out stays ~O(1) per window.
    *
    * Guards (both data-driven, evaluated inside the plan, fail loud):
    *   - empty/negative windows (`wEnd <= wStart`) are dropped before the
    *     explode — they can match nothing, and Spark's `sequence` would
    *     otherwise generate a DESCENDING bucket list for them;
    *   - a window spanning more than `maxFanoutBuckets` buckets raises at
    *     execution rather than silently exploding ×(span/bucket) rows (a
    *     year-long window at day buckets is ×365 per row) — raise
    *     `bucketMicros` toward the window-length scale instead.
    */
  def joinRange(probes: DataFrame, windows: DataFrame, key: String,
                pTs: String, wStart: String, wEnd: String,
                bucketMicros: Long = DayMicros,
                maxFanoutBuckets: Int = 64): DataFrame = {
    require(bucketMicros > 0 && maxFanoutBuckets >= 1)
    val firstBucket = floor(unix_micros(col(wStart)) / bucketMicros)
    // end is exclusive: the last covered bucket holds wEnd − 1µs
    val lastBucket = floor((unix_micros(col(wEnd)) - 1) / bucketMicros)
    val span = lastBucket - firstBucket + 1
    // the guard lives INSIDE the sequence bound (adds 0 or raises), so
    // column pruning can never optimize it away
    val guardedLast = lastBucket +
      when(span <= maxFanoutBuckets, lit(0L)).otherwise(
        raise_error(concat(
          lit(s"joinRange: window spans more than $maxFanoutBuckets buckets ("),
          span, lit(s") — raise bucketMicros (=$bucketMicros) toward the window length")
        ).cast("string")).cast("bigint"))
    val wBucketed = windows
      .filter(col(wEnd) > col(wStart))
      .withColumn("_bucket", explode(sequence(firstBucket, guardedLast)))
    val pBucketed = probes.withColumn("_bucket",
      floor(unix_micros(col(pTs)) / bucketMicros))
    pBucketed.join(wBucketed, Seq(key, "_bucket"))
      .filter(col(pTs) >= col(wStart) && col(pTs) < col(wEnd))
      .drop("_bucket")
  }

  // ---- graded queries over testdata ----

  // asof_join: every 20th event is a "dimension version" for its user; each
  // event resolves the version value in force at its timestamp.
  private val asofJoin: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select("event_id", "user_id", "ts", "value")
    val vers = Tables(s, dir, "events").filter(col("event_id") % 20 === 0)
      .select(col("user_id"), col("ts").as("vts"), col("event_id").as("vid"),
        col("value").as("vvalue"))
    joinAsOf(ev, vers, key = "user_id", pTs = "ts",
        vTs = "vts", vSeq = "vid", vVal = "vvalue", asofCol = "asof_value")
      .orderBy(col("event_id").asc_nulls_first)
  }

  // range_join: signup events open a 2-day window per user; every event of
  // that user landing inside the window pairs with it.
  private val rangeJoin: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select("event_id", "user_id", "ts")
    val wins = Tables(s, dir, "events").filter(col("event_type") === "signup")
      .select(col("event_id").as("win_id"), col("user_id"), col("ts").as("ws"),
        (col("ts") + expr("INTERVAL 2 DAYS")).as("we"))
    joinRange(ev, wins, key = "user_id", pTs = "ts", wStart = "ws", wEnd = "we")
      .select("event_id", "win_id", "user_id", "ts")
      .orderBy(col("event_id").asc_nulls_first, col("win_id").asc_nulls_first)
  }

  // asof_tolerance: the same resolution bounded to versions at most 6 hours
  // old — a version in force but staler than the TTL reads as no-match
  // (feature-store freshness semantics). Same one-shuffle plan.
  private val TolMicros = 6L * 3600 * 1000000
  private val asofTolerance: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select("event_id", "user_id", "ts", "value")
    val vers = Tables(s, dir, "events").filter(col("event_id") % 20 === 0)
      .select(col("user_id"), col("ts").as("vts"), col("event_id").as("vid"),
        col("value").as("vvalue"))
    joinAsOf(ev, vers, key = "user_id", pTs = "ts",
        vTs = "vts", vSeq = "vid", vVal = "vvalue", asofCol = "asof_value",
        toleranceMicros = Some(TolMicros))
      .orderBy(col("event_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "asof_join" -> asofJoin,
    "asof_tolerance" -> asofTolerance,
    "range_join" -> rangeJoin
  )

  val oracle: Map[String, String] = Map(
    // the oracle states the SEMANTICS (correlated latest-version lookup);
    // the Spark side is graded on producing it with the one-shuffle plan
    "asof_join" ->
      """WITH vers AS (
        |  SELECT user_id, ts AS vts, event_id AS vid, value AS vvalue
        |  FROM events WHERE event_id % 20 = 0)
        |SELECT e.event_id, e.user_id, e.ts, e.value,
        |  (SELECT v.vvalue FROM vers v
        |   WHERE v.user_id = e.user_id AND v.vts <= e.ts
        |   ORDER BY v.vts DESC, v.vid DESC LIMIT 1) AS asof_value
        |FROM events e
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "asof_tolerance" ->
      """WITH vers AS (
        |  SELECT user_id, ts AS vts, event_id AS vid, value AS vvalue
        |  FROM events WHERE event_id % 20 = 0)
        |SELECT e.event_id, e.user_id, e.ts, e.value,
        |  (SELECT v.vvalue FROM vers v
        |   WHERE v.user_id = e.user_id AND v.vts <= e.ts
        |     AND v.vts >= e.ts - INTERVAL 6 HOUR
        |   ORDER BY v.vts DESC, v.vid DESC LIMIT 1) AS asof_value
        |FROM events e
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "range_join" ->
      """WITH w AS (
        |  SELECT event_id AS win_id, user_id, ts AS ws, ts + INTERVAL 2 DAY AS we
        |  FROM events WHERE event_type = 'signup')
        |SELECT e.event_id, w.win_id, e.user_id, e.ts
        |FROM events e JOIN w ON e.user_id = w.user_id AND e.ts >= w.ws AND e.ts < w.we
        |ORDER BY event_id ASC NULLS FIRST, win_id ASC NULLS FIRST""".stripMargin
  )
}
