package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Behavioral / product analytics over the event stream — the funnel and
  * retention primitives every event-analytics engine ships (the reference's
  * vehicle pipeline is itself an event stream; these are the analyses its
  * warehouse consumers run downstream).
  *
  * Scale design: both operators key every exchange on `user_id` — the
  * natural partitioning of behavioral data. The funnel's three stage
  * aggregates and their stitching joins all hash on user_id, so Catalyst
  * reuses one exchange per side and no stage ever sees more than one row
  * per (user, stage). Retention first collapses events to DISTINCT
  * (user, week) — O(users × active weeks), the standard pre-aggregation
  * that keeps the cohort matrix small no matter how hot a user's event
  * volume is. No windows over raw events, no broadcast of anything
  * user-proportional.
  */
object Behavioral {

  private def ord(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  // ---- funnel_steps: strict-order conversion funnel ------------------------
  //
  // view → click → purchase, each step's timestamp strictly after the
  // previous step's: t1 = first view, t2 = first click after t1, t3 = first
  // purchase after t2 (the "conditional funnel" — a click before the first
  // view does not count). Users enter at step 1; t3 non-null implies t2
  // non-null by construction, so `steps` is the consecutive count.
  private val funnelSteps: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select("user_id", "event_type", "ts")
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    ord(
      s1.join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          (lit(1L) + when(col("t2").isNotNull, 1L).otherwise(0L)
            + when(col("t3").isNotNull, 1L).otherwise(0L)).as("steps")),
      "user_id")
  }

  // ---- retention_cohorts: weekly cohort retention matrix -------------------
  //
  // Cohort = a user's first active epoch-week; cell (cohort, k) = distinct
  // users of that cohort active k weeks later. Epoch-week = integer
  // micros-since-epoch DIV one week — engine-agnostic arithmetic, no
  // calendar/locale semantics to diverge on.
  private val WeekMicros = 604800000000L
  private val retentionCohorts: Q = (s, dir) => {
    val act = Tables(s, dir, "events")
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekMicros").as("wk"))
      .distinct()
    val first = act.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    ord(
      act.join(first, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users")),
      "cohort_wk", "week_offset")
  }

  // ---- rolling_active_users: daily actives + trailing-7-day actives ------
  //
  // The product-metrics staple (DAU / rolling WAU) that Spark windows cannot
  // express (no DISTINCT inside a window frame): instead each DISTINCT
  // (user, day) activity row SERVES the 7 calendar days it keeps the user
  // "active within trailing 7" for — a bounded ×7 map-side explode — and the
  // per-day count(distinct user) collapses the grid. Days = integer
  // epoch-day arithmetic (engine-agnostic); only days that actually appear
  // in the data are reported.
  //
  // Scale: activity pre-collapses to DISTINCT (user, day) first — O(users ×
  // active days) regardless of event volume — then the ×7 fan-out and two
  // partial-aggregated count-distinct exchanges keyed on the day. Nothing
  // user-proportional broadcasts; the day-grid semi-join is a ≤(days)-row
  // broadcast.
  private val DayMicros = 86400000000L
  private val rollingActiveUsers: Q = (s, dir) => {
    val act = Tables(s, dir, "events")
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayMicros").as("day"))
      .distinct()
    val days = act.select(col("day")).distinct()
    val wau = act
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
      .join(days, Seq("day"), "left_semi") // only report observed days
      .groupBy("day").agg(count_distinct(col("user_id")).as("wau_7d"))
    val dau = act.groupBy("day").agg(count_distinct(col("user_id")).as("dau"))
    ord(dau.join(wau, Seq("day")).select("day", "dau", "wau_7d"), "day")
  }

  // ---- path_transitions: the event-type Markov transition matrix ---------
  //
  // Consecutive event pairs per user (ordered by ts with event_id as the
  // deterministic tiebreak) aggregated to (from, to) counts plus the row-
  // normalized transition probability — the path-analysis substrate (where
  // do users go after a click?). One user-keyed sort for the lead(), then a
  // partial-aggregated exchange on the (from, to) pair; the per-from
  // normalizing total rides a window over the ALREADY (from,to)-aggregated
  // frame — |types|² rows, noise. p = n/total is one BIGINT division per
  // output row, rounded so engine double formatting cannot drift.
  private val pathTransitions: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val wFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    ord(
      pairs.groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n") / sum(col("n")).over(wFrom), 6)),
      "from_type", "to_type")
  }

  // ---- user_growth: hourly new users + cumulative user count --------------
  //
  // "Cumulative distinct" — not expressible as a window DISTINCT — via the
  // standard two-step: collapse each user to their FIRST active hour (one
  // user-keyed partial-aggregated exchange), count arrivals per hour, then
  // a running sum. The running-sum window is global (no partition key) but
  // runs over the HOUR-GRANULAR aggregate — rows bounded by the calendar,
  // not the corpus — so the single-partition frame is a few thousand rows
  // at any scale. Only hours with arrivals appear.
  private val HourMicros = 3600000000L
  private val userGrowth: Q = (s, dir) => {
    val firstHour = Tables(s, dir, "events")
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $HourMicros").as("hr"))
      .groupBy("user_id").agg(min(col("hr")).as("hr"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("hr").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    firstHour.groupBy("hr").agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(wCum))
      .orderBy(col("hr").asc_nulls_first)
  }

  // ---- attribution_touch: first/last-touch marketing attribution ----------
  //
  // Each purchase is attributed to the FIRST and LAST non-purchase event of
  // the same user inside a trailing 3-day lookback — the two classic
  // attribution models, in one pass over a single user-keyed event-time
  // RANGE frame, so both models ride ONE exchange and there is no
  // per-purchase join. The bookends are min/max of an ORDERED STRUCT
  // (us, event_id, event_type), NOT positional first/last: a RANGE frame
  // cannot carry a tiebreak column, and positional bookends among
  // same-microsecond peers would be partition-order-dependent — min/max
  // are order-free, so ties resolve by event_id identically on every
  // engine and every rerun. Purchases with an empty lookback attribute to
  // NULL (organic).
  private val LookbackMicros = 3L * 86400000000L
  private val attributionTouch: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("us").asc)
      .rangeBetween(-LookbackMicros, -1)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("us"), col("event_id"), col("event_type")))
    ord(
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("first_touch", min(touch).over(w).getField("event_type"))
        .withColumn("last_touch", max(touch).over(w).getField("event_type"))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("first_touch"), col("last_touch")),
      "event_id")
  }

  val queries: Map[String, Q] = Map(
    "funnel_steps" -> funnelSteps,
    "retention_cohorts" -> retentionCohorts,
    "rolling_active_users" -> rollingActiveUsers,
    "path_transitions" -> pathTransitions,
    "user_growth" -> userGrowth,
    "attribution_touch" -> attributionTouch
  )

  val oracle: Map[String, String] = Map(
    "funnel_steps" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT s1.user_id, t1, t2, t3,
        |  1 + CAST(t2 IS NOT NULL AS BIGINT) + CAST(t3 IS NOT NULL AS BIGINT) AS steps
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "rolling_active_users" ->
      s"""WITH act AS (
         |  SELECT DISTINCT user_id, epoch_us(ts) // $DayMicros AS day FROM events),
         |days AS (SELECT DISTINCT day FROM act),
         |served AS (
         |  SELECT user_id, unnest(range(day, day + 7)) AS day FROM act),
         |wau AS (
         |  SELECT s.day, count(DISTINCT s.user_id) AS wau_7d
         |  FROM served s JOIN days USING (day) GROUP BY s.day),
         |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM act GROUP BY day)
         |SELECT day, dau, wau_7d FROM dau JOIN wau USING (day)
         |ORDER BY day ASC NULLS FIRST""".stripMargin,
    "attribution_touch" ->
      s"""SELECT event_id, user_id, first_touch, last_touch FROM (
         |  SELECT event_id, user_id, event_type,
         |    (min(CASE WHEN event_type <> 'purchase'
         |          THEN {'us': epoch_us(ts), 'id': event_id, 'typ': event_type} END)
         |      OVER w).typ AS first_touch,
         |    (max(CASE WHEN event_type <> 'purchase'
         |          THEN {'us': epoch_us(ts), 'id': event_id, 'typ': event_type} END)
         |      OVER w).typ AS last_touch
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC
         |               RANGE BETWEEN $LookbackMicros PRECEDING AND 1 PRECEDING))
         |WHERE event_type = 'purchase'
         |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "user_growth" ->
      s"""WITH fh AS (
         |  SELECT user_id, min(epoch_us(ts) // $HourMicros) AS hr
         |  FROM events GROUP BY user_id),
         |np AS (SELECT hr, count(*) AS n_new FROM fh GROUP BY hr)
         |SELECT hr, n_new,
         |  CAST(sum(n_new) OVER (ORDER BY hr ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
         |FROM np
         |ORDER BY hr ASC NULLS FIRST""".stripMargin,
    "path_transitions" ->
      """WITH pairs AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT), 6) AS p
        |FROM m
        |ORDER BY from_type ASC NULLS FIRST, to_type ASC NULLS FIRST""".stripMargin,
    "retention_cohorts" ->
      s"""WITH act AS (
         |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekMicros AS wk FROM events),
         |first AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id)
         |SELECT cohort_wk, wk - cohort_wk AS week_offset,
         |  count(DISTINCT user_id) AS n_users
         |FROM act JOIN first USING (user_id)
         |GROUP BY 1, 2
         |ORDER BY cohort_wk ASC NULLS FIRST, week_offset ASC NULLS FIRST""".stripMargin
  )
}
