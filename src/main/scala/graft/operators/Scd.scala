package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Slowly-changing-dimension (SCD type 2) history construction.
  *
  * The reference already stores one SCD-lite table: `service_stop_order`
  * versions every change by `update_timestamp` (create_tables.sql:95-110,
  * schema comment "In case this changes day-to-day"), but leaves reads to
  * reconstruct validity by hand. This operator builds the explicit SCD2 form
  * a warehouse consumer wants: one row per (key, attribute era) with
  * `[valid_from, valid_to)` bounds, a version number, and an is_current flag
  * — from a plain change stream, in one pass.
  *
  * Scale design: every window partitions by the dimension key with the same
  * ordering, so the whole build is ONE hash exchange on the key + one sort —
  * Catalyst chains the lag (echo-collapse), lead (era close), and row_number
  * (version) windows over a single shuffle. No joins, nothing broadcast,
  * state per key is its change count. At 100 TB the change stream shards by
  * key exactly like the dedup/merge operators (S7/A2) do.
  */
object Scd {

  /** Build SCD2 history from a change stream.
    *
    * @param changes one row per observed change record
    * @param key     dimension key column
    * @param tsCol   change timestamp column (era boundary)
    * @param tieCol  deterministic tiebreak for same-timestamp changes
    * @param attrCol the tracked attribute
    *
    * Semantics: per key, order by (tsCol, tieCol); collapse consecutive
    * duplicates (a change record repeating the current value opens no new
    * era — the standard CDC echo); each surviving change opens an era at its
    * timestamp, closed half-open by the next era's start (`lead`); the last
    * era per key is current (valid_to NULL).
    */
  def buildScd2(changes: DataFrame, key: String, tsCol: String,
                tieCol: String, attrCol: String,
                carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc_nulls_first, col(tieCol).asc_nulls_first)
    changes
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      // null-safe inequality: the first change per key (prev NULL) always opens
      .filter(!(col(attrCol) <=> col("_prev")))
      .drop("_prev")
      .select(
        col(key) +:
        row_number().over(w).cast("long").as("version") +:
        col(attrCol) +:
        col(tsCol).as("valid_from") +:
        lead(col(tsCol), 1).over(w).as("valid_to") +:
        // carry: extra columns of the era-opening change row (e.g. the
        // tiebreak id, so an incremental merge can REPLAY eras as change
        // records with the original ordering intact)
        carry.map(col): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  private val scd2Build: Q = (s, dir) =>
    buildScd2(
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
      key = "user_id", tsCol = "ts", tieCol = "event_id", attrCol = "event_type")
      .orderBy(col("user_id").asc_nulls_first, col("version").asc_nulls_first)

  // Point-in-time dimension lookup — buildScd2 composed with the as-of join
  // (the feature-store pattern: "resolve each fact against the dimension as
  // it was at fact time"). Probes are the purchase events, looked up ONE HOUR
  // BEFORE their timestamp ("what state was the user in approaching the
  // purchase" — the attribution question; NULL when the purchase falls inside
  // the user's first hour). Plan: the era build is one exchange on the key,
  // the as-of resolution is joinAsOf's union + ordered window — one more
  // exchange on the same key, zero row blowup (no non-equi join anywhere).
  private val scd2PointInTime: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val eras = buildScd2(
      ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
      key = "user_id", tsCol = "ts", tieCol = "event_id", attrCol = "event_type")
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("lookup_ts"))
    TemporalJoins.joinAsOf(probes, eras, key = "user_id", pTs = "lookup_ts",
        vTs = "valid_from", vSeq = "version", vVal = "event_type",
        asofCol = "attr_before")
      .select("event_id", "user_id", "ts", "attr_before")
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** INCREMENTAL SCD2 maintenance, graded: fold a new change batch into a
    * standing history without rebuilding unchanged keys. The standing table
    * holds pre-cutoff eras (carrying each era's opening tiebreak id); the
    * batch is everything after. Untouched keys pass through VERBATIM (anti
    * join); touched keys replay their surviving eras — an era row IS its
    * surviving change record — unioned with the batch through the same era
    * build. Replaying survivors is sound because echo-collapse is
    * idempotent over its own survivors, and a batch row echoing the key's
    * last era still collapses (lag sees it). Cost: O(touched keys' history
    * + batch) through two key exchanges, never O(dimension) — the
    * incremental-fold-equals-recompute contract (IncrementalAggSpec's
    * invariant) applied to dimension history, and the hash grades exactly
    * that: the output must equal the full rebuild over all changes, which
    * is the scd2_build oracle itself.
    */
  private val scd2Merge: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val cut = lit("2024-01-20 00:00:00").cast("timestamp")
    val hist = buildScd2(ev.filter(col("ts") < cut),
      key = "user_id", tsCol = "ts", tieCol = "event_id",
      attrCol = "event_type", carry = Seq("event_id"))
    val batch = ev.filter(col("ts") >= cut)
    val touched = batch.select("user_id").distinct()
    val replayed = hist.join(touched, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("valid_from").as("ts"),
        col("event_id"), col("event_type"))
    val rebuilt = buildScd2(replayed.unionByName(batch),
      key = "user_id", tsCol = "ts", tieCol = "event_id", attrCol = "event_type")
    hist.join(touched, Seq("user_id"), "left_anti").drop("event_id")
      .unionByName(rebuilt)
      .orderBy(col("user_id").asc_nulls_first, col("version").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "scd2_build" -> scd2Build,
    "scd2_point_in_time" -> scd2PointInTime,
    "scd2_merge" -> scd2Merge
  )

  val oracle: Map[String, String] = Map(
    "scd2_build" ->
      """WITH ord AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, ts, event_id, event_type FROM ord
        |       WHERE event_type IS DISTINCT FROM prev)
        |SELECT user_id,
        |  row_number() OVER w AS version,
        |  event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
        |ORDER BY user_id ASC NULLS FIRST, version ASC NULLS FIRST""".stripMargin,
    // incremental == full rebuild: the oracle IS the scd2_build recursion
    // over all changes — any divergence in the touched/untouched split, the
    // era replay, or the cross-cutoff echo collapse breaks the hash
    "scd2_merge" ->
      """WITH ord AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, ts, event_id, event_type FROM ord
        |       WHERE event_type IS DISTINCT FROM prev)
        |SELECT user_id,
        |  row_number() OVER w AS version,
        |  event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
        |ORDER BY user_id ASC NULLS FIRST, version ASC NULLS FIRST""".stripMargin,
    // the oracle states the semantics (correlated latest-era lookup); the
    // Spark side is graded on producing it with the union+window plan
    "scd2_point_in_time" ->
      """WITH ord AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS prev
        |  FROM events),
        |eras AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS version,
        |    event_type, ts AS valid_from
        |  FROM ord WHERE event_type IS DISTINCT FROM prev)
        |SELECT p.event_id, p.user_id, p.ts,
        |  (SELECT e.event_type FROM eras e
        |   WHERE e.user_id = p.user_id AND e.valid_from <= p.ts - INTERVAL 1 HOUR
        |   ORDER BY e.valid_from DESC, e.version DESC LIMIT 1) AS attr_before
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin
  )
}
