package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Merge-style sinks (SURVEY.md §2.1 S6–S8).
  *
  * The reference pushes `INSERT … ON CONFLICT DO UPDATE` (agencies
  * `agency.py:26-37`, stops `agency.py:181-190`), `ON CONFLICT DO NOTHING`
  * (`agency.py:221-232`) and bare appends (`agency.py:303-322`) to Postgres.
  * Spark has no native upsert, so the same semantics are expressed as joins:
  * upsert = full-outer join on the key with source-wins resolution;
  * insert-if-absent = left-anti join + union. `upsert` is what
  * `graft.streaming.StreamingOps.TableSink` applies per micro-batch —
  * idempotent re-delivery is exactly what the reference's conflict clauses
  * buy it.
  *
  * Scale note: the source side of a micro-batch merge is small relative to
  * the target; at cluster scale the target must be bucketed/partitioned by
  * the merge key so the join co-locates. BucketedMergeSpec proves the plan:
  * a bucketed target merges with NO Exchange on the target side — only the
  * small source shuffles per batch.
  */
object MergeOps {

  /** S7: insert-or-update. Source rows win wholesale (including NULLs they
    * carry — matching `ON CONFLICT DO UPDATE SET col = EXCLUDED.col`).
    *
    * `nullSafeKeys=true` joins with `<=>` so NULL key components compare
    * equal (the reference's COALESCE-key indexes). For a non-null primary
    * key pass `false`: plain `=` keys let a bucketed target's existing
    * HashPartitioning satisfy the join's distribution, so the merge
    * co-locates and only the (small) source side shuffles — see
    * BucketedMergeSpec for the plan-shape proof.
    */
  def upsert(target: DataFrame, src: DataFrame, keys: Seq[String],
             nullSafeKeys: Boolean = true): DataFrame = {
    val flagged = src.withColumn("_src_present", lit(1))
    val cond = keys.map { k =>
      if (nullSafeKeys) target(k) <=> flagged(k) else target(k) === flagged(k)
    }.reduce(_ && _)
    val joined = target.join(flagged, cond, "full_outer")
    val cols = target.columns.map { c =>
      when(flagged("_src_present").isNotNull, flagged(c)).otherwise(target(c)).as(c)
    }
    joined.select(cols.toIndexedSeq: _*)
  }

  /** S8: insert-if-absent — keep the target's version on key conflict
    * (`ON CONFLICT DO NOTHING`, agency.py:221-232).
    */
  def insertIfAbsent(target: DataFrame, src: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(src.join(target, keys, "left_anti"))

  private def ord(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  // S7 as a graded query: update segment+balance for custkey%3=0, insert brand-new
  // keys for custkey%11=0 (reference upsert shape: agency.py:26-37).
  private val upsertMerge: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    val updates = Tables(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), lit("SEG_NEW").as("c_mktsegment"),
        (col("c_acctbal") + 100).as("c_acctbal"))
    val inserts = Tables(s, dir, "customer").filter(col("c_custkey") % 11 === 0)
      .select((col("c_custkey") + 1000000).as("c_custkey"),
        lit("SEG_INS").as("c_mktsegment"), lit(0.0).as("c_acctbal"))
    ord(upsert(cust, updates.union(inserts), Seq("c_custkey")), "c_custkey")
  }

  // S8 as a graded query: re-delivered window of events against an already-loaded
  // prefix; first version wins on (user_id, ts) (reference: agency.py:221-232).
  private val insertIfAbsentQ: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select("event_id", "user_id", "ts", "event_type", "value")
    val target = ev.filter(col("event_id") < 5000)
    val src = ev.filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
    ord(insertIfAbsent(target, src, Seq("user_id", "ts")), "event_id")
  }

  // S6: append-shaped projection into the vehicle_location sink schema
  // (reference: agency.py:303-322; schema sql/create_tables.sql:116-125).
  private val sinkAppend: Q = (s, dir) =>
    ord(
      Tables(s, dir, "events").select(
        col("event_type").as("service_id"),
        col("user_id").cast("string").as("vehicle_tag"),
        col("ts").as("location_timestamp"),
        (col("value") > 100).as("is_predictable")),
      "vehicle_tag", "location_timestamp", "service_id")

  val queries: Map[String, Q] = Map(
    "upsert_merge" -> upsertMerge,
    "insert_if_absent" -> insertIfAbsentQ,
    "sink_append" -> sinkAppend
  )

  val oracle: Map[String, String] = Map(
    "upsert_merge" ->
      """WITH src AS (
        |  SELECT c_custkey, 'SEG_NEW' AS c_mktsegment, c_acctbal + 100 AS c_acctbal
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'SEG_INS', CAST(0.0 AS DOUBLE)
        |  FROM customer WHERE c_custkey % 11 = 0)
        |SELECT
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_custkey ELSE t.c_custkey END AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
        |FROM customer t FULL JOIN src s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "insert_if_absent" ->
      """WITH tgt AS (
        |  SELECT event_id, user_id, ts, event_type, value FROM events WHERE event_id < 5000),
        |src AS (
        |  SELECT event_id, user_id, ts, event_type, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00')
        |SELECT * FROM tgt
        |UNION ALL
        |SELECT * FROM src s
        |WHERE NOT EXISTS (SELECT 1 FROM tgt WHERE tgt.user_id = s.user_id AND tgt.ts = s.ts)
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "sink_append" ->
      """SELECT event_type AS service_id, CAST(user_id AS VARCHAR) AS vehicle_tag,
        |  ts AS location_timestamp, (value > 100) AS is_predictable
        |FROM events
        |ORDER BY vehicle_tag ASC NULLS FIRST, location_timestamp ASC NULLS FIRST,
        |  service_id ASC NULLS FIRST""".stripMargin
  )
}
