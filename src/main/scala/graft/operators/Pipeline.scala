package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** The reference's hot path (SURVEY.md §3.2, `update_vehicle_locations`) as one
  * declarative pipeline: resolve the fact stream against dimensions through a
  * two-level broadcast-lookup fallback chain (`route.py:183-194`), drop the
  * unresolvable rows, reconstruct event time as ingest-time − lag
  * (`route.py:202`), dedup deterministically on the sink key
  * (`agency.py:316-317`), and project the sink schema
  * (`sql/create_tables.sql:116-125`).
  *
  * Physical shape at scale: two broadcast hash joins (no fact shuffle), one
  * hash-partitioned exchange for the window dedup — the minimum possible: the
  * dedup key is the only operation that genuinely requires co-location.
  */
object Pipeline {

  def vehicleHotPath(s: SparkSession, dir: String): DataFrame = {
    val primary = Tables(s, dir, "customer").filter(col("c_custkey") < 8)
      .select(col("c_custkey").as("pk"), col("c_name").as("primary_name"))
    val fallback = Tables(s, dir, "nation").filter(col("n_nationkey") < 12)
      .select(col("n_nationkey").as("fk"), col("n_name").as("fallback_name"))
    val w = Window.partitionBy("service", "user_id", "event_ts")
      .orderBy(col("event_id").asc)
    Tables(s, dir, "events")
      .join(broadcast(primary), col("user_id") === col("pk"), "left")
      .join(broadcast(fallback), col("user_id") === col("fk"), "left")
      .withColumn("service", coalesce(col("primary_name"), col("fallback_name")))
      .filter(col("service").isNotNull)
      .withColumn("event_ts",
        timestamp_micros(unix_micros(col("ts")) - round(col("value") * lit(1000000.0)).cast("long")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("service"),
        col("user_id").cast("string").as("vehicle_tag"),
        col("event_ts"),
        (col("value") > 100).as("is_predictable"))
      .orderBy(col("service").asc_nulls_first, col("vehicle_tag").asc_nulls_first,
        col("event_ts").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "pipeline_hotpath" -> (vehicleHotPath(_, _))
  )

  val oracle: Map[String, String] = Map(
    "pipeline_hotpath" ->
      """WITH resolved AS (
        |  SELECT e.event_id, e.user_id, e.value,
        |    COALESCE(p.c_name, f.n_name) AS service,
        |    make_timestamp(epoch_us(ts) - CAST(round(value * 1000000.0) AS BIGINT)) AS event_ts
        |  FROM events e
        |  LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 8) p
        |    ON e.user_id = p.c_custkey
        |  LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 12) f
        |    ON e.user_id = f.n_nationkey
        |  WHERE COALESCE(p.c_name, f.n_name) IS NOT NULL),
        |deduped AS (
        |  SELECT *, row_number() OVER (PARTITION BY service, user_id, event_ts
        |    ORDER BY event_id ASC) AS rn
        |  FROM resolved)
        |SELECT service, CAST(user_id AS VARCHAR) AS vehicle_tag, event_ts,
        |  (value > 100) AS is_predictable
        |FROM deduped WHERE rn = 1
        |ORDER BY service ASC NULLS FIRST, vehicle_tag ASC NULLS FIRST,
        |  event_ts ASC NULLS FIRST""".stripMargin
  )
}
