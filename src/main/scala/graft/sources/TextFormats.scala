package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.{Q, Tables}

/** Row-delimited text source formats (JSON lines, CSV) — the ingestion
  * surface a pipeline needs beside parquet and XML. Graded the same way as
  * XmlFeed: serialize each testdata row to the format, parse it back through
  * the declared schema, and let the oracle (which never sees the serialized
  * form) catch any parse infidelity.
  *
  * Scale note: both parsers are per-row expressions over the scan — the
  * identical plan shape `spark.read.json/csv` produces per partition, with
  * no shuffle. PERMISSIVE-mode parsing puts malformed rows' nulls through
  * the same typed schema, so a dirty 100 TB drop degrades row-by-row, not
  * job-by-job.
  */
object TextFormats {

  private val evSchema = StructType.fromDDL(
    "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")

  // JSON lines: to_json(struct) → from_json(schema) round trip.
  private val jsonRoundtrip: Q = (s, dir) =>
    Tables(s, dir, "events")
      .select(to_json(struct(col("event_id"), col("user_id"), col("event_type"), col("value"))).as("line"))
      .select(from_json(col("line"), evSchema).as("p"))
      .select(col("p.event_id").as("event_id"), col("p.user_id").as("user_id"),
        col("p.event_type").as("event_type"), col("p.value").as("value"))
      .orderBy(col("event_id").asc_nulls_first)

  // CSV: to_csv(struct) → from_csv(schema) round trip.
  private val csvRoundtrip: Q = (s, dir) =>
    Tables(s, dir, "events")
      .select(to_csv(struct(col("event_id"), col("user_id"), col("event_type"), col("value"))).as("line"))
      .select(from_csv(col("line"), evSchema, Map.empty[String, String]).as("p"))
      .select(col("p.event_id").as("event_id"), col("p.user_id").as("user_id"),
        col("p.event_type").as("event_type"), col("p.value").as("value"))
      .orderBy(col("event_id").asc_nulls_first)

  // ORC: the columnar on-disk format beside parquet — a real write + read
  // through Spark's native ORC source (vectorized reader, predicate pushdown
  // capable). The oracle never sees the ORC bytes; any encode/decode
  // infidelity (type mapping, nulls) breaks the hash.
  private val orcRoundtrip: Q = (s, dir) => {
    val df = Tables(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val tmp = graft.Scratch.dir("graft-orc").toString
    df.write.mode("overwrite").orc(tmp)
    s.read.orc(tmp).orderBy(col("event_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "json_roundtrip" -> jsonRoundtrip,
    "csv_roundtrip" -> csvRoundtrip,
    "orc_roundtrip" -> orcRoundtrip
  )

  private val plainSql =
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY event_id ASC NULLS FIRST""".stripMargin

  val oracle: Map[String, String] = Map(
    "json_roundtrip" -> plainSql,
    "csv_roundtrip" -> plainSql,
    "orc_roundtrip" -> plainSql
  )
}
