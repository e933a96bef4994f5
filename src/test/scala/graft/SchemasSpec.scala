package graft

import graft.Schemas._
import graft.sources.XmlFeed
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The typed table surface: encoders resolve, nullability matches the DDL's
  * load-bearing NULLs, and the XML parse output converts into the typed
  * Dataset shape end-to-end.
  */
class SchemasSpec extends SparkTestBase {

  test("schemas encode the DDL's nullability") {
    assert(Schemas.service("tag").nullable, "service.tag is nullable (route.py:35-37)")
    assert(Schemas.stop("name").nullable && Schemas.stop("location").nullable,
      "stop name/location nullable (agency.py:160-170)")
    assert(Schemas.vehicleLocation.fieldNames.toSeq ==
      Seq("service_id", "vehicle_tag", "vehicle_location", "location_timestamp", "is_predictable"))
  }

  test("XML services parse converts into the typed Service dataset") {
    val session = spark
    import session.implicits._
    val doc =
      """<body><route tag="N">
        |  <direction tag="N__OB1" title="Outbound" name="Outbound" useForUI="true"/>
        |</route></body>""".stripMargin
    val typed = XmlFeed.parseServices(Seq(doc).toDF("xml"))
      .select(
        sha2(concat_ws("|", col("route_tag"), coalesce(col("tag"), lit(""))), 256).as("service_id"),
        col("route_tag").as("route_id"), col("tag"), col("name"),
        col("direction"), col("use_for_ui"))
      .as[Service]
    val rows = typed.collect().sortBy(_.name)
    assert(rows.length == 2)
    assert(rows.exists(s => s.tag.contains("N__OB1") && s.use_for_ui))
    assert(rows.exists(s => s.tag.isEmpty && !s.use_for_ui), "NULL-tag synthetic row survives typing")
  }

  test("vehicle parse fills the typed VehicleLocation shape with a point struct") {
    val session = spark
    import session.implicits._
    val doc =
      """<body><vehicle id="1412" dirTag="N__OB1" lon="-122.43" lat="37.76" secsSinceReport="9" predictable="true"/>
        |<lastTime time="1554927504000"/></body>""".stripMargin
    val typed = XmlFeed.parseVehicleLocations(Seq(doc).toDF("xml"))
      .select(
        col("dir_tag").as("service_id"),
        col("vehicle_tag"),
        struct(col("lon"), col("lat")).as("vehicle_location"),
        // F1/F2: event time = round(lastTime/1000) − secsSinceReport
        (timestamp_seconds(round(col("last_time").cast("double") / 1000, 0)) -
          make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
            col("secs_since_report"))).as("location_timestamp"),
        col("is_predictable"))
      .as[VehicleLocation]
    val v = typed.collect().head
    assert(v.vehicle_tag == "1412" && v.is_predictable)
    assert(v.vehicle_location.contains(Point(-122.43, 37.76)))
    // instant compare (Timestamp.valueOf would depend on the JVM zone):
    // round(1554927504000/1000) − 9 s = epoch 1554927495
    assert(v.location_timestamp.getTime == 1554927495000L)
  }

  test("Tables.registerAll exposes every table to plain spark.sql with typed columns") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) FROM $n").head().getLong(0) > 0, s"$n must be queryable")
    }
    // the events view must carry the µs-floored TIMESTAMP, not raw nano longs
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType ==
      org.apache.spark.sql.types.TimestampType)
    // graft_* extension functions compose with the views
    assert(spark.sql(
      "SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) FROM embeddings LIMIT 1")
      .head().getDouble(0) > 0.0)
  }
}
