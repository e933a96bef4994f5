package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.{Q, Tables}

/** XML feed ingestion (SURVEY §2.1 S1–S3, §2.2 G1) — the reference's one
  * genuinely non-SQL operator family: NextBus XML documents → rows.
  *
  * The reference pulls four document shapes (FIXTURES.md §A.2) and walks
  * them with ElementTree (`agency.py:19-23`, `route.py:27-34,64-71,124-127,
  * 156-204`). Here each shape is a declared `StructType` fed to Spark 4's
  * native `from_xml` (attributes surface with an `_` prefix), then
  * `posexplode` turns repeated elements into rows with their document
  * position — the reference's implicit "document order" (stop_order) made
  * explicit and deterministic under parallelism.
  *
  * Scale design: parsing is per-row expression work over the scan of a
  * document table (no UDF, no shuffle); ordering windows partition by the
  * natural parent key (route/direction), so a 100 TB crawl of documents
  * parallelizes by document with one bounded exchange per ordering.
  */
object XmlFeed {

  // ---- feed schemas (attributes carry the parser's `_` prefix) ----

  /** agencyList: <body><agency tag title regionTitle/>…</body> (agency.py:19-23) */
  val agencyListSchema: StructType = StructType.fromDDL(
    "agency ARRAY<STRUCT<`_tag`: STRING, `_title`: STRING, `_regionTitle`: STRING>>")

  /** routeList: <body><route tag title/>…</body> (agency.py:51-56) */
  val routeListSchema: StructType = StructType.fromDDL(
    "route ARRAY<STRUCT<`_tag`: STRING, `_title`: STRING>>")

  /** routeConfig (verbose): body stops + directions with ordered stop refs
    * (route.py:27-34 directions; :64-71 body stops; :124-127 per-direction
    * ordered refs). */
  val routeConfigSchema: StructType = StructType.fromDDL(
    """route STRUCT<
      |  `_tag`: STRING,
      |  stop: ARRAY<STRUCT<`_tag`: STRING, `_title`: STRING, `_lon`: DOUBLE, `_lat`: DOUBLE>>,
      |  direction: ARRAY<STRUCT<
      |    `_tag`: STRING, `_title`: STRING, `_name`: STRING, `_useForUI`: STRING,
      |    stop: ARRAY<STRUCT<`_tag`: STRING>>>>
      |>""".stripMargin)

  /** vehicleLocations: vehicles + the next-poll offset element
    * (route.py:156-204; lastTime extraction :161-170). */
  val vehicleLocationsSchema: StructType = StructType.fromDDL(
    """vehicle ARRAY<STRUCT<
      |  `_id`: STRING, `_dirTag`: STRING, `_lon`: DOUBLE, `_lat`: DOUBLE,
      |  `_secsSinceReport`: DOUBLE, `_predictable`: STRING>>,
      |lastTime STRUCT<`_time`: STRING>""".stripMargin)

  // ---- parsers: Dataset[xml: String] → reference-table rows ----

  /** S1/G1/G2: agencyList document → (tag, title, region) rows. */
  def parseAgencyList(docs: DataFrame, xmlCol: String = "xml"): DataFrame =
    docs.select(from_xml(col(xmlCol), agencyListSchema).as("b"))
      .select(explode(col("b.agency")).as("a"))
      .select(col("a._tag").as("tag"), col("a._title").as("title"),
        col("a._regionTitle").as("region"))

  /** S2: routeList document → (tag, title) rows per agency. */
  def parseRouteList(docs: DataFrame, agencyCol: String, xmlCol: String = "xml"): DataFrame =
    docs.select(col(agencyCol).as("agency_tag"), from_xml(col(xmlCol), routeListSchema).as("b"))
      .select(col("agency_tag"), explode(col("b.route")).as("r"))
      .select(col("agency_tag"), col("r._tag").as("tag"), col("r._title").as("title"))

  /** S3 part 1: routeConfig body stops (route.py:64-71). */
  def parseBodyStops(docs: DataFrame, xmlCol: String = "xml"): DataFrame =
    docs.select(from_xml(col(xmlCol), routeConfigSchema).as("b"))
      .select(col("b.route._tag").as("route_tag"), explode(col("b.route.stop")).as("s"))
      .select(col("route_tag"), col("s._tag").as("tag"), col("s._title").as("name"),
        col("s._lon").as("lon"), col("s._lat").as("lat"))

  /** S3 part 2: directions → services, including the reference's synthetic
    * NULL-tag "not running a service" row per route (route.py:35-37, G5). */
  def parseServices(docs: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val parsed = docs.select(from_xml(col(xmlCol), routeConfigSchema).as("b"))
    val dirs = parsed
      .select(col("b.route._tag").as("route_tag"), explode(col("b.route.direction")).as("d"))
      .select(col("route_tag"), col("d._tag").as("tag"), col("d._title").as("name"),
        col("d._name").as("direction"), (col("d._useForUI") === "true").as("use_for_ui"))
    val notRunning = parsed.select(
      col("b.route._tag").as("route_tag"), lit(null).cast("string").as("tag"),
      lit("not running a service").as("name"), lit(null).cast("string").as("direction"),
      lit(false).as("use_for_ui"))
    dirs.unionByName(notRunning)
  }

  /** S3 part 3 / W1: per-direction ordered stop refs → stop_order 1..n in
    * document order (route.py:121-128). */
  def parseStopOrders(docs: DataFrame, xmlCol: String = "xml"): DataFrame =
    docs.select(from_xml(col(xmlCol), routeConfigSchema).as("b"))
      .select(col("b.route._tag").as("route_tag"), explode(col("b.route.direction")).as("d"))
      .select(col("route_tag"), col("d._tag").as("direction_tag"),
        posexplode(col("d.stop")).as(Seq("pos", "sref")))
      .select(col("route_tag"), col("direction_tag"),
        col("sref._tag").as("stop_tag"), (col("pos") + 1).as("stop_order"))

  /** J3: stop tags referenced anywhere in the doc but absent from the body —
    * the "missing stops" the reference backfills (route.py:76-78). */
  def missingStops(docs: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val refs = parseStopOrders(docs, xmlCol).select(col("route_tag"), col("stop_tag").as("tag")).distinct()
    val body = parseBodyStops(docs, xmlCol).select(col("route_tag"), col("tag")).distinct()
    refs.join(body, Seq("route_tag", "tag"), "left_anti")
  }

  /** S4: vehicleLocations → vehicle rows; offset column carries the
    * response's lastTime with the missing→'0' edge (route.py:161-170). */
  def parseVehicleLocations(docs: DataFrame, xmlCol: String = "xml"): DataFrame =
    docs.select(from_xml(col(xmlCol), vehicleLocationsSchema).as("b"))
      .select(coalesce(col("b.lastTime._time"), lit("0")).as("last_time"),
        explode_outer(col("b.vehicle")).as("v"))
      .select(col("v._id").as("vehicle_tag"), col("v._dirTag").as("dir_tag"),
        col("v._lon").as("lon"), col("v._lat").as("lat"),
        col("v._secsSinceReport").as("secs_since_report"),
        (col("v._predictable") === "true").as("is_predictable"),
        col("last_time"))

  // ---- graded queries: XML generate→parse roundtrips over testdata ----

  // S1/G2 as a graded row: each event serialized as an attribute bag and
  // parsed back; the oracle never sees XML — it just projects the source
  // columns, so any parse infidelity breaks the hash.
  private val xmlRoundtrip: Q = (s, dir) => {
    val xml = concat(
      lit("<event id=\""), col("event_id"),
      lit("\" user=\""), col("user_id"),
      lit("\" type=\""), col("event_type"), lit("\"/>"))
    val schema = StructType.fromDDL("`_id` BIGINT, `_user` BIGINT, `_type` STRING")
    Tables(s, dir, "events")
      .select(from_xml(xml, schema).as("p"))
      .select(col("p._id").as("event_id"), col("p._user").as("user_id"),
        col("p._type").as("event_type"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  // G1/W1 as a graded row: one document per user holding its events as
  // ordered child elements; parse + posexplode must reproduce the document
  // order as seq 1..n (the stop_order contract).
  private val xmlExplodeOrder: Q = (s, dir) => {
    val frag = (x: Column) => concat(lit("<e id=\""), x.getField("event_id"), lit("\"/>"))
    val docs = Tables(s, dir, "events")
      .filter(col("event_id") < 2000)
      .groupBy("user_id")
      .agg(concat(lit("<body>"),
        concat_ws("", transform(array_sort(collect_list(struct(col("ts"), col("event_id")))), frag)),
        lit("</body>")).as("xml"))
    val schema = StructType.fromDDL("e ARRAY<STRUCT<`_id`: BIGINT>>")
    docs.select(col("user_id"), from_xml(col("xml"), schema).as("b"))
      .select(col("user_id"), posexplode(col("b.e")).as(Seq("pos", "ev")))
      .select(col("user_id"), col("ev._id").as("event_id"), (col("pos") + 1).as("seq"))
      .orderBy(col("user_id").asc_nulls_first, col("seq").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "xml_roundtrip" -> xmlRoundtrip,
    "xml_explode_order" -> xmlExplodeOrder
  )

  val oracle: Map[String, String] = Map(
    "xml_roundtrip" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "xml_explode_order" ->
      """SELECT user_id, event_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS INT) AS seq
        |FROM events WHERE event_id < 2000
        |ORDER BY user_id ASC NULLS FIRST, seq ASC NULLS FIRST""".stripMargin
  )
}
