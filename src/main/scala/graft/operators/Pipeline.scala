package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Entry point C (SURVEY §3.3, `update_stops`) end-to-end: the most
    * relationally complex reference pipeline. Over testdata, `p_brand` plays
    * the stop tag: brands present in the "body" (p_size ≥ 25) keep their
    * rows; brands only referenced elsewhere are "missing" (left-anti) and
    * backfill name/price from the deterministically-best small-part row
    * (sort + first, agency.py:145-159); union then key-dedup on
    * (tag, COALESCE(name,'')) — the null-safe conflict key of
    * sql/create_tables.sql:86.
    *
    * Scale shape: one anti-join and one backfill join (both on the tag key),
    * two bounded window dedups. No broadcast assumptions on the fact side.
    */
  def stopsRefresh(s: SparkSession, dir: String): DataFrame = {
    val part = Tables(s, dir, "part")
    val body = part.filter(col("p_size") >= 25)
      .select(col("p_brand").as("tag"), col("p_name").as("name"),
        col("p_retailprice").as("price"))
    val allTags = part.select(col("p_brand").as("tag")).distinct()
    val missing = allTags.join(body.select("tag").distinct(), Seq("tag"), "left_anti")
    val wBest = Window.partitionBy("tag")
      .orderBy(col("price").asc_nulls_first, col("name").asc_nulls_first)
    val best = part.filter(col("p_size") < 25)
      .select(col("p_brand").as("tag"), col("p_name").as("name"),
        col("p_retailprice").as("price"))
      .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1).drop("rn")
    val backfilled = missing.join(best, Seq("tag"), "left")
      .select(col("tag"), col("name"), col("price"), lit(true).as("was_backfilled"))
    val unioned = body.withColumn("was_backfilled", lit(false)).unionByName(backfilled)
    val wDedup = Window.partitionBy(col("tag"), coalesce(col("name"), lit("")))
      .orderBy(col("price").asc_nulls_first, col("was_backfilled").asc_nulls_first)
    unioned.withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1).drop("rn")
      .orderBy(col("tag").asc_nulls_first, col("name").asc_nulls_first,
        col("price").asc_nulls_first)
  }

  /** Entry point D (`update_service_stop_orders`, agency.py:197-232 +
    * route.py:88-137) end-to-end: routeConfig XML documents → per-direction
    * stop_order enumeration in document order (W1, the posexplode contract)
    * → versioned insert-if-absent against the already-loaded table (S8 —
    * `ON CONFLICT DO NOTHING`, so the earlier version's ordering survives a
    * re-crawl that shifted positions).
    *
    * Over testdata: one routeConfig doc per user (route_tag = user_id),
    * one direction per event_type, stops = that group's events in (ts,
    * event_id) order. The "existing" table is the parse of an earlier,
    * smaller crawl (event_id < 800) whose conflicting keys must win.
    *
    * Scale shape: doc synthesis is two grouped aggregations; parsing is
    * per-row expression work over the doc scan; the merge is one left-anti
    * join on the conflict key. No broadcast assumptions, no driver loops.
    */
  def stopOrdersRefresh(s: SparkSession, dir: String): DataFrame = {
    def docsFor(maxId: Long): DataFrame = {
      val stopFrag = (e: Column) =>
        concat(lit("<stop tag=\""), e.getField("event_id"), lit("\"/>"))
      val dirDocs = Tables(s, dir, "events")
        .filter(col("event_id") < maxId)
        .groupBy("user_id", "event_type")
        .agg(concat(lit("<direction tag=\""), col("event_type"), lit("\">"),
          concat_ws("", transform(
            array_sort(collect_list(struct(col("ts"), col("event_id")))), stopFrag)),
          lit("</direction>")).as("dir_xml"))
      dirDocs.groupBy("user_id")
        .agg(concat(lit("<body><route tag=\""), col("user_id"), lit("\">"),
          concat_ws("", transform(
            array_sort(collect_list(struct(col("event_type"), col("dir_xml")))),
            d => d.getField("dir_xml"))),
          lit("</route></body>")).as("xml"))
    }
    val existing = graft.sources.XmlFeed.parseStopOrders(docsFor(800))
      .withColumn("version", lit(1))
    val incoming = graft.sources.XmlFeed.parseStopOrders(docsFor(2000))
      .withColumn("version", lit(2))
    MergeOps.insertIfAbsent(existing, incoming,
        Seq("route_tag", "direction_tag", "stop_tag"))
      .orderBy(col("route_tag").asc_nulls_first, col("direction_tag").asc_nulls_first,
        col("stop_tag").asc_nulls_first)
  }

  /** The ASSEMBLED program graded end-to-end against the oracle: a two-day
    * GraftApp drive (the reference's run.py loop — day-1 dim snapshot, two
    * overlapping poll drops, midnight rollover re-snapshot, a day-2 drop)
    * whose final Derby fact table must hash-equal the declarative replay of
    * the same inputs. This closes the gap between the spec-asserted drive
    * (GraftMainSpec pins counts, kill/replay, rollover calendars) and the
    * cross-engine gate: checkpointed offsets, watermark dedup across polls,
    * per-batch dim re-resolution, the transactional JDBC merge, and the
    * batch-id guard all have to compose to EXACTLY the one-shot join.
    *
    * Derby returns uppercase identifiers; the projection pins the graded
    * lowercase names.
    */
  private val pipelineProgram: Q = (s, dir) => {
    // cloned-session scoping (the stream_sink_table convention): poll-sized
    // micro-batches through ~6 exchanges per pass
    val local = s.newSession()
    local.conf.set("spark.sql.shuffle.partitions", "8")
    val work = graft.Scratch.dir("graft-program")
    var utcNow = java.time.Instant.parse("2024-01-01T12:00:00Z")
    val app = new graft.GraftApp(local, dir, s"$work/incoming", s"$work/state",
      graft.GraftMain.zonedClock(() => utcNow, java.time.ZoneId.of("UTC")))
    def drop(name: String, pred: Column): Unit =
      Tables(local, dir, "events").select("event_id", "ts", "user_id", "value")
        .filter(pred).write.parquet(s"$work/incoming/$name")
    app.tick()                                              // day-1 dim snapshot
    drop("d1", col("event_id") < 400); app.tick()           // poll 1
    drop("d2", col("event_id") >= 300 && col("event_id") < 700); app.tick()
    utcNow = utcNow.plus(java.time.Duration.ofDays(1))
    app.tick()                                              // day-2 rollover
    drop("d3", col("event_id") >= 700 && col("event_id") < 900); app.tick()
    app.factTable.select(
        col("EVENT_ID").as("event_id"), col("TS").as("ts"),
        col("USER_ID").as("user_id"), col("VALUE").as("value"),
        col("C_MKTSEGMENT").as("c_mktsegment"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "pipeline_hotpath" -> (vehicleHotPath(_, _)),
    "pipeline_stops_refresh" -> (stopsRefresh(_, _)),
    "pipeline_stop_orders" -> (stopOrdersRefresh(_, _)),
    "pipeline_program" -> pipelineProgram
  )

  val oracle: Map[String, String] = Map(
    // three overlapping drops cover exactly ids < 900 once each (dedup +
    // idempotent upsert); enrichment resolves every user (FK-complete
    // testdata), with the LEFT join mirroring the program's semantics
    "pipeline_program" ->
      """SELECT e.event_id, e.ts, e.user_id, e.value, c.c_mktsegment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_id < 900
        |ORDER BY e.event_id ASC NULLS FIRST""".stripMargin,
    "pipeline_stop_orders" ->
      """WITH ex AS (
        |  SELECT CAST(user_id AS VARCHAR) AS route_tag, event_type AS direction_tag,
        |    CAST(event_id AS VARCHAR) AS stop_tag,
        |    CAST(row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts ASC, event_id ASC) AS INT) AS stop_order,
        |    1 AS version
        |  FROM events WHERE event_id < 800),
        |inc AS (
        |  SELECT CAST(user_id AS VARCHAR) AS route_tag, event_type AS direction_tag,
        |    CAST(event_id AS VARCHAR) AS stop_tag,
        |    CAST(row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts ASC, event_id ASC) AS INT) AS stop_order,
        |    2 AS version
        |  FROM events WHERE event_id < 2000)
        |SELECT * FROM ex
        |UNION ALL
        |SELECT i.* FROM inc i
        |WHERE NOT EXISTS (SELECT 1 FROM ex
        |  WHERE ex.route_tag = i.route_tag AND ex.direction_tag = i.direction_tag
        |    AND ex.stop_tag = i.stop_tag)
        |ORDER BY route_tag ASC NULLS FIRST, direction_tag ASC NULLS FIRST,
        |  stop_tag ASC NULLS FIRST""".stripMargin,
    "pipeline_stops_refresh" ->
      """WITH body AS (
        |  SELECT p_brand AS tag, p_name AS name, p_retailprice AS price
        |  FROM part WHERE p_size >= 25),
        |all_tags AS (SELECT DISTINCT p_brand AS tag FROM part),
        |missing AS (
        |  SELECT tag FROM all_tags
        |  WHERE NOT EXISTS (SELECT 1 FROM body WHERE body.tag = all_tags.tag)),
        |best AS (
        |  SELECT tag, name, price FROM (
        |    SELECT p_brand AS tag, p_name AS name, p_retailprice AS price,
        |      row_number() OVER (PARTITION BY p_brand
        |        ORDER BY p_retailprice ASC NULLS FIRST, p_name ASC NULLS FIRST) AS rn
        |    FROM part WHERE p_size < 25) WHERE rn = 1),
        |unioned AS (
        |  SELECT tag, name, price, false AS was_backfilled FROM body
        |  UNION ALL
        |  SELECT m.tag, b.name, b.price, true AS was_backfilled
        |  FROM missing m LEFT JOIN best b ON m.tag = b.tag),
        |deduped AS (
        |  SELECT *, row_number() OVER (PARTITION BY tag, COALESCE(name, '')
        |    ORDER BY price ASC NULLS FIRST, was_backfilled ASC NULLS FIRST) AS rn
        |  FROM unioned)
        |SELECT tag, name, price, was_backfilled FROM deduped WHERE rn = 1
        |ORDER BY tag ASC NULLS FIRST, name ASC NULLS FIRST, price ASC NULLS FIRST""".stripMargin,
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
