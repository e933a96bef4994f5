package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.streaming.{ParquetTableSink, StreamingOps}

/** The last simulated boundary closed: the S4 offset loop driven over a REAL
  * localhost socket. An embedded HTTP server plays the vehicleLocations
  * endpoint (route.py:151-170): it serves only reports newer than the
  * request's `t` and stamps `<lastTime>` with its newest report time; the
  * poller must echo each response's lastTime as the next request's `t`.
  * The landed documents then drain through the standard pipeline — file
  * source → parseVehicleLocations → watermark dedup → versioned merge —
  * including an at-least-once re-delivery (a zero-offset re-poll lands the
  * whole feed again) that the dedup must neutralize.
  */
class HttpXmlSourceSpec extends SparkTestBase {

  /** (reportTimeMs, id, dirTag, lon, lat) — the server's feed state. */
  private type Report = (Long, String, String, Double, Double)

  private final class FeedServer {
    val seenTs = ArrayBuffer.empty[String]
    @volatile var reports: Seq[Report] = Seq.empty
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/service/publicXMLFeed", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getQuery
      val t = q.split("&").collectFirst { case s if s.startsWith("t=") => s.drop(2) }.get
      seenTs.synchronized { seenTs += t }
      val snapshot = reports
      val lastTime = if (snapshot.isEmpty) t.toLong else snapshot.map(_._1).max
      val fresh = snapshot.filter(_._1 > t.toLong)
      val body = fresh.map { case (rt, id, dir, lon, lat) =>
        val secs = (lastTime - rt) / 1000.0
        s"""<vehicle id="$id" dirTag="$dir" lon="$lon" lat="$lat" secsSinceReport="$secs" predictable="true"/>"""
      }.mkString("<body>", "", s"""<lastTime time="$lastTime"/></body>""")
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}/service/publicXMLFeed"
    def stop(): Unit = server.stop(0)
  }

  test("offset echo over a real socket: two incremental polls, restart resume, re-delivery deduped") {
    val server = new FeedServer
    try {
      val work = Files.createTempDirectory("graft-http-src")
      val incoming = work.resolve("incoming")
      val state = work.resolve("state")

      // ---- poll 1: t=0 fetches the whole current feed ----
      server.reports = Seq(
        (1000L, "v1", "east", -122.1, 37.51),
        (2000L, "v2", "east", -122.2, 37.52))
      val poller = new HttpVehiclePoller(server.baseUrl, "sf-muni", "N", incoming, state)
      val f1 = poller.pollOnce()
      assert(poller.lastOffset == "2000", "offset must advance to the echoed lastTime")

      // ---- poll 2: only the delta since t=2000 crosses the wire ----
      server.reports = server.reports ++ Seq(
        (2500L, "v3", "west", -122.3, 37.53),
        (3000L, "v2", "east", -122.25, 37.55)) // v2 moved: a NEW report
      val f2 = poller.pollOnce()
      assert(poller.lastOffset == "3000")
      assert(server.seenTs.toSeq == Seq("0", "2000"),
        "each request must carry the previous response's lastTime")
      assert(!Files.readString(f2).contains("\"v1\""),
        "the second poll must not re-fetch reports older than its offset")

      // ---- restart: a FRESH poller over the same state dir resumes ----
      val resumed = new HttpVehiclePoller(server.baseUrl, "sf-muni", "N", incoming, state)
      assert(resumed.lastOffset == "3000", "the offset file alone must carry resume state")
      val f3 = resumed.pollOnce() // empty delta, offset stays
      assert(resumed.lastOffset == "3000" && server.seenTs.toSeq.last == "3000")

      // ---- at-least-once edge: a zero-offset poller re-lands everything ----
      val replayer = new HttpVehiclePoller(server.baseUrl, "sf-muni", "N",
        incoming, work.resolve("state2"))
      val f4 = replayer.pollOnce() // t=0 again: the full feed, duplicated
      assert(Files.readString(f4).contains("\"v1\""))

      // deterministic micro-batch order (the stream_sessions convention)
      Seq(f1, f2, f3, f4).zipWithIndex.foreach { case (p, i) =>
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      }

      // ---- drain: file source → parse → watermark dedup → versioned merge ----
      val local = spark.newSession()
      local.conf.set("spark.sql.shuffle.partitions", "4")
      val docs = local.readStream.option("wholetext", "true")
        .option("maxFilesPerTrigger", "1")
        .text(incoming.toString + "/*.xml")
      val rows = XmlFeed.parseVehicleLocations(docs, xmlCol = "value")
        // an empty delta (poll 3) is a vehicles-less document: explode_outer
        // keeps it as one all-null row so the offset still parses — drop it
        // before keying (G6's filter_unmatched, applied at the source)
        .filter(col("vehicle_tag").isNotNull)
        .withColumn("ts",
          timestamp_seconds(col("last_time").cast("double") / 1000 - col("secs_since_report")))
      val deduped = StreamingOps.dedupByKey(rows, "ts", "10 minutes", Seq("vehicle_tag"))
      val table = new ParquetTableSink(spark, work.resolve("table").toString,
        deduped.limit(0), Seq("vehicle_tag", "ts"))
      StreamingOps.startPersistentMergeSink(deduped, table,
        work.resolve("ckpt").toString, Trigger.AvailableNow()).awaitTermination()

      // 4 unique reports; the re-delivered full feed adds nothing
      val session = spark
      import session.implicits._
      val got = table.current.select("vehicle_tag", "lat").as[(String, Double)]
        .collect().toSeq.sorted
      assert(got == Seq(("v1", 37.51), ("v2", 37.52), ("v2", 37.55), ("v3", 37.53)),
        s"watermark dedup must keep each (vehicle, report) once, got $got")
    } finally server.stop()
  }
}
