package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

/** Drives the real Structured Streaming path (SURVEY ST1–ST7): MemoryStream
  * source → watermark + key dedup → foreachBatch merge sink, including
  * cross-batch dedup state and offset-loss re-delivery (the reference's
  * tolerance property, run.py:96 + agency.py:316-322).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

class StreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(ids: Long*): Seq[Ev] =
    ids.map(i => Ev(i, ts(f"2024-01-01 00:${i % 60}%02d:00"), i % 5, i * 1.0))

  private def emptyEvDf = {
    val session = spark
    import session.implicits._
    Seq.empty[Ev].toDF()
  }

  test("watermark dedup + foreachBatch merge is exactly-once across micro-batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val source = MemoryStream[Ev]
    val deduped = StreamingOps.dedupByKey(
      source.toDF(), "ts", "10 minutes", Seq("event_id"))
    val sink = new StreamingOps.TableSink(session, emptyEvDf, Seq("event_id"))
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    val q = StreamingOps.startMergeSink(deduped, sink, ckpt,
      Trigger.ProcessingTime("0 seconds"))
    try {
      source.addData(events(1, 2, 3): _*)
      q.processAllAvailable()
      // second micro-batch re-delivers 2 and 3: the dedup state store must
      // drop them; 4 is genuinely new
      source.addData(events(2, 3, 4): _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = sink.current.orderBy("event_id").as[Ev].collect().toSeq
    assert(got == events(1, 2, 3, 4), "merged state must equal the distinct event set")
  }

  test("restarted query re-delivering the same data leaves the sink unchanged") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val sink = new StreamingOps.TableSink(session, emptyEvDf, Seq("event_id"))

    val s1 = MemoryStream[Ev]
    val q1 = StreamingOps.startMergeSink(
      StreamingOps.dedupByKey(s1.toDF(), "ts", "10 minutes", Seq("event_id")),
      sink, Files.createTempDirectory("graft-ckpt").toString,
      Trigger.ProcessingTime("0 seconds"))
    try {
      s1.addData(events(1, 2, 3): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = sink.current.count()

    // Fresh query, fresh checkpoint (offset loss), same rows re-delivered:
    // the idempotent merge — not the offset log — guarantees the state.
    val s2 = MemoryStream[Ev]
    val q2 = StreamingOps.startMergeSink(
      StreamingOps.dedupByKey(s2.toDF(), "ts", "10 minutes", Seq("event_id")),
      sink, Files.createTempDirectory("graft-ckpt2").toString,
      Trigger.ProcessingTime("0 seconds"))
    try {
      s2.addData(events(1, 2, 3): _*)
      q2.processAllAvailable()
    } finally q2.stop()

    assert(sink.current.count() == afterFirst)
    assert(sink.current.orderBy("event_id").as[Ev].collect().toSeq == events(1, 2, 3))
  }

  test("stream-stream interval join matches across micro-batches; out-of-range pairs never join") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = StreamingOps.streamIntervalJoin(
      clicks.toDF().select(col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("user_id")), "click_ts",
      purchases.toDF().select(col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("user_id").as("p_user")), "purchase_ts",
      horizon = "1 hour",
      equiKeys = col("user_id") === col("p_user"),
      timeRange = col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))

    val q = joined.select("click_id", "purchase_id").writeStream
      .format("memory").queryName("ssj").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssj").toString)
      .trigger(Trigger.ProcessingTime("0 seconds"))
      .start()
    try {
      // batch 1: clicks only — nothing can join yet
      clicks.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 0.0),
        Ev(2, ts("2024-01-01 10:05:00"), 2, 0.0))
      q.processAllAvailable()
      assert(session.sql("SELECT * FROM ssj").count() == 0)
      // batch 2: purchases arrive later — the click sits in join state, so
      // the in-range pair (user 1, +30 min) matches ACROSS batches; the
      // out-of-range pair (user 2, +2 h) and the keyless user 9 never join
      purchases.addData(Ev(10, ts("2024-01-01 10:30:00"), 1, 0.0),
        Ev(11, ts("2024-01-01 12:05:00"), 2, 0.0),
        Ev(12, ts("2024-01-01 10:10:00"), 9, 0.0))
      q.processAllAvailable()
      val got = session.sql("SELECT click_id, purchase_id FROM ssj")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits the null-extended row only after the watermark closes the window") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = StreamingOps.streamIntervalJoin(
      clicks.toDF().select(col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("user_id")), "click_ts",
      purchases.toDF().select(col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("user_id").as("p_user")), "purchase_ts",
      horizon = "10 minutes",
      equiKeys = col("user_id") === col("p_user"),
      timeRange = col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      joinType = "left_outer")

    val q = joined.select("click_id", "purchase_id").writeStream
      .format("memory").queryName("ssj_outer").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssj3").toString)
      .trigger(Trigger.ProcessingTime("0 seconds"))
      .start()
    try {
      // click 1 matches nothing; click 2 matches purchase 20
      clicks.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 0.0),
        Ev(2, ts("2024-01-01 10:01:00"), 2, 0.0))
      purchases.addData(Ev(20, ts("2024-01-01 10:05:00"), 2, 0.0))
      q.processAllAvailable()
      val early = session.sql("SELECT click_id, purchase_id FROM ssj_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(early == Set((2L, Some(20L))),
        s"before the watermark closes, only the real match may emit, got $early")

      // march both sides' event time past 10:00 + range + horizon; the
      // watermark needs one further batch to take effect, then the unmatched
      // click emits null-extended
      clicks.addData(Ev(3, ts("2024-01-01 11:00:00"), 8, 0.0))
      purchases.addData(Ev(21, ts("2024-01-01 11:00:00"), 9, 0.0))
      q.processAllAvailable()
      clicks.addData(Ev(4, ts("2024-01-01 11:01:00"), 8, 0.0))
      purchases.addData(Ev(22, ts("2024-01-01 11:01:00"), 9, 0.0))
      q.processAllAvailable()
      val late = session.sql("SELECT click_id, purchase_id FROM ssj_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(late.contains((1L, None)),
        s"the unmatched click must emit null-extended once no partner can arrive, got $late")
    } finally q.stop()
  }

  test("stream-stream join state is evicted past the watermark horizon (bounded state)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = StreamingOps.streamIntervalJoin(
      clicks.toDF().select(col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("user_id")), "click_ts",
      purchases.toDF().select(col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("user_id").as("p_user")), "purchase_ts",
      horizon = "10 minutes",
      equiKeys = col("user_id") === col("p_user"),
      timeRange = col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))

    val q = joined.select("click_id", "purchase_id").writeStream
      .format("memory").queryName("ssj_evict").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssj2").toString)
      .trigger(Trigger.ProcessingTime("0 seconds"))
      .start()
    try {
      clicks.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 0.0))
      q.processAllAvailable()
      // march BOTH sides' event time hours past the click: the global
      // watermark (min of the two sides) passes 10:00 + horizon + range,
      // so click 1's state row is eligible for eviction from then on
      clicks.addData(Ev(2, ts("2024-01-01 15:00:00"), 8, 0.0))
      purchases.addData(Ev(20, ts("2024-01-01 15:00:00"), 9, 0.0))
      q.processAllAvailable()
      clicks.addData(Ev(3, ts("2024-01-01 15:01:00"), 8, 0.0))
      purchases.addData(Ev(21, ts("2024-01-01 15:01:00"), 9, 0.0))
      q.processAllAvailable()
      // a purchase that WOULD have matched click 1 arrives hours late:
      // the partner is gone (and the row itself is behind the watermark) —
      // bounded state traded for bounded lateness, no match emitted
      purchases.addData(Ev(22, ts("2024-01-01 10:05:00"), 1, 0.0))
      q.processAllAvailable()
      assert(session.sql("SELECT * FROM ssj_evict").count() == 0)
    } finally q.stop()
  }

  test("stream-static enrich picks up the current dim snapshot (daily refresh)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val source = MemoryStream[Ev]
    val dims = Seq((0L, "u0"), (1L, "u1"), (2L, "u2"), (3L, "u3"), (4L, "u4"))
      .toDF("user_id", "user_name")
    val enriched = StreamingOps.enrich(source.toDF(), dims, "user_id")

    // zero frame must be a *batch* frame with the enriched schema
    val zero = session.createDataFrame(
      new java.util.ArrayList[Row](), enriched.schema)
    val sink = new StreamingOps.TableSink(session, zero, Seq("event_id"))
    val q = StreamingOps.startMergeSink(enriched, sink,
      Files.createTempDirectory("graft-ckpt3").toString,
      Trigger.ProcessingTime("0 seconds"))
    try {
      source.addData(events(1, 2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val names = sink.current.orderBy("event_id")
      .select("user_name").as[String].collect().toSeq
    assert(names == Seq("u1", "u2"))
  }
}
