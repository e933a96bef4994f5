package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** The production-shaped source path (ST2): a checkpointed file-source
  * stream over parquet drops, throttled by maxFilesPerTrigger — the real
  * offset log, not MemoryStream's in-memory one. The reference analogue is
  * the per-route `t=lastTime` incremental fetch (route.py:151-170).
  */
class FileSourceSpec extends SparkTestBase {

  test("parquet file-source stream delivers each drop exactly once through the merge sink") {
    val session = spark
    import session.implicits._

    val src = Files.createTempDirectory("graft-drops").toString
    val events = Tables(session, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "value")
    // two "polls" land as two parquet drops
    events.filter(col("event_id") < 300).write.parquet(s"$src/d1")
    events.filter(col("event_id") >= 300 && col("event_id") < 600).write.parquet(s"$src/d2")

    val stream = session.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")

    val zero = events.limit(0)
    val sink = new StreamingOps.TableSink(session, zero, Seq("event_id"))
    val q = StreamingOps.startMergeSink(
      StreamingOps.dedupByKey(stream, "ts", "10 minutes", Seq("event_id")),
      sink, Files.createTempDirectory("graft-fs-ckpt").toString,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()

    val expected = events.filter(col("event_id") < 600)
    assert(sink.current.count() == expected.count())
    assert(sink.current.select("event_id").as[Long].collect().sorted.toSeq ==
      expected.select("event_id").as[Long].collect().sorted.toSeq)
  }

  test("restart from the same checkpoint skips already-processed drops (real offset log)") {
    val session = spark
    import session.implicits._

    val src = Files.createTempDirectory("graft-drops2").toString
    val ckpt = Files.createTempDirectory("graft-fs-ckpt2").toString
    val events = Tables(session, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "value")
    val zero = events.limit(0)
    val sink = new StreamingOps.TableSink(session, zero, Seq("event_id"))

    def run(): Unit = {
      val stream = session.readStream.schema(events.schema).parquet(s"$src/*")
      val q = StreamingOps.startMergeSink(
        StreamingOps.dedupByKey(stream, "ts", "10 minutes", Seq("event_id")),
        sink, ckpt, org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }

    events.filter(col("event_id") < 300).write.parquet(s"$src/d1")
    run()
    val afterFirst = sink.rowsMerged

    // second run, SAME checkpoint: d1 must not re-enter the sink — the
    // offset log, not the idempotent merge, is what skips it
    events.filter(col("event_id") >= 300 && col("event_id") < 500).write.parquet(s"$src/d2")
    run()

    val expected = events.filter(col("event_id") < 500)
    assert(sink.current.count() == expected.count())
    assert(sink.rowsMerged == expected.count(),
      s"rowsMerged=${sink.rowsMerged}: drop d1 (first $afterFirst rows) was re-delivered despite the checkpoint")
  }
}
