package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.StreamingOps.{SEvent, Session}

/** Custom-state sessionization (flatMapGroupsWithState + event-time
  * timeout): sessions close inline on a beyond-gap event and via watermark
  * timeout when the key goes quiet.
  */
class SessionizeSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val GAP_MS = 10 * 60 * 1000L // 10 minutes

  test("sessions close on in-stream gap and on event-time timeout") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val source = MemoryStream[SEvent]
    val sessions = StreamingOps.sessionize(source.toDS(), GAP_MS, "0 seconds")

    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("graft_sessions")
      .start()
    try {
      // session A: two events 5 min apart
      source.addData(SEvent(1L, ts("2024-01-01 00:00:00")), SEvent(1L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      // 00:30 is >10 min after 00:05 → closes session A inline, opens B
      source.addData(SEvent(1L, ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      // another key far in the future advances the watermark past B's
      // timeout (00:40), closing B by timeout; then flush once more
      source.addData(SEvent(2L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      source.addData(SEvent(2L, ts("2024-01-01 02:01:00")))
      q.processAllAvailable()

      val got = session.sql("SELECT * FROM graft_sessions")
        .as[Session].collect().sortBy(s => (s.user_id, s.start.getTime)).toSeq
      assert(got.exists(s => s.user_id == 1L && s.start == ts("2024-01-01 00:00:00") &&
        s.end == ts("2024-01-01 00:05:00") && s.n_events == 2L),
        s"inline-closed session A missing from $got")
      assert(got.exists(s => s.user_id == 1L && s.start == ts("2024-01-01 00:30:00") &&
        s.end == ts("2024-01-01 00:30:00") && s.n_events == 1L),
        s"timeout-closed session B missing from $got")
    } finally q.stop()
  }

  test("a late in-gap event extends the session start backwards") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val source = MemoryStream[SEvent]
    // generous watermark delay so the out-of-order event is still accepted
    val sessions = StreamingOps.sessionize(source.toDS(), GAP_MS, "1 hour")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions_late").start()
    try {
      source.addData(SEvent(1L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      // late event 5 min EARLIER, still within the gap of the buffer
      source.addData(SEvent(1L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      // far-future other-key events advance the watermark past the timeout
      source.addData(SEvent(2L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      source.addData(SEvent(2L, ts("2024-01-01 06:01:00")))
      q.processAllAvailable()

      val got = session.sql("SELECT * FROM graft_sessions_late")
        .as[Session].collect().filter(_.user_id == 1L).toSeq
      assert(got.exists(s => s.start == ts("2024-01-01 00:05:00") &&
        s.end == ts("2024-01-01 00:10:00") && s.n_events == 2L),
        s"backward-extended session missing from $got")
    } finally q.stop()
  }
}
