package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Guard-rail tests for the temporal joins: degenerate windows, the
  * fan-out cap on pathological window/bucket ratios, and the reserved
  * internal column names. (Semantics are graded by asof_join/range_join
  * against the DuckDB oracle; plan shapes by PlanShapeSpec.)
  */
class TemporalJoinsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def probesDf: DataFrame = {
    val session = spark
    import session.implicits._
    Seq((1L, ts("2024-01-05 12:00:00"))).toDF("k", "pts")
  }

  test("degenerate windows (end <= start) match nothing and never fan out descending") {
    val session = spark
    import session.implicits._
    val wins = Seq(
      (1L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:00")), // empty
      (1L, ts("2024-01-20 00:00:00"), ts("2024-01-01 00:00:00")), // negative
      (1L, ts("2024-01-05 00:00:00"), ts("2024-01-06 00:00:00"))  // real match
    ).toDF("k", "ws", "we")
    val got = TemporalJoins.joinRange(probesDf, wins, "k", "pts", "ws", "we")
      .select("ws").as[Timestamp].collect().toSeq
    assert(got == Seq(ts("2024-01-05 00:00:00")),
      "only the well-formed containing window may match")
  }

  test("a window spanning more buckets than the cap raises loudly instead of exploding") {
    val session = spark
    import session.implicits._
    // a year-long window at day buckets: 366 buckets > the 64-bucket cap
    val wins = Seq((1L, ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00")))
      .toDF("k", "ws", "we")
    val e = intercept[Exception] {
      TemporalJoins.joinRange(probesDf, wins, "k", "pts", "ws", "we").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("raise bucketMicros")),
      s"must carry the fan-out guidance, got: ${messages(e).mkString(" | ")}")

    // the same window is fine once the granularity matches the window scale
    val wide = TemporalJoins.joinRange(probesDf, wins, "k", "pts", "ws", "we",
      bucketMicros = 30L * 86400L * 1000000L) // month buckets: 13 <= 64
    assert(wide.count() == 1)
  }

  test("joinAsOf rejects inputs whose columns collide with its internal names") {
    val session = spark
    import session.implicits._
    val probes = Seq((1L, ts("2024-01-05 00:00:00"), 0)).toDF("k", "pts", "_side")
    val vers = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 9.0)).toDF("k", "vts", "vid", "vv")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.joinAsOf(probes, vers, "k", "pts", "vts", "vid", "vv", "asof")
    }
    assert(e.getMessage.contains("_side"))
  }
}
