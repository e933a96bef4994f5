package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Semantics of the warehouse-maintenance trio on planted fixtures: SCD2 era
  * construction (echo collapse, half-open chaining, deterministic ties),
  * gaps-and-islands interval merging (overlap + touch, island isolation),
  * sweep-line concurrency (half-open release-before-acquire), and the DQ
  * audit rules (FK orphans, duplicate keys, pass flags). Cross-engine
  * values are graded by scd2_build / interval_* / dq_check vs DuckDB.
  */
class WarehouseOpsSpec extends SparkTestBase {

  test("buildScd2 collapses CDC echoes, chains half-open eras, flags current") {
    val session = spark
    import session.implicits._
    val changes = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), // echo: no new era
      (1L, 30L, 3L, "B"), (1L, 40L, 4L, "B"),
      (1L, 50L, 5L, "A")
    ).toDF("k", "t", "tie", "attr")
    val got = Scd.buildScd2(changes, "k", "t", "tie", "attr")
      .orderBy("version")
      .select("version", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 10L, Some(30L), false),
      (2L, "B", 30L, Some(50L), false),
      (3L, "A", 50L, None, true)))
  }

  test("buildScd2 breaks same-timestamp ties by the tie column, deterministically") {
    val session = spark
    import session.implicits._
    val changes = Seq((2L, 10L, 2L, "Y"), (2L, 10L, 1L, "X")).toDF("k", "t", "tie", "attr")
    val got = Scd.buildScd2(changes, "k", "t", "tie", "attr")
      .orderBy("version").select("attr", "is_current")
      .as[(String, Boolean)].collect().toSeq
    assert(got == Seq(("X", false), ("Y", true)),
      "tie=1 must open first; tie=2 is the current era")
  }

  test("mergeIntervals merges overlapping AND touching intervals, splits gaps") {
    val session = spark
    import session.implicits._
    val iv = Seq(
      (1L, 0L, 10L, 1L), (1L, 5L, 15L, 2L), (1L, 15L, 20L, 3L), // one island (15 touches)
      (1L, 30L, 40L, 4L),                                       // gap -> second island
      (2L, 0L, 5L, 5L)                                          // other key isolated
    ).toDF("k", "s", "e", "tie")
    val got = Intervals.mergeIntervals(iv, "k", "s", "e", "tie")
      .orderBy("k", "island")
      .select("k", "island", "merged_s", "merged_e", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, 20L, 3L), (1L, 2L, 30L, 40L, 1L),
      (2L, 1L, 0L, 5L, 1L)))
  }

  test("mergeIntervals: a contained interval never reopens an island") {
    val session = spark
    import session.implicits._
    // [0,100) swallows [10,20); [50,60) starts after 20 but inside 100
    val iv = Seq((1L, 0L, 100L, 1L), (1L, 10L, 20L, 2L), (1L, 50L, 60L, 3L))
      .toDF("k", "s", "e", "tie")
    val got = Intervals.mergeIntervals(iv, "k", "s", "e", "tie")
      .select("merged_s", "merged_e", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 100L, 3L)),
      "running-max (not lag) must carry the covering interval's end")
  }

  test("maxConcurrency is half-open: release at t precedes acquire at t") {
    val session = spark
    import session.implicits._
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 10L, 20L), // end@10 frees before start@10
      ("b", 0L, 10L)
    ).toDF("d", "s", "e")
    val got = Intervals.maxConcurrency(iv, "d", "s", "e")
      .orderBy("d").select("d", "max_concurrent", "n_intervals")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 3L), ("b", 1L, 1L)))
  }

  test("DQ audit: FK orphans, duplicate keys, and pass flags") {
    val session = spark
    import session.implicits._
    val fact = Seq((1L, "x"), (2L, "y"), (99L, "orphan")).toDF("fk", "v")
    val dim = Seq((1L, "one"), (2L, "two"), (2L, "two-dup")).toDF("id", "name")
    val report = Quality.audit(Seq(
      Quality.fkCheck("fk", fact, "fk", dim, "id"),
      Quality.uniqueCheck("uq", dim, Seq("id")),
      Quality.check("nn", fact, col("v").isNull)))
      .select("rule", "checked", "violations", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(report == Seq(
      ("fk", 3L, 1L, false),  // 99 resolves nowhere
      ("nn", 3L, 0L, true),
      ("uq", 3L, 1L, false))) // id=2 twice
  }

  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // ts is raw INT64 nanos, the driver testdata layout Tables expects
    rows.map { case (id, user, typ, v) =>
      (id, 1700000000000000000L + id * 1000000000L, user, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("interval_weighted_avg: duration weighting shifts the mean toward long intervals") {
    val session = spark
    import session.implicits._
    // dur = event_id % 300 + 60: id 40 → 100 s @ value 10, id 240 → 300 s @ 20
    // tw = (10·100 + 20·300) / 400 = 17.5; plain = 15.0 — the bias the
    // operator exists to remove is visible in the contrast column
    val dir = writeEvents(Seq((40L, 1L, "a", 10.0), (240L, 1L, "a", 20.0)))
    val got = Intervals.queries("interval_weighted_avg")(spark, dir)
      .select("event_type", "n_intervals", "total_s", "tw_avg", "plain_avg")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 400L, 17.5, 15.0)))
  }

  private def writeLineitem(prices: Seq[Double]): String = {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bf").toString
    prices.zipWithIndex.map { case (p, i) =>
      (i.toLong, i.toLong, i.toLong, i, 1.0, p, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(1700000000000L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("dq_benford: integer-cents digit extraction and the log10 expectation") {
    val session = spark
    import session.implicits._
    // leading digits of the cents rendering: 1999→1, 10000→1, 2999→2, 99999→9
    val dir = writeLineitem(Seq(19.99, 100.00, 29.99, 999.99))
    val got = Quality.queries("dq_benford")(spark, dir)
      .select("digit", "n", "expected_p")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(r => r._1 -> r._2) == Seq(1 -> 2L, 2 -> 1L, 9 -> 1L))
    got.foreach { case (d, _, exp) =>
      assert(math.abs(exp - math.log10(1.0 + 1.0 / d)) < 1e-6) }
  }

  test("window_rolling_median: exact running median over the trailing frame") {
    val session = spark
    import session.implicits._
    // one user, values in ts order 5,1,3,2,4 → medians 5, 3, 3, 2.5, 3
    val dir = writeEvents(Seq(
      (1L, 7L, "a", 5.0), (2L, 7L, "a", 1.0), (3L, 7L, "a", 3.0),
      (4L, 7L, "a", 2.0), (5L, 7L, "a", 4.0)))
    val got = Analytics.queries("window_rolling_median")(spark, dir)
      .select("event_id", "roll_med")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(1L -> 5.0, 2L -> 3.0, 3L -> 3.0, 4L -> 2.5, 5L -> 3.0))
  }
}
