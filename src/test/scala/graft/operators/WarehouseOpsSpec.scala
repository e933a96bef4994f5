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
}
