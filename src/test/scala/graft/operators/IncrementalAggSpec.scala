package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** The incremental-maintenance invariant: folding any partition of the
  * history through `mergeStates` is indistinguishable from the from-scratch
  * aggregate — the property that lets a 100 TB rollup refresh in O(delta).
  */
class IncrementalAggSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def partial(df: org.apache.spark.sql.DataFrame) =
    df.groupBy((col("user_id") % 10).as("cohort"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,6)")).as("sum_v"),
        max(col("ts")).as("last_ts"),
        min(col("value")).as("min_v"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("cohort"), col("event_type"), col("n"),
        col("sum_v").cast("string"), col("last_ts").cast("string"),
        col("min_v").cast("string"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("three-way incremental fold equals the from-scratch aggregate") {
    val ev = Tables(spark, sf, "events")
    val cut1 = lit("2024-01-10 00:00:00").cast("timestamp")
    val cut2 = lit("2024-01-20 00:00:00").cast("timestamp")
    val s0 = partial(ev.filter(col("ts") < cut1))
    val d1 = partial(ev.filter(col("ts") >= cut1 && col("ts") < cut2))
    val d2 = partial(ev.filter(col("ts") >= cut2))
    val folded = Seq(d1, d2).foldLeft(s0)((st, d) =>
      IncrementalAgg.mergeStates(st, d, Seq("cohort", "event_type"),
        add = Seq("n", "sum_v"), maxCols = Seq("last_ts"), minCols = Seq("min_v")))
    assert(canon(folded) == canon(partial(ev)),
      "incremental fold must be bit-equal to the full recompute")
  }

  test("groups on one side only pass through unchanged") {
    val ev = Tables(spark, sf, "events")
    // clicks only in state, errors only in delta → both must survive intact
    val st = partial(ev.filter(col("event_type") === "click"))
    val d = partial(ev.filter(col("event_type") === "error"))
    val merged = IncrementalAgg.mergeStates(st, d, Seq("cohort", "event_type"),
      add = Seq("n", "sum_v"), maxCols = Seq("last_ts"), minCols = Seq("min_v"))
    assert(canon(merged) ==
      canon(partial(ev.filter(col("event_type").isin("click", "error")))),
      "a group missing from one side must carry the other side's state verbatim")
  }

  test("a column missing from either side fails loud") {
    val ev = Tables(spark, sf, "events")
    val st = partial(ev)
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.mergeStates(st, st.drop("min_v"), Seq("cohort", "event_type"),
        add = Seq("n", "sum_v"), minCols = Seq("min_v"))
    }
    assert(e.getMessage.contains("min_v"))
  }
}
