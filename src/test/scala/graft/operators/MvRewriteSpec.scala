package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.plans.MvRewriteRule

/** The automatic MV rewrite (plans.MvRewriteRule): a GROUP BY over a
  * registered base scan must execute against the rollup's files with
  * values indistinguishable from the from-scratch aggregate, and every
  * non-derivable shape must be left untouched. Cross-engine values are
  * graded by mv_rewrite_scan vs DuckDB.
  */
class MvRewriteSpec extends SparkTestBase {

  // the rewrite fires at analysis time, so the analyzed plan's relations
  // (what inputFiles reports) are the authoritative scan set
  private def scannedFiles(df: DataFrame): Seq[String] = df.inputFiles.toSeq

  private def fixture(): (DataFrame, String) = {
    val session = spark
    import session.implicits._
    val baseDir = Files.createTempDirectory("graft-mv-base").toString
    Seq(
      (1L, "a", 10L, 1.5, "2024-01-01 00:00:10"),
      (2L, "a", 11L, 2.5, "2024-01-02 00:00:10"),
      (3L, "b", 10L, -1.0, "2024-01-03 00:00:10"),
      (4L, "b", 12L, 4.25, "2024-01-01 12:00:00"),
      (5L, "b", 12L, 0.75, "2024-01-05 00:00:10"),
      (6L, "c", 13L, 3.0, "2024-01-04 00:00:10"))
      .toDF("id", "etype", "uid", "v", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      .write.parquet(s"$baseDir/t")
    (spark.read.parquet(s"$baseDir/t")
      .select($"id", $"etype", $"uid", $"v".cast("decimal(25,6)").as("vd"), $"ts"),
      baseDir)
  }

  private def buildMv(base: DataFrame, dir: String): (DataFrame, String) = {
    val mvPath = s"$dir/mv"
    base.groupBy(col("etype"), pmod(col("uid"), lit(2)).as("cohort"))
      .agg(count(lit(1)).as("n"), count(col("vd")).as("n_v"),
        sum(col("vd")).as("s_v"), min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
      .write.mode("overwrite").parquet(mvPath)
    (spark.read.parquet(mvPath), mvPath)
  }

  private def register(base: DataFrame, mv: DataFrame, mvPath: String): Unit =
    MvRewriteRule.register(mvPath, base, mv,
      groupCols = Seq("etype"), countStar = Some("n"),
      countOf = Map("vd" -> "n_v"), sumOf = Map("vd" -> "s_v"),
      minOf = Map("ts" -> "min_ts"), maxOf = Map("ts" -> "max_ts"))

  test("rollup query executes against the MV's files with from-scratch values") {
    val (base, dir) = fixture()
    // expected BEFORE registration: the unrewritten from-scratch aggregate
    def rollup(b: DataFrame): DataFrame =
      b.groupBy(col("etype"))
        .agg(count(lit(1)).as("n_rows"), sum(col("vd")).as("s"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy("etype")
    val expected = rollup(base).collect().toSeq

    val (mv, mvPath) = buildMv(base, dir)
    register(base, mv, mvPath)
    try {
      val got = rollup(base)
      assert(got.collect().toSeq == expected,
        "MV-routed values must be indistinguishable from the base aggregate")
      assert(got.schema == rollup(base.limit(6)).schema, // limit blocks the match
        "the rewrite must be schema-invisible")
      val files = scannedFiles(got)
      assert(files.exists(_.contains("/mv/")), s"expected an MV scan, got $files")
      assert(!files.exists(_.contains("/t/")), s"base table must not be scanned, got $files")
    } finally MvRewriteRule.unregister(mvPath)
  }

  test("non-derivable shapes are left on the base scan") {
    val (base, dir) = fixture()
    val (mv, mvPath) = buildMv(base, dir)
    register(base, mv, mvPath)
    try {
      // distinct aggregate: not derivable from a coarser rollup
      val cd = base.groupBy(col("etype")).agg(countDistinct(col("uid")).as("u"))
      assert(scannedFiles(cd).forall(_.contains("/t/")), "countDistinct must stay on base")
      // grouping outside the MV grain
      val g = base.groupBy(col("uid")).agg(count(lit(1)).as("n"))
      assert(scannedFiles(g).forall(_.contains("/t/")), "uid is not in the MV grain")
      // aggregate of a column with no registered partial
      val s = base.groupBy(col("etype")).agg(sum(col("id")).as("si"))
      assert(scannedFiles(s).forall(_.contains("/t/")), "sum(id) has no partial")
      // a filter on a MEASURE column filters rows, not groups: no rewrite
      val f = base.filter(col("uid") > 10).groupBy(col("etype")).agg(count(lit(1)).as("n"))
      assert(scannedFiles(f).forall(_.contains("/t/")), "measure-filtered base must not match")
      // a nondeterministic grain filter must not commute either
      val nd = base.filter(col("etype") === "a" && rand() < 2.0)
        .groupBy(col("etype")).agg(count(lit(1)).as("n"))
      assert(scannedFiles(nd).forall(_.contains("/t/")), "nondeterministic filter must not match")
    } finally MvRewriteRule.unregister(mvPath)
  }

  test("a grain-column filter commutes: filtered rollup answers from the MV") {
    val (base, dir) = fixture()
    def q(b: DataFrame): DataFrame =
      b.filter(col("etype").isin("a", "c"))
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n_rows"), sum(col("vd")).as("s"))
        .orderBy("etype")
    val expected = q(base).collect().toSeq
    val (mv, mvPath) = buildMv(base, dir)
    register(base, mv, mvPath)
    try {
      val got = q(base)
      assert(got.collect().toSeq == expected)
      assert(scannedFiles(got).forall(_.contains("/mv/")),
        "a grain filter selects whole groups and must ride the MV")
    } finally MvRewriteRule.unregister(mvPath)
  }

  test("an unregistered MV never fires; re-registration replaces") {
    val (base, dir) = fixture()
    val (mv, mvPath) = buildMv(base, dir)
    register(base, mv, mvPath)
    MvRewriteRule.unregister(mvPath)
    val q = base.groupBy(col("etype")).agg(count(lit(1)).as("n"))
    assert(scannedFiles(q).forall(_.contains("/t/")))
    // register → replace with a re-registration keyed the same: no duplicates,
    // still fires (covers the bench-sweep re-register path)
    register(base, mv, mvPath)
    register(base, mv, mvPath)
    try assert(scannedFiles(base.groupBy(col("etype")).agg(count(lit(1)).as("n")))
      .forall(_.contains("/mv/")))
    finally MvRewriteRule.unregister(mvPath)
  }

  test("an incrementally-maintained sink rollup serves as the MV (the full loop)") {
    // maintenance side: partial states folded into a ParquetTableSink
    // through IncrementalAgg.mergeStates across two delta merges — the
    // stream_rollup_table artifact; query side: MvRewriteRule answers a
    // base GROUP BY from that sink's buckets. Refresh is O(delta+touched
    // buckets), queries never rescan the base: the warehouse MV loop.
    val (base, dir) = fixture()
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("etype"), pmod(col("uid"), lit(2)).as("cohort"))
        .agg(count(lit(1)).as("n"), count(col("vd")).as("n_v"),
          sum(col("vd")).cast("decimal(35,6)").as("s_v"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    val keys = Seq("etype", "cohort")
    val combine: graft.streaming.ParquetTableSink.Combiner = (target, staged) =>
      graft.operators.IncrementalAgg.mergeStates(target, staged, keys,
        add = Seq("n", "n_v", "s_v"),
        maxCols = Seq("max_ts"), minCols = Seq("min_ts"))
        .select(col("etype"), col("cohort"), col("n"), col("n_v"),
          col("s_v").cast("decimal(35,6)").as("s_v"), col("min_ts"), col("max_ts"))
    val sink = new graft.streaming.ParquetTableSink(spark, s"$dir/mvsink",
      partial(base).limit(0), keys, buckets = 2, combine = combine)
    sink.merge(partial(base.filter(col("id") <= 3)), 0L)
    sink.merge(partial(base.filter(col("id") > 3)), 1L)

    def q(b: DataFrame): DataFrame =
      b.groupBy(col("etype"))
        .agg(count(lit(1)).as("n_rows"), sum(col("vd")).as("s"),
          min(col("ts")).as("first_ts"))
        .orderBy("etype")
    val expected = q(base).collect().toSeq
    MvRewriteRule.register(s"$dir/mvsink", base, sink.table(),
      groupCols = Seq("etype"), countStar = Some("n"),
      countOf = Map("vd" -> "n_v"), sumOf = Map("vd" -> "s_v"),
      minOf = Map("ts" -> "min_ts"), maxOf = Map("ts" -> "max_ts"))
    try {
      val got = q(base)
      val files = scannedFiles(got)
      assert(files.nonEmpty && files.forall(_.contains("/mvsink/")),
        s"query must answer from the sink rollup's buckets, got $files")
      assert(got.collect().toSeq == expected,
        "accumulated sink state must be indistinguishable from the from-scratch aggregate")
    } finally MvRewriteRule.unregister(s"$dir/mvsink")
  }

  test("the SQL surface rewrites too: a view over the base matches through the alias") {
    val (base, dir) = fixture()
    val (mv, mvPath) = buildMv(base, dir)
    register(base, mv, mvPath)
    try {
      base.createOrReplaceTempView("mv_base_v")
      // SubqueryAlias canonicalizes to its child, so the view-shaped child
      // still sameResult-matches the registered frame
      val got = spark.sql(
        "SELECT etype, count(*) AS n, sum(vd) AS s FROM mv_base_v GROUP BY etype ORDER BY etype")
      assert(scannedFiles(got).forall(_.contains("/mv/")),
        s"SQL over the view must ride the MV, got ${scannedFiles(got)}")
      val direct = base.groupBy(col("etype"))
        .agg(count(lit(1)).as("n"), sum(col("vd")).as("s")).orderBy("etype")
      assert(got.collect().toSeq == direct.collect().toSeq)
    } finally {
      MvRewriteRule.unregister(mvPath)
      spark.catalog.dropTempView("mv_base_v")
    }
  }

  test("declared MV columns are validated at registration") {
    val (base, dir) = fixture()
    val (mv, mvPath) = buildMv(base, dir)
    intercept[IllegalArgumentException] {
      MvRewriteRule.register(mvPath, base, mv, groupCols = Seq("nope"))
    }
  }
}
