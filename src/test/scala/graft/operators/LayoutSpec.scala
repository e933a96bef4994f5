package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Quantifies the z-order claim on real parquet files: per-file min/max
  * stats (what a reader's file/row-group skipping consults) must bound a
  * user_id point predicate to a fraction of the z-ordered files, while a
  * purely time-sorted layout leaves every file a candidate.
  */
class LayoutSpec extends SparkTestBase {

  private def events = Tables(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "ts", "user_id", "value")

  test("z-order bounds both dimensions per file; a time-sort leaves user_id unprunable") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val zPath = s"$dir/z"
    val tPath = s"$dir/t"
    val nFiles = 16
    Layout.writeZOrdered(events, col("user_id"), unix_micros(col("ts")), nFiles, zPath)
    events.repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions(col("ts")).write.parquet(tPath)

    // per-file [min,max] of user_id — exactly the stats a skipping reader uses
    def userRanges(path: String): Seq[(Long, Long)] =
      new java.io.File(path).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min("user_id"), max("user_id")).head()
          (r.getLong(0), r.getLong(1))
        }

    val probe = events.agg(expr("percentile(user_id, 0.25)")).head().getDouble(0).toLong
    val zr = userRanges(zPath)
    val tr = userRanges(tPath)
    assert(zr.size >= nFiles - 1 && tr.size >= nFiles - 1, "both layouts must emit the requested files")

    val zCover = zr.count { case (lo, hi) => lo <= probe && probe <= hi }
    val tCover = tr.count { case (lo, hi) => lo <= probe && probe <= hi }
    assert(tCover == tr.size,
      s"time-sorted layout: every file spans the id space (got $tCover of ${tr.size})")
    assert(zCover <= zr.size / 2,
      s"z-ordered layout must prune a user point predicate to ≤ half its files, got $zCover of ${zr.size}")

    // and the layout is a pure permutation — nothing lost or duplicated
    assert(spark.read.parquet(zPath).count() == events.count())
    assert(spark.read.parquet(zPath).select(sum(col("event_id"))).head().getLong(0) ==
      events.select(sum(col("event_id"))).head().getLong(0))
  }
}
