package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forensics for the char-gram LSH cost profile (BENCH_sf1.md): per-stage
  * counts — docs, banded rows, bucket-size distribution, capped buckets,
  * surviving candidate pairs, verified pairs — so a bench ratio can be
  * attributed to a stage instead of argued. Test-scope: diagnostic, not a
  * shipped surface.
  *
  * Usage: sbt "Test/runMain graft.operators.NgramDiag <sfDir>"
  */
object NgramDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.nanosConf._1, graft.Tables.nanosConf._2)
      .config(graft.Tables.ntzConf._1, graft.Tables.ntzConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val mh = DedupText.minhashedFrom(DedupText.shingledChars(spark, dir)).cache()
    val nDocs = mh.count()
    val bands = DedupText.banded(mh.filter(size(col("s")) > 0), 2)
    val sizes = bands.groupBy("band", "sig").agg(count(lit(1)).as("bsz")).cache()
    val nBuckets = sizes.count()
    val capped = sizes.filter(col("bsz") > DedupText.MAX_BUCKET)
    val nCapped = capped.count()
    val cappedRows = capped.agg(coalesce(sum("bsz"), lit(0L))).head().get(0).asInstanceOf[Number].longValue()
    val pairsInKept = sizes.filter(col("bsz") <= DedupText.MAX_BUCKET)
      .agg(coalesce(sum(col("bsz") * (col("bsz") - 1) / 2), lit(0L))).head().get(0).asInstanceOf[Number].longValue()
    val top = sizes.orderBy(col("bsz").desc).limit(5).collect()
      .map(r => r.get(2).asInstanceOf[Number].longValue()).mkString(", ")
    val verified = DedupText.verifiedPairsFrom(DedupText.shingledChars(spark, dir), 0.6, nBands = 2).count()
    println(s"=== NgramDiag $dir")
    println(s"docs=$nDocs buckets=$nBuckets cappedBuckets=$nCapped cappedRows=$cappedRows")
    println(s"candidatePairsInKeptBuckets=$pairsInKept verifiedPairs=$verified top5BucketSizes=[$top]")
    spark.stop()
  }
}
