package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every key in `queries` that also
  * appears in `oracleSql` is hash-checked against DuckDB by the driver (t2 gate);
  * keys without oracle SQL get a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.vehicleHotPath(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (CoreRelational.queries, CoreRelational.oracle),
    (MergeOps.queries, MergeOps.oracle),
    (Lookup.queries, Lookup.oracle),
    (graft.functions.ScalarFuncs.queries, graft.functions.ScalarFuncs.oracle),
    (Pipeline.queries, Pipeline.oracle),
    (Analytics.queries, Analytics.oracle),
    (TextAnalysis.queries, TextAnalysis.oracle),
    (Similarity.queries, Similarity.oracle),
    (DedupText.queries, DedupText.oracle),
    (graft.streaming.StreamingOps.queries, graft.streaming.StreamingOps.oracle),
    (graft.sources.XmlFeed.queries, graft.sources.XmlFeed.oracle),
    (graft.sources.TextFormats.queries, graft.sources.TextFormats.oracle),
    (graft.sources.JdbcSource.queries, graft.sources.JdbcSource.oracle),
    (Multimodal.queries, Multimodal.oracle),
    (Skew.queries, Skew.oracle),
    (TemporalJoins.queries, TemporalJoins.oracle),
    (DataPipeline.queries, DataPipeline.oracle),
    (BloomJoin.queries, BloomJoin.oracle),
    (IncrementalAgg.queries, IncrementalAgg.oracle),
    (MvRewrite.queries, MvRewrite.oracle),
    (Bpe.queries, Bpe.oracle),
    (JoinPrune.queries, JoinPrune.oracle),
    (Behavioral.queries, Behavioral.oracle),
    (Graph.queries, Graph.oracle),
    (Profiling.queries, Profiling.oracle),
    (Layout.queries, Layout.oracle),
    (EntityResolution.queries, EntityResolution.oracle),
    (DedupIndex.queries, DedupIndex.oracle),
    (VectorIndexOps.queries, VectorIndexOps.oracle),
    (Scd.queries, Scd.oracle),
    (Intervals.queries, Intervals.oracle),
    (Quality.queries, Quality.oracle),
    (Geo.queries, Geo.oracle),
    (HybridRetrieval.queries, HybridRetrieval.oracle)
  )

  /** A duplicate query key across modules would silently shadow one
    * implementation (and its oracle), weakening the grading gate. Fail fast.
    */
  private def merged[A](ms: Seq[Map[String, A]]): Map[String, A] = {
    val m = ms.reduce(_ ++ _)
    require(m.size == ms.map(_.size).sum,
      s"duplicate query keys across modules: " +
        ms.flatMap(_.keys).groupBy(identity).collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    m
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = merged(modules.map(_._1))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] = merged(modules.map(_._2))
}
