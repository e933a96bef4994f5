package graft

import org.apache.spark.sql.SparkSession

/** Per-query wall-clock profiler with the Bench session config: times each
  * named query REPS times after a warm-up, printing every rep so variance is
  * visible (Bench medians whole sweeps; this drills into one query).
  *
  * Usage: runMain graft.TimeQuery [sfDir] [queryName...]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 3)
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config(Tables.ntzConf._1, Tables.ntzConf._2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables(spark, sfDir, n).limit(1).count())
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            q(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            // cache teardown between reps is harness hygiene, not query cost
            spark.sharedState.cacheManager.clearCache()
            dt
          }
          println(f"[time] $n%-24s ${times.map(t => f"$t%.2f").mkString(" ")} s")
        case None => println(s"[time] unknown query: $n")
      }
    }
    spark.stop()
  }
}
