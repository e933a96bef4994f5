package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All graded queries are `(SparkSession, sfDir) => DataFrame`; this is the single
  * place that binds a logical table name to its parquet file so that predicate
  * pushdown / column pruning always start from a plain parquet scan relation.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Conf the `events` reader needs: its ts column is parquet TIMESTAMP(NANOS),
    * which Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) unless read as raw
    * nanos. Our own entry points (Verify/Bench/tests) set this at session build;
    * `ensureSessionConf` keeps driver-created sessions working too. The value is
    * a constant, so the (idempotent) set is race-free even under concurrent
    * query construction.
    */
  val nanosConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  def ensureSessionConf(spark: SparkSession): Unit =
    if (!spark.conf.getOption(nanosConf._1).contains(nanosConf._2))
      spark.conf.set(nanosConf._1, nanosConf._2)

  /** Register every testdata table as a temp view so plain `spark.sql`
    * works over the corpus — the SQL-first entry a user migrating from the
    * reference's psql sessions reaches for (and the graft_* functions
    * registered by GraftExtensions compose with these views directly).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Read ts as raw nanos and floor to µs — the same truncation DuckDB
      // applies when it coerces ns → its µs TIMESTAMP, so the oracle sees
      // identical values.
      ensureSessionConf(spark)
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
