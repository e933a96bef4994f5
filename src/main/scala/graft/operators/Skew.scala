package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Skew mitigation for shuffle joins (100 TB design note made executable).
  *
  * When one join key dominates (the classic hot-user / hot-route skew), a
  * plain hash-partitioned join lands the whole hot key in one task. Salting
  * splits it: the fact side derives a deterministic salt in [0, S) from the
  * full row, the dimension side replicates each row S times, and the join
  * key becomes (key, salt) — the hot key's rows now spread across S tasks.
  * Cost: S× the (small) dimension side; the big side is never replicated.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; explicit
  * salting remains the tool when AQE can't see the skew (aggregations on
  * the way in, bucketed layouts, stateful streams).
  */
object Skew {

  /** Inner salted equi-join; result is row-identical to the unsalted join.
    *
    * Default salt: a pure content hash of the full row — deterministic
    * across task retries and speculative attempts, so a row always lands on
    * the same (key, salt) replica no matter how the stage is re-executed.
    * Its blind spot: byte-identical duplicate rows (retries, log replays)
    * share a salt and stay in one task. For that duplicate-heavy shape pass
    * `positionMix = true`, which mixes in the row's physical position
    * (partition id + row index) — spreads exact duplicates, at the cost of
    * task-level placement that is NOT reproducible across retries (outputs
    * stay identical either way: the salt is dropped and the dim side
    * carries every salt replica).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int, positionMix: Boolean = false): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val content = fact.columns.map(col).toSeq
    val saltSrc =
      if (positionMix) content :+ spark_partition_id() :+ monotonically_increasing_id()
      else content
    val f = fact.withColumn("_salt", pmod(hash(saltSrc: _*), lit(salts)))
    val d = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, keys :+ "_salt", "inner").drop("_salt")
  }

  // Graded: the salted join must be row-identical to the plain join the
  // oracle computes — salting is a physical rewrite, not a semantic one.
  private val joinSalted: Q = (s, dir) => {
    val fact = Tables(s, dir, "events").select("event_id", "user_id", "value")
    val dim = Tables(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(fact, dim, Seq("user_id"), salts = 8)
      .select("event_id", "user_id", "value", "c_mktsegment")
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** The AQE path, graded end-to-end: the DEFAULT 100 TB mitigation is not
    * the explicit salt but OptimizeSkewedJoin — after the map stage AQE
    * sees real partition sizes and splits oversized ones, no rewrite in
    * user code. This query manufactures the hot-key shape deterministically
    * (70% of events collapse onto one customer key — engine-replayable, so
    * the oracle states the same CASE), forces the shuffle-merge path, and
    * tunes the skew thresholds down on a CLONED session so micro-batch-
    * sized test data crosses them the way a hot key crosses the 256 MB
    * default at corpus scale. The split is a physical rewrite only: rows
    * must be identical to the plain join, which is exactly what the hash
    * grades. PlanShapeSpec executes this query and asserts the final
    * adaptive plan carries the skew-split marker.
    */
  private val joinSkewAdaptive: Q = (s, dir) => {
    val local = s.newSession()
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // the graded result is re-shuffled by the final orderBy anyway, so
      // force the split even though OptimizeSkewedJoin normally declines
      // when downstream requirements would add an exchange; coalescing is
      // off so the skew read is not folded back into one reader
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"
    ).foreach { case (k, v) => local.conf.set(k, v) }
    val hotKey = when(col("user_id") % 10 < 7, lit(42L)).otherwise(col("user_id"))
    // skew splitting works at map-output-block granularity: a shuffle fed by
    // ONE map task (a small parquet scan is one split) has nothing to split,
    // so spread the scan first — the demonstration's only extra exchange
    val fact = Tables(local, dir, "events")
      .repartition(col("event_id"))
      .select(col("event_id"), hotKey.as("k"), col("value"))
    val dim = Tables(local, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    fact.join(dim.hint("shuffle_merge"), Seq("k"), "inner")
      .select("event_id", "k", "value", "c_mktsegment")
      .orderBy(col("event_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "join_salted" -> joinSalted,
    "join_skew_adaptive" -> joinSkewAdaptive
  )

  val oracle: Map[String, String] = Map(
    "join_salted" ->
      """SELECT event_id, user_id, value, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    // the skew split is physical-only: the oracle is the plain join over
    // the same deterministic hot-key collapse
    "join_skew_adaptive" ->
      """SELECT event_id,
        |  CASE WHEN user_id % 10 < 7 THEN 42 ELSE user_id END AS k,
        |  value, c_mktsegment
        |FROM events JOIN customer
        |  ON c_custkey = (CASE WHEN user_id % 10 < 7 THEN 42 ELSE user_id END)
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin
  )
}
