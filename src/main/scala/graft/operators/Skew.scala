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

  val queries: Map[String, Q] = Map("join_salted" -> joinSalted)

  val oracle: Map[String, String] = Map(
    "join_salted" ->
      """SELECT event_id, user_id, value, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin
  )
}
