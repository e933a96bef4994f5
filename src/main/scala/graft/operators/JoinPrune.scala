package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.plans.JoinPruneRule

/** Graded surface for constraint-based join elimination
  * ([[graft.plans.JoinPruneRule]]): declare nation's primary key RELY,
  * run the generated-BI shape — join the dimension, project only fact
  * columns — and the optimizer must drop the join entirely
  * (JoinPruneSpec pins the joinless plan and the customer-only scan
  * set), while the DuckDB oracle EXECUTES the join and must see
  * identical rows — the referential-integrity algebra end-to-end.
  */
object JoinPrune {

  private val joinPruneScan: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
    val nat = Tables(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    JoinPruneRule.register(s"$dir/nation_pk", nat, Seq("n_nationkey"))
    cust.join(nat, cust("c_nationkey") === nat("n_nationkey"), "inner")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map("join_prune_scan" -> joinPruneScan)

  val oracle: Map[String, String] = Map(
    // the oracle RUNS the join the engine eliminated: equal rows IS the
    // referential-integrity guarantee the RELY declaration asserts
    "join_prune_scan" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY c.c_custkey ASC NULLS FIRST""".stripMargin
  )
}
