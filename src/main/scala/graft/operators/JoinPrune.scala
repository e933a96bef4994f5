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

  /** The weaker declaration: a LEFT OUTER join to a unique key never
    * drops or duplicates a fact row, so elimination needs uniqueness
    * alone (no referential integrity, no residual filter). */
  private val joinPruneOuter: Q = (s, dir) => {
    val ord = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    JoinPruneRule.register(s"$dir/customer_pk", cust, Seq("c_custkey"))
    ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "join_prune_scan" -> joinPruneScan,
    "join_prune_outer" -> joinPruneOuter)

  val oracle: Map[String, String] = Map(
    // the oracle RUNS the join the engine eliminated: equal rows IS the
    // referential-integrity guarantee the RELY declaration asserts
    "join_prune_scan" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY c.c_custkey ASC NULLS FIRST""".stripMargin,
    "join_prune_outer" ->
      """SELECT o.o_orderkey, o.o_totalprice
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey ASC NULLS FIRST""".stripMargin
  )
}
