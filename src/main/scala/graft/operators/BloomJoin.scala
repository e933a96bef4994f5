package graft.operators

import org.apache.spark.sql.functions.col
import graft.{Q, Tables}

/** Bloom-filter pre-join: the runtime-filter pattern for semi-joins whose
  * build side is too large to broadcast as a hash table but tiny as a
  * sketch (10⁹ keys ≈ 1.2 GB at 10 bits/key vs 8+ GB exact). The probe side
  * is thinned map-side by `graft_might_contain` against a scalar-subquery
  * bloom BEFORE any exchange, and the exact semi-join afterwards removes
  * the bloom's false positives — so the RESULT is exact while the
  * probe-side shuffle carries only ~selectivity × corpus. This is the same
  * machinery Spark's own runtime row-level filtering injects for selective
  * joins; here it is explicit, composable, and graded.
  *
  * `graft_bloom_agg` / `graft_might_contain` are the spark-catalyst
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions registered
  * by GraftExtensions — no UDF; the probe is a codegen'd scalar against a
  * broadcast one-row subquery result (might_contain REQUIRES the sketch as
  * a constant or scalar subquery, which is exactly the shape that never
  * re-evaluates the build side per row).
  */
object BloomJoin {

  // Orders of BUILDING-segment customers: the segment's custkey bloom is a
  // scalar subquery (one value, broadcast with the plan), orders thin
  // map-side at the scan, the exact semi-join confirms survivors, and the
  // aggregation sees only confirmed rows.
  private val joinBloomPrefilter: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("g_bloom_orders")
    Tables(s, dir, "customer").createOrReplaceTempView("g_bloom_customer")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       count(DISTINCT o_custkey) AS n_custs
        |FROM g_bloom_orders
        |WHERE graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(c_custkey), 100000L, 1048576L)
        |     FROM g_bloom_customer WHERE c_mktsegment = 'BUILDING'),
        |    xxhash64(o_custkey))
        |  AND o_custkey IN (SELECT c_custkey FROM g_bloom_customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority""".stripMargin)
      .orderBy(col("o_orderpriority").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "join_bloom_prefilter" -> joinBloomPrefilter
  )

  // The oracle states the SEMANTICS (an exact semi-join): the bloom is an
  // optimization that must not change the answer.
  val oracle: Map[String, String] = Map(
    "join_bloom_prefilter" ->
      """SELECT o_orderpriority, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_custs
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin
  )
}
