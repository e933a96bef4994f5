package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.plans.JoinPruneRule

/** Constraint-based join elimination (plans.JoinPruneRule): the joinless
  * plan must keep inner-join semantics exactly — including NULL-key drops
  * — and every shape the RELY contract cannot cover must keep its join.
  * Cross-engine rows are graded by join_prune_scan vs DuckDB (which
  * executes the join the engine eliminated).
  */
class JoinPruneSpec extends SparkTestBase {

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst { case j: Join => j }.isDefined

  // fact: one NULL fk row (must drop), all non-null fks resolve (RI holds)
  private def fixture(): (DataFrame, DataFrame) = {
    val session = spark
    import session.implicits._
    val dim = Seq((1L, "us", 10L), (2L, "fr", 20L), (3L, "de", 20L))
      .toDF("dk", "dname", "dregion")
    val fact = Seq(
      (100L, Some(1L), 5.0), (101L, Some(2L), 6.0),
      (102L, Some(1L), 7.0), (103L, None, 8.0))
      .toDF("fid", "fk", "amount")
    (fact, dim)
  }

  test("unused dimension join is eliminated; NULL-key rows still drop") {
    val (fact, dim) = fixture()
    def q(): DataFrame = fact.join(dim, fact("fk") === dim("dk"), "inner")
      .select(col("fid"), col("amount")).orderBy("fid")
    val expected = q().collect().toSeq // with the real join
    assert(expected.map(_.getLong(0)) == Seq(100L, 101L, 102L), "null fk drops")
    JoinPruneRule.register("dimpk", dim, Seq("dk"))
    try {
      val got = q()
      assert(!hasJoin(got), "the join must be eliminated from the analyzed plan")
      assert(got.collect().toSeq == expected, "joinless values must equal the join's")
      // dim on the LEFT eliminates too
      val flipped = dim.join(fact, fact("fk") === dim("dk"), "inner")
        .select(col("fid"), col("amount")).orderBy("fid")
      assert(!hasJoin(flipped) && flipped.collect().toSeq == expected)
    } finally JoinPruneRule.unregister("dimpk")
  }

  test("shapes outside the RELY contract keep their join") {
    val (fact, dim) = fixture()
    JoinPruneRule.register("dimpk", dim, Seq("dk"))
    try {
      // a dim column is projected
      assert(hasJoin(fact.join(dim, fact("fk") === dim("dk"))
        .select(col("fid"), col("dname"))))
      // full outer is not derivable (dim-only rows would be lost)
      assert(hasJoin(fact.join(dim, fact("fk") === dim("dk"), "full")
        .select(col("fid"), col("amount"))))
      // an extra non-key equality is a real dimension predicate
      assert(hasJoin(fact.join(dim,
        fact("fk") === dim("dk") && dim("dregion") === fact("fid"))
        .select(col("fid"))))
      // a non-equi conjunct blocks
      assert(hasJoin(fact.join(dim,
        fact("fk") === dim("dk") && dim("dregion") > 5)
        .select(col("fid"))))
    } finally JoinPruneRule.unregister("dimpk")
  }

  test("LEFT OUTER eliminates on uniqueness alone: every fact row survives, no filter") {
    val (fact, dim) = fixture()
    def q(joinCond: org.apache.spark.sql.Column): DataFrame =
      fact.join(dim, joinCond, "left").select(col("fid"), col("amount")).orderBy("fid")
    val plain = fact("fk") === dim("dk")
    val expected = q(plain).collect().toSeq
    assert(expected.map(_.getLong(0)) == Seq(100L, 101L, 102L, 103L),
      "left join preserves the NULL-fk row — the semantics elimination must keep")
    JoinPruneRule.register("dimpk", dim, Seq("dk"))
    try {
      val got = q(plain)
      assert(!hasJoin(got), "left join to the unique key must be eliminated")
      assert(got.collect().toSeq == expected, "including the NULL-fk row")
      // extra dim predicates in ON can only turn matches into non-matches:
      // still one output row per fact row, still eliminated
      val extra = q(plain && dim("dregion") > 15)
      assert(!hasJoin(extra) && extra.collect().toSeq == expected)
      // RIGHT OUTER with the dim on the left is the mirror
      val r = dim.join(fact, plain, "right").select(col("fid"), col("amount")).orderBy("fid")
      assert(!hasJoin(r) && r.collect().toSeq == expected)
    } finally JoinPruneRule.unregister("dimpk")
  }

  test("an aggregate directly over the join prunes too; dim-grouped keeps it") {
    val (fact, dim) = fixture()
    def q(): DataFrame = fact.join(dim, fact("fk") === dim("dk"), "inner")
      .groupBy(col("fk")).agg(sum(col("amount")).as("s")).orderBy("fk")
    val expected = q().collect().toSeq
    JoinPruneRule.register("dimpk", dim, Seq("dk"))
    try {
      val got = q()
      assert(!hasJoin(got), "aggregate-over-join must prune")
      assert(got.collect().toSeq == expected)
      // grouping by a dimension column uses the dim: join stays
      assert(hasJoin(fact.join(dim, fact("fk") === dim("dk"), "inner")
        .groupBy(col("dname")).agg(sum(col("amount")).as("s"))))
    } finally JoinPruneRule.unregister("dimpk")
  }

  test("a composite key must be covered exactly") {
    val session = spark
    import session.implicits._
    val dim = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c"))
      .toDF("k1", "k2", "v")
    val fact = Seq((100L, 1L, 10L), (101L, 1L, 20L), (102L, 2L, 10L))
      .toDF("fid", "f1", "f2")
    JoinPruneRule.register("cpk", dim, Seq("k1", "k2"))
    try {
      val full = fact.join(dim, fact("f1") === dim("k1") && fact("f2") === dim("k2"))
        .select(col("fid")).orderBy("fid")
      assert(!hasJoin(full), "full composite key: eliminated")
      assert(full.collect().map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L))
      // equating only k1 cannot guarantee uniqueness: join stays
      assert(hasJoin(fact.join(dim, fact("f1") === dim("k1")).select(col("fid"))))
    } finally JoinPruneRule.unregister("cpk")
  }

  test("the SQL surface prunes too: view-aliased join sides match through the alias") {
    val (fact, dim) = fixture()
    JoinPruneRule.register("dimpk", dim, Seq("dk"))
    try {
      fact.createOrReplaceTempView("jp_fact_v")
      dim.createOrReplaceTempView("jp_dim_v")
      val got = spark.sql(
        """SELECT f.fid, f.amount FROM jp_fact_v f
          |JOIN jp_dim_v d ON f.fk = d.dk ORDER BY f.fid""".stripMargin)
      assert(!hasJoin(got), "SQL join to the declared-PK view must be eliminated")
      assert(got.collect().map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L))
    } finally {
      JoinPruneRule.unregister("dimpk")
      spark.catalog.dropTempView("jp_fact_v")
      spark.catalog.dropTempView("jp_dim_v")
    }
  }

  test("registration validates declared key columns") {
    val (_, dim) = fixture()
    intercept[IllegalArgumentException] {
      JoinPruneRule.register("bad", dim, Seq("nope"))
    }
  }

  test("graded query: joinless plan scans only the fact table") {
    val df = graft.SparkEntry.queries("join_prune_scan")(spark, "/root/testdata/sf0.001")
    assert(!hasJoin(df), "nation join must be eliminated")
    assert(df.inputFiles.nonEmpty && df.inputFiles.forall(_.contains("customer")),
      s"only customer scanned, got ${df.inputFiles.toSeq}")
    assert(df.count() > 0)
  }
}
