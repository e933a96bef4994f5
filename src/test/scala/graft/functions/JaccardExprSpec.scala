package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bit-equivalence of the fused native Jaccard kernel with the builtin
  * composition it replaces — over duplicates, null elements, empty arrays,
  * disjoint/identical sets, and the 0/0 → NaN edge. If the two ever
  * diverge on any row the dedup-verify oracles would split, so this spec
  * is the license for the hot-path swap.
  */
class JaccardExprSpec extends SparkTestBase {

  test("graft_jaccard is bit-equal to size(array_intersect)/size(array_union)") {
    val session = spark
    import session.implicits._
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")),      // duplicates: distinct semantics
      (Seq("a", null, "b"), Seq(null.asInstanceOf[String], "c")), // null members
      (Seq.empty[String], Seq("x")),
      (Seq("same"), Seq("same")),
      (Seq("x", "y"), Seq("p", "q"))
    ).toDF("a", "b")
    val both = rows.select(
      expr("graft_jaccard(a, b)").as("fused"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("builtin"))
    both.collect().foreach { r =>
      val (f, g) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.compare(f, g) == 0,
        s"fused=$f builtin=$g must be bit-equal (NaN included)")
    }
  }

  test("two empty sets yield NULL (the ANSI builtin would raise DIVIDE_BY_ZERO)") {
    val session = spark
    import session.implicits._
    val rows = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    assert(rows.select(expr("graft_jaccard(a, b)")).collect().head.isNullAt(0),
      "similarity of two empty sets is undefined -> NULL, never an error or a number")
  }

  test("NULL input array yields NULL, and non-array inputs fail to type-check") {
    val session = spark
    import session.implicits._
    val rows = Seq((Seq("a"), null.asInstanceOf[Seq[String]])).toDF("a", "b")
    assert(rows.select(expr("graft_jaccard(a, b)")).collect().head.isNullAt(0))
    val e = intercept[Exception](
      Seq((1, 2)).toDF("a", "b").select(expr("graft_jaccard(a, b)")).collect())
    assert(e.getMessage.toLowerCase.contains("array"),
      s"type-check failure must name the expected type, got: ${e.getMessage}")
  }
}
