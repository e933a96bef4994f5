package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the native DotProduct expression to the built-in higher-order
  * composition it replaces (bit-exact), its null semantics, and its SQL
  * registration through GraftExtensions.
  */
class VectorExprSpec extends SparkTestBase {

  private def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("DotProduct equals the zip_with+aggregate fold bit-exactly on float arrays") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      builtinDot(col("a"), col("b")).as("builtin"))
    // bit-exact: same fold order, same double accumulation
    assert(cmp.filter(col("native") =!= col("builtin")).count() == 0)
    assert(cmp.filter(col("native").isNull).count() == 0)
  }

  test("DotProduct handles double arrays and mixed float/double inputs") {
    val session = spark
    import session.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("f", "d")
    val got = df.select(
      VectorExpressions.dot(col("f"), col("d")).as("fd"),
      VectorExpressions.dot(col("d"), col("d")).as("dd"))
      .as[(Double, Double)].collect().head
    assert(got == ((11.0, 25.0)))
  }

  test("NULL array or NULL element yields NULL (matching the built-in composition)") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0)))
    ).toDF("a", "b")
    val got = df.select(VectorExpressions.dot(col("a"), col("b")))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(None, Some(5.0)))

    val withNullElem = session.sql(
      "SELECT graft_dot(array(1.0d, NULL), array(1.0d, 2.0d)) AS d")
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    val got = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("rejects non-array arguments with a type error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(1, 2)").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }
}
