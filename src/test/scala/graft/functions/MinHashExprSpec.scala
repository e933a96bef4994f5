package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the fused MinHashSignature expression to the K-pass composition it
  * replaces, including the empty-array and null-element edges.
  */
class MinHashExprSpec extends SparkTestBase {

  private val seeds = Seq(0L, 0x9E37L, 0x1234567L, 0xFFFFL)

  test("fused signature equals K separate array_min(transform(xor)) passes") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 100).map(i => (i.toLong, Seq.fill(50)(rnd.nextLong().abs % (1L << 60))))
    val df = rows.toDF("id", "hs")
    val fused = MinHashExpression.minhash(col("hs"), seeds)
    val composed = array(seeds.map(sd =>
      array_min(transform(col("hs"), h => h.bitwiseXOR(lit(sd))))): _*)
    assert(df.select(fused.as("f"), composed.as("c"))
      .filter(not(col("f") <=> col("c"))).count() == 0)
  }

  test("empty array yields an all-NULL signature; null elements are skipped") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, Seq.empty[Option[Long]]),
      (2L, Seq(Some(5L), None, Some(9L)))
    ).toDF("id", "hs")
    val got = df.select(col("id"), MinHashExpression.minhash(col("hs"), Seq(0L, 1L)).as("sig"))
      .as[(Long, Seq[Option[Long]])].collect().toMap
    assert(got(1L) == Seq(None, None))
    assert(got(2L) == Seq(Some(5L), Some(4L))) // min(5,9)=5; min(5^1=4, 9^1=8)=4
  }
}
