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

  test("rotated signature equals rotate-then-xor composition (band decorrelation path)") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 100).map(i => (i.toLong, Seq.fill(50)(rnd.nextLong().abs % (1L << 60))))
    val df = rows.toDF("id", "hs")
    val rots = Seq(0, 3, 10, 59)
    def rot60(h: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
      if (k == 0) h
      else shiftleft(h.bitwiseAND(lit((1L << (60 - k)) - 1)), k)
        .bitwiseOR(shiftright(h, 60 - k))
    val fused = MinHashExpression.minhash(col("hs"), seeds, rots)
    val composed = array(seeds.zip(rots).map { case (sd, k) =>
      array_min(transform(col("hs"), h => rot60(h, k).bitwiseXOR(lit(sd))))
    }: _*)
    assert(df.select(fused.as("f"), composed.as("c"))
      .filter(not(col("f") <=> col("c"))).count() == 0)
  }

  test("rotation is a 60-bit bijection: distinct inputs stay distinct and round-trip") {
    val session = spark
    import session.implicits._
    // all-ones and single-bit values exercise both halves of the rotation;
    // each value rides a SINGLE-element array with seed 0, so the signature
    // component IS rot60(value, k) — min and xor are identities there
    val vals = Seq((1L << 60) - 1, 1L, 1L << 59, 0L, 0x123456789ABCDL)
    def rotAll(vs: Seq[Long], k: Int): Seq[Long] = {
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, Seq(v)) }.toDF("id", "hs")
      df.select(col("id"), MinHashExpression.minhash(col("hs"), Seq(0L), Seq(k)).as("s"))
        .collect().sortBy(_.getLong(0)).map(_.getSeq[Long](1).head).toSeq
    }
    val rotated = rotAll(vals, 13)
    // range: stays inside 60 bits
    rotated.foreach(r => assert(r >= 0L && r < (1L << 60), s"out of 60-bit range: $r"))
    // injectivity on the sample: pairwise distinct in, pairwise distinct out
    assert(rotated.distinct.size == vals.size,
      s"rotation collapsed distinct inputs: $rotated")
    // bijectivity: the inverse rotation (left by 60-13) restores the inputs
    assert(rotAll(rotated, 60 - 13) == vals,
      "rotate-left 13 then 47 must be the 60-bit identity")
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
