package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the fused SimHash expression to the per-bit filter/size composition
  * it replaces (the form the DuckDB oracles state), including null elements
  * and the empty-array all-bits edge.
  */
class SimHashExprSpec extends SparkTestBase {

  private def composed(bits: Int) =
    (0 until bits).map { b =>
      when(size(filter(col("hs"), h => pmod(shiftright(h, b), lit(2)) === 1)) * 2
        >= size(col("hs")), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("fused signature equals the per-bit composition (random arrays, 16 and 60 bits)") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % (1L << 60))))
    val df = rows.toDF("id", "hs")
    Seq(16, 60).foreach { bits =>
      val n = df.filter(
        SimHashExpression.simhash(col("hs"), bits) =!= composed(bits)).count()
      assert(n == 0, s"$bits-bit fused simhash diverged from the composition on $n rows")
    }
  }

  test("null elements are excluded from the vote but count in the denominator") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, Seq[Option[Long]](Some(1L), None, None))).toDF("id", "hs")
    // bit 0: one set vote of count 1 among 3 elements → 2*1 < 3 → unset,
    // exactly what filter(null-pred drops)/size(counts nulls) yields
    val Seq(fused, comp) = df.select(
      SimHashExpression.simhash(col("hs"), 4),
      composed(4)).as[(Long, Long)].head() match { case (a, b) => Seq(a, b) }
    assert(fused == comp && fused == 0L)
  }

  test("empty array yields all bits set (the 0 >= 0 edge, matching the composition)") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, Seq.empty[Long])).toDF("id", "hs")
    val Seq(fused, comp) = df.select(
      SimHashExpression.simhash(col("hs"), 8),
      composed(8)).as[(Long, Long)].head() match { case (a, b) => Seq(a, b) }
    assert(fused == comp && fused == 255L)
  }

  test("graft_simhash is callable from SQL") {
    val session = spark
    import session.implicits._
    val got = spark.sql("SELECT graft_simhash(array(1L, 1L, 2L), 2)").as[Long].head()
    // bit 0: votes 2/3 set → set; bit 1: 1/3 → unset
    assert(got == 1L)
  }
}
