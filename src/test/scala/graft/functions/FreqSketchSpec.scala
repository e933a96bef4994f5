package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the Misra–Gries aggregate's guarantees — the facts the graded
  * `agg_heavy_hitters` gate relies on:
  *   - estimates never overcount, and undercount by at most n/(k+1);
  *   - every item with true count > n/(k+1) is present in the candidate map;
  *   - both hold under different partitionings (the merge path);
  *   - exact counts when the domain fits in k counters.
  */
class FreqSketchSpec extends SparkTestBase {

  private val K = 8

  /** Planted stream: 'hot' = 500, 'warm' = 200, 300 unique cold keys.
    * n = 1000, so the guarantee threshold n/(k+1) = 111.1. */
  private def planted = {
    val session = spark
    import session.implicits._
    val rows = Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 300).map(i => s"cold$i")
    rows.toDF("k")
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val session = spark
    import session.implicits._
    df.agg(expr(s"graft_topk_freq(k, $K)").as("m"))
      .select(explode(col("m")))
      .as[(String, Long)].collect().toMap
  }

  private def exactOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val session = spark
    import session.implicits._
    df.groupBy("k").count().as[(String, Long)].collect().toMap
  }

  test("never overcounts; undercounts by at most n/(k+1); heavy items always present") {
    val df = planted
    val exact = exactOf(df)
    val n = exact.values.sum
    val bound = n / (K + 1) // 111
    Seq(df.repartition(1), df.repartition(13)).foreach { part =>
      val sk = sketchOf(part)
      assert(sk.size <= K, s"sketch must hold at most $K counters, got ${sk.size}")
      sk.foreach { case (key, est) =>
        val truth = exact(key)
        assert(est <= truth, s"$key: estimate $est overcounts true $truth")
        assert(truth - est <= bound,
          s"$key: undercount ${truth - est} exceeds the n/(k+1) bound $bound")
      }
      exact.filter(_._2 > bound).keys.foreach { heavy =>
        assert(sk.contains(heavy),
          s"item '$heavy' above the guarantee threshold must be a candidate")
      }
    }
  }

  test("exact when the domain fits in k counters") {
    val session = spark
    import session.implicits._
    val df = (Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")).toDF("k")
    assert(sketchOf(df.repartition(5)) == Map("a" -> 7L, "b" -> 4L, "c" -> 2L),
      "with |domain| <= k no decrement ever fires: the sketch is the exact histogram")
  }

  test("null inputs are skipped; grouped sketches stay per-group") {
    val session = spark
    import session.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", null), ("g2", "y")).toDF("g", "k")
    val m = df.groupBy("g").agg(expr(s"graft_topk_freq(k, 4)").as("m"))
      .select(col("g"), col("m")).collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(m("g1") == Map("x" -> 2L))
    assert(m("g2") == Map("y" -> 1L))
  }

  test("property: guarantees hold for random skewed streams under random partitioning") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val session = spark
    import session.implicits._
    // raw generators + fixed seeds, the MergeSpec convention (no
    // scalatest<->scalacheck bridge in the offline cache)
    val gen: Gen[(List[String], Int)] = for {
      n <- Gen.choose(50, 400)
      heavyWeight <- Gen.choose(10, 50)
      items <- Gen.listOfN(n, Gen.frequency(
        (heavyWeight, Gen.const("heavy")),
        (5, Gen.oneOf("w1", "w2", "w3")),
        (10, Gen.choose(0, 500).map(i => s"t$i"))))
      parts <- Gen.choose(1, 16)
    } yield (items, parts)
    (0 until 10).foreach { i =>
      val (items, parts) =
        gen.apply(Gen.Parameters.default, Seed(i * 7L + 1)).getOrElse((Nil, 1))
      if (items.nonEmpty) {
        val df = items.toDF("k").repartition(parts)
        val sk = sketchOf(df)
        val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val bound = items.size / (K + 1)
        assert(sk.size <= K, s"seed $i: size ${sk.size} > $K")
        sk.foreach { case (key, est) =>
          assert(est <= exact(key), s"seed $i: $key overcounted ($est > ${exact(key)})")
          assert(exact(key) - est <= bound,
            s"seed $i: $key undercount ${exact(key) - est} > bound $bound (n=${items.size}, parts=$parts)")
        }
        exact.filter(_._2 > bound).keys.foreach(h =>
          assert(sk.contains(h), s"seed $i: heavy '$h' missing (parts=$parts)"))
      }
    }
  }

  test("k must be a literal; non-string input fails analysis") {
    val session = spark
    import session.implicits._
    val df = Seq(1L, 2L).toDF("v")
    df.createOrReplaceTempView("freq_bad_input")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_topk_freq(v, 4) FROM freq_bad_input").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
