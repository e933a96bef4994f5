package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** SURVEY §5 item 3: merge-sink properties. The reference gets idempotent
  * re-delivery from `ON CONFLICT` (agency.py:26-37, 221-232); the Spark
  * engine must prove the same algebra on its join-based merges.
  *
  * Properties are driven with raw ScalaCheck generators under fixed seeds
  * (the scalatest<->scalacheck bridge artifact isn't in the offline cache),
  * so failures are reproducible by seed index.
  */
class MergeSpec extends SparkTestBase {

  private def kv(rows: Seq[(Long, String)]): DataFrame = {
    val session = spark
    import session.implicits._
    rows.toDF("k", "v")
  }

  private def canon(df: DataFrame): Set[(Long, String)] = {
    val session = spark
    import session.implicits._
    df.as[(Long, String)].collect().toSet
  }

  private val rowsGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(0, 12)
    ks <- Gen.listOfN(n, Gen.choose(0L, 7L))
    vs <- Gen.listOfN(n, Gen.alphaStr.map(_.take(3)))
  } yield ks.zip(vs).distinctBy(_._1) // unique keys per frame, like a table PK

  private def sample(g: Gen[Seq[(Long, String)]], seed: Long): Seq[(Long, String)] =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Seq.empty)

  test("upsert is idempotent: upsert(upsert(t,s),s) == upsert(t,s)") {
    (0 until 15).foreach { i =>
      val t = sample(rowsGen, i * 2L)
      val s = sample(rowsGen, i * 2L + 1)
      val once = MergeOps.upsert(kv(t), kv(s), Seq("k"))
      val twice = MergeOps.upsert(once, kv(s), Seq("k"))
      assert(canon(twice) == canon(once), s"seed pair $i: t=$t s=$s")
    }
  }

  test("upsert: source wins on conflict, both sides' keys survive") {
    val t = kv(Seq(1L -> "old", 2L -> "keep"))
    val s = kv(Seq(1L -> "new", 3L -> "ins"))
    assert(canon(MergeOps.upsert(t, s, Seq("k"))) ==
      Set(1L -> "new", 2L -> "keep", 3L -> "ins"))
  }

  test("insertIfAbsent is idempotent and target-wins") {
    (0 until 15).foreach { i =>
      val t = sample(rowsGen, 1000L + i * 2)
      val s = sample(rowsGen, 1000L + i * 2 + 1)
      val once = MergeOps.insertIfAbsent(kv(t), kv(s), Seq("k"))
      val twice = MergeOps.insertIfAbsent(once, kv(s), Seq("k"))
      assert(canon(twice) == canon(once), s"seed pair $i: t=$t s=$s")
      val tgt = t.toMap
      assert(canon(once).filter(r => tgt.contains(r._1)).forall(r => tgt(r._1) == r._2),
        s"seed pair $i: target rows changed")
    }
  }

  test("upsert carries NULLs from the source (ON CONFLICT DO UPDATE SET col=EXCLUDED.col)") {
    val session = spark
    import session.implicits._
    val t = Seq((1L, Option("x"))).toDF("k", "v")
    val s = Seq((1L, Option.empty[String])).toDF("k", "v")
    val out = MergeOps.upsert(t, s, Seq("k")).as[(Long, Option[String])].collect().toSet
    assert(out == Set((1L, None)))
  }

  test("upsert on a NULL-bearing key column uses null-safe equality (COALESCE-key semantics)") {
    val session = spark
    import session.implicits._
    val t = Seq((Option.empty[String], "old"), (Option("a"), "x")).toDF("k", "v")
    val s = Seq((Option.empty[String], "new")).toDF("k", "v")
    val out = MergeOps.upsert(t, s, Seq("k")).as[(Option[String], String)].collect().toSet
    assert(out == Set((None, "new"), (Some("a"), "x")))
  }
}
