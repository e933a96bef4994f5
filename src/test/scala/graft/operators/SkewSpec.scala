package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  test("salted join equals the plain join and splits the hot key across salts") {
    val session = spark
    import session.implicits._
    // 90% of fact rows share key 1 — the hot-key shape
    val fact = ((1 to 900).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (2L, i.toLong)))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unused")).toDF("k", "name")

    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
    val plain = fact.join(dim, Seq("k"), "inner")
    assert(salted.count() == 1000)
    assert(salted.select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq ==
      plain.select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq)

    // the effective shuffle key (k, salt) must break the hot key apart:
    // no single (k, salt) group may hold more than ~a third of the hot rows
    val maxGroup = fact
      .withColumn("_salt", pmod(hash(fact.columns.map(col): _*), lit(8)))
      .groupBy("k", "_salt").count()
      .agg(max("count")).as[Long].collect().head
    assert(maxGroup < 300, s"hot key insufficiently split: max group $maxGroup of 900")
  }
}
