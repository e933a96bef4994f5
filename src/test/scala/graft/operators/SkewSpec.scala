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

  test("AQE skew join splits the hot partition at runtime (the built-in salting)") {
    val session = spark
    import session.implicits._
    // AQE's OptimizeSkewedJoin is the runtime answer to the same hot-key
    // problem saltedJoin solves statically: after the map stage it sees the
    // actual partition sizes and splits oversized ones into subpartitions.
    // Thresholds are tuned down so micro-batch-sized test data crosses them
    // the way a hot key crosses the 256 MB default at corpus scale.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = ((1 to 20000).map(i => (1L, i.toLong)) ++
        (1 to 200).map(i => (2L, i.toLong))).toDF("k", "payload")
      val dim = (1L to 3L).map(k => (k, s"name$k")).toDF("k", "name")
      val joined = fact.join(dim.hint("shuffle_merge"), Seq("k"), "inner")
      // materialize THIS QueryExecution (count() would build another one) so
      // the adaptive plan below is the final, post-reoptimization plan
      assert(joined.collect().length == 20200)
      // after execution the adaptive plan must record a skewed-join split:
      // the SMJ is marked isSkew and its shuffle read shows skewed specs
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew="), s"expected a skew-marked join in:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
