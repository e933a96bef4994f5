package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Semantics pins for the geo grid join and the robust-stats/sampling
  * operators. The DuckDB oracle proves cross-engine equality; these tests
  * prove the ALGORITHMS against independent references: the grid join
  * against the brute-force all-pairs answer (completeness AND
  * exactly-once), the truncated EWMA against the literal sequential
  * recursion, the reservoir race against a full-sort selection, and MAD
  * flagging against a planted outlier.
  */
class GeoStatsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("geo_grid_join equals the brute-force distance join (complete, exactly once)") {
    val session = spark
    import session.implicits._
    val grid = Geo.queries("geo_grid_join")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    // independent reference: all-pairs O(n²) over the same synthetic cloud
    val pts = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("value"),
        ((col("event_id") % 997).cast("double") / lit(3.0)).as("y"))
      .as[(Long, Double, Double)].collect()
    val brute = for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts
      if i < j
      d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj)
      if d2 <= Geo.EPS * Geo.EPS
    } yield (i, j, BigDecimal(math.sqrt(d2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(grid.size == brute.size, s"pair count: grid ${grid.size} vs brute ${brute.size}")
    assert(grid.toSet == brute.toSet, "grid join must find exactly the brute-force pairs")
    assert(grid.size == grid.toSet.size, "no pair may surface twice")
  }

  test("geo_grid_join is an equi-join on the cell id — never all-pairs") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: p.children.flatMap(nodes)
      val ns = nodes(Geo.queries("geo_grid_join")(spark, sf).queryExecution.executedPlan)
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "candidate generation must ride the (jx, jy) equi-join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("geo_knn returns the true nearest neighbor within eps for every covered point") {
    val session = spark
    import session.implicits._
    val knn = Geo.queries("geo_knn")(spark, sf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pts = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("value"),
        ((col("event_id") % 997).cast("double") / lit(3.0)).as("y"))
      .as[(Long, Double, Double)].collect()
    val brute = pts.flatMap { case (i, xi, yi) =>
      val cands = pts.collect { case (j, xj, yj) if j != i =>
        val d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj)
        (d2, j)
      }.filter(_._1 <= Geo.EPS * Geo.EPS)
      if (cands.isEmpty) None
      else {
        val (d2, j) = cands.min
        Some(i -> (j, BigDecimal(math.sqrt(d2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toMap
    assert(knn == brute, "grid kNN must agree with the brute-force nearest within eps")
  }

  test("graph_khop matches an in-memory BFS truncated at K hops") {
    val session = spark
    import session.implicits._
    val got = Graph.queries("graph_khop")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val e = Graph.coSupplyEdges(spark, sf).as[(Long, Long)].collect()
    val adj = (e ++ e.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ % 50 == 1)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (d <- 1L to 4L) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)).diff(dist.keySet)
      dist ++= next.map(_ -> d)
      frontier = next
    }
    assert(got == dist, s"BFS distances diverge: got ${got.size} rows, want ${dist.size}")
  }

  test("ts_ewma matches the literal sequential recursion truncated at W") {
    val session = spark
    import session.implicits._
    val got = Analytics.queries("ts_ewma")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map { case (u, e, v) => (u, e) -> v }.toMap
    val rows = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, Timestamp, Double)].collect()
    rows.groupBy(_._1).foreach { case (user, evs) =>
      val ordered = evs.sortBy(r => (r._3.getTime, r._2)).map(r => (r._2, r._4))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 19), i + 1).map(_._2)
        val exp = frame.tail.foldLeft(frame.head)((acc, x) => 0.25 * x + 0.75 * acc)
        val expRounded = math.round(exp * 1000000.0) / 1000000.0
        assert(got((user, ordered(i)._1)) == expRounded,
          s"user $user event ${ordered(i)._1}: got ${got((user, ordered(i)._1))}, want $expRounded")
      }
    }
  }

  test("sample_reservoir equals the full-sort top-k of the race keys and skews heavy") {
    val session = spark
    import session.implicits._
    val sample = DataPipeline.queries("sample_reservoir")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(sample.size == 100, s"sample must hold exactly k rows, got ${sample.size}")
    // reference: rank every row (no limit) and take the k smallest
    val all = graft.Tables(spark, sf, "documents").filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        round((lit(0.0) - log((conv(substring(md5(concat(lit("res:"), col("doc_id"))), 1, 15), 16, 10)
          .cast("long").cast("double") + lit(0.5)) / lit(1152921504606846976.0)))
          / col("n_chars").cast("double"), 9).as("race_key"))
      .as[(Long, Long, Double)].collect().sortBy(r => (r._3, r._1)).take(100).toSeq
    assert(sample == all, "TakeOrdered selection must equal the full-sort selection")
    // the race is weighted by n_chars: the sample must over-represent long docs
    val corpusMean = graft.Tables(spark, sf, "documents").agg(avg("n_chars"))
      .as[Double].head()
    val sampleMean = sample.map(_._2.toDouble).sum / sample.size
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
  }

  test("anomaly_mad flags a planted outlier and not the well-behaved bulk") {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-mad").toString
    // ts is raw int64 nanos in the testdata layout (Tables converts)
    val base = (1L to 200L).map(i =>
      (i, (1700000000000L + i * 1000) * 1000000L, i % 7, "click", 10.0 + (i % 11) * 0.3, "{}"))
    val planted = Seq((999L, 1700001000000L * 1000000L, 1L, "click", 500.0, "{}"))
    (base ++ planted).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.queries("anomaly_mad")(spark, dir)
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(999L), s"exactly the planted outlier must flag, got $out")
  }
}
