package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** SURVEY §5 item 2: the reference's null/unmatched edge cases on tiny
  * frames — NULL service tag (route.py:35-37), unmatched dirTag drop
  * (route.py:183-194), NULL-location backfill pick (agency.py:141-170).
  */
class LookupEdgeSpec extends SparkTestBase {

  test("two-level fallback chain: hit-primary, hit-fallback, drop") {
    val session = spark
    import session.implicits._
    val vehicles = Seq(("v1", "d1"), ("v2", "d2"), ("v3", "dX")).toDF("vid", "dirTag")
    val routeDict = Seq(("d1", "svc-route")).toDF("tag", "route_svc")
    val agencyDict = Seq(("d1", "svc-agency"), ("d2", "svc-agency2")).toDF("tag", "agency_svc")

    val resolved = vehicles
      .join(broadcast(routeDict), col("dirTag") === routeDict("tag"), "left")
      .join(broadcast(agencyDict), col("dirTag") === agencyDict("tag"), "left")
      .withColumn("service", coalesce(col("route_svc"), col("agency_svc")))

    val kept = resolved.filter(col("service").isNotNull)
      .select("vid", "service").as[(String, String)].collect().toSet
    // route-scoped dict wins over agency-wide; unknown tag dropped
    assert(kept == Set(("v1", "svc-route"), ("v2", "svc-agency2")))
    assert(resolved.filter(col("service").isNull).select("vid")
      .as[String].collect().toSeq == Seq("v3"))
  }

  test("NULL-tag synthetic service row joins via null-safe key (COALESCE(tag,''))") {
    val session = spark
    import session.implicits._
    // One NULL-tag service per route (route.py:35-37); uniqueness on
    // (route_id, COALESCE(tag,'')) must treat the NULLs as one key.
    val services = Seq(("r1", Option("in")), ("r1", Option.empty[String]),
      ("r1", Option.empty[String])).toDF("route_id", "tag")
    val deduped = services.groupBy(col("route_id"),
      coalesce(col("tag"), lit("")).as("tag_key")).count()
    val rows = deduped.as[(String, String, Long)].collect().toSet
    assert(rows == Set(("r1", "in", 1L), ("r1", "", 2L)))
  }

  test("backfill picks the deterministic argmin row; no-match rows stay NULL") {
    val session = spark
    import session.implicits._
    // Stops sharing tag "t" with different coords: the (lon,lat,name) argmin
    // must be chosen (agency.py:146-151 sort-then-first). Tag "u" has no
    // coordinate-bearing row → NULLs survive (agency.py:160-170).
    val body = Seq(
      ("t", Some(2.0), Some(1.0), Some("b")),
      ("t", Some(1.0), Some(9.0), Some("a")),
      ("u", None, None, None)
    ).toDF("tag", "lon", "lat", "name")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("tag")
      .orderBy(col("lon").asc_nulls_first, col("lat").asc_nulls_first, col("name").asc_nulls_first)
    val best = body.filter(col("lon").isNotNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val missing = Seq("t", "u").toDF("tag")
    val filled = missing.join(best, Seq("tag"), "left")
      .select("tag", "lon", "lat", "name")
      .as[(String, Option[Double], Option[Double], Option[String])].collect().toSet
    assert(filled == Set(
      ("t", Some(1.0), Some(9.0), Some("a")),
      ("u", None, None, None)))
  }
}
