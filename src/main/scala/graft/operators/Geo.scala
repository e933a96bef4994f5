package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Spatial distance joins at scale — the grid-cell equi-join kernel.
  *
  * The reference constructs lon/lat points (`agency.py:179,308` builds
  * PostGIS points but never measures distance), so point construction is
  * already graded (`geo_point`). This module adds the operation a fleet /
  * geo-events pipeline actually needs at 100 TB: "all pairs of points within
  * distance ε" — which is a cartesian product if written naively, and the
  * classic grid-join if written correctly.
  *
  * Kernel: snap every point to an ε-sized grid cell `(⌊x/ε⌋, ⌊y/ε⌋)`. Any
  * pair within ε lies in the same or an adjacent cell, so candidate
  * generation is an EQUI-join on the cell id — shuffle both sides by cell,
  * never compare across distant cells. The refinement (exact distance ≤ ε)
  * runs inside the join.
  *
  * Each qualifying pair must surface EXACTLY once (the hash gate forbids
  * dedup-by-accident), so the neighborhood is enumerated as a HALF plane,
  * not the full 3×3: the left side explodes only the offsets
  * {(0,0),(1,0),(−1,1),(0,1),(1,1)} — for every ± offset pair exactly one
  * direction is present. A pair in cells c_a ≠ c_b matches exactly one
  * (orientation, offset) combination; a same-cell pair is oriented by
  * `id_a < id_b` on the (0,0) offset. 5 exploded rows per point instead of
  * 9 — 45% less shuffle input than the textbook full-neighborhood join, and
  * zero post-join DISTINCT.
  *
  * 100 TB shape: one exchange of 5n exploded probe rows + one of n home
  * rows, hash-joined on two long keys; no broadcast (both sides are the
  * corpus), no BNLJ, no cartesian. A dense cell (urban hot spot) is the
  * skew case: its cost is bounded by points-per-cell², and the mitigation
  * is the stock one — AQE skew split sees the fat cell partition (the
  * `join_skew_adaptive` demonstration applies unchanged), or shrink ε.
  *
  * Points are synthesized deterministically from `events` (the testdata has
  * no geo columns): x = value, y = (event_id mod 997)/3 — a box of roughly
  * 560×333 units whose density at sf0.01 gives each point ~0.2 neighbors
  * within ε = 1. The oracle replays the same construction literally.
  */
object Geo {

  private[operators] val EPS = 1.0

  /** Half-neighborhood: one representative of each ± offset direction. */
  private val HALF_OFFSETS = Seq((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))

  /** (id, x, y, cx, cy) — deterministic point cloud from events. */
  private def pts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_id").as("id"), col("value").as("x"),
        ((col("event_id") % 997).cast("double") / lit(3.0)).as("y"))
      .withColumn("cx", floor(col("x") / lit(EPS)).cast("long"))
      .withColumn("cy", floor(col("y") / lit(EPS)).cast("long"))

  private val geoGridJoin: Q = (s, dir) => {
    val p = pts(s, dir)
    val offs = array(HALF_OFFSETS.map { case (dx, dy) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"))
    }: _*)
    val a = p.select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"), explode(offs).as("o"))
      .select(col("a_id"), col("ax"), col("ay"),
        (col("cx") + col("o.dx")).as("jx"), (col("cy") + col("o.dy")).as("jy"),
        col("o.dx").as("dx"), col("o.dy").as("dy"))
    val b = p.select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
      col("cx").as("jx"), col("cy").as("jy"))
    // same-cell offset orients by id; cross-cell offsets are already unique
    val once = (col("dx") =!= 0 || col("dy") =!= 0) || col("a_id") < col("b_id")
    // fixed syntactic order (a − b)² + (a − b)² so both engines fold the
    // same IEEE doubles; sqrt is correctly rounded on both, then 6 dp
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    a.join(b, Seq("jx", "jy"))
      .filter(once)
      .withColumn("d2", d2)
      .filter(col("d2") <= lit(EPS * EPS))
      .select(least(col("a_id"), col("b_id")).as("id1"),
        greatest(col("a_id"), col("b_id")).as("id2"),
        round(sqrt(col("d2")), 6).as("dist"))
      .orderBy(col("id1").asc_nulls_first, col("id2").asc_nulls_first)
  }

  /** Nearest neighbor within ε per point — the "closest stop to each
    * vehicle" lookup, grid-bounded. The probe side explodes the FULL 3×3
    * neighborhood this time (selection is per-probe, so every probe needs
    * all its candidates on one key), candidates equi-join on the cell, and
    * the argmin collapses in the partial aggregate (`min_by` over the
    * (d2, id) struct — map-side combine, no per-probe sort, no window).
    * Points with no neighbor within ε drop out, which is the declared
    * semantics: ε is the search radius, and a radius-miss at 100 TB is
    * re-queried at 2ε, not answered by an unbounded global scan.
    */
  private val geoKnn: Q = (s, dir) => {
    val p = pts(s, dir)
    val offs = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val a = p.select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"), explode(offs).as("o"))
      .select(col("a_id"), col("ax"), col("ay"),
        (col("cx") + col("o.dx")).as("jx"), (col("cy") + col("o.dy")).as("jy"))
    val b = p.select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
      col("cx").as("jx"), col("cy").as("jy"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    a.join(b, Seq("jx", "jy"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("d2", d2)
      .filter(col("d2") <= lit(EPS * EPS))
      .groupBy(col("a_id").as("id"))
      .agg(min_by(struct(col("b_id"), col("d2")), struct(col("d2"), col("b_id"))).as("nn"))
      .select(col("id"), col("nn.b_id").as("neighbor_id"),
        round(sqrt(col("nn.d2")), 6).as("dist"))
      .orderBy(col("id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "geo_grid_join" -> geoGridJoin,
    "geo_knn" -> geoKnn
  )

  val oracle: Map[String, String] = Map(
    // literal replay of the half-neighborhood construction
    "geo_grid_join" ->
      s"""WITH pts AS (
         |  SELECT event_id AS id, value AS x, (event_id % 997) / 3.0 AS y,
         |         CAST(floor(value / $EPS) AS BIGINT) AS cx,
         |         CAST(floor(((event_id % 997) / 3.0) / $EPS) AS BIGINT) AS cy
         |  FROM events),
         |offs(dx, dy) AS (VALUES (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)),
         |cand AS (
         |  SELECT a.id AS a_id, b.id AS b_id,
         |         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
         |  FROM pts a CROSS JOIN offs o
         |  JOIN pts b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
         |  WHERE (o.dx <> 0 OR o.dy <> 0) OR a.id < b.id)
         |SELECT least(a_id, b_id) AS id1, greatest(a_id, b_id) AS id2,
         |       round(sqrt(d2), 6) AS dist
         |FROM cand WHERE d2 <= ${EPS * EPS}
         |ORDER BY id1 ASC NULLS FIRST, id2 ASC NULLS FIRST""".stripMargin,
    // full-neighborhood candidates, per-probe argmin by (d2, id)
    "geo_knn" ->
      s"""WITH pts AS (
         |  SELECT event_id AS id, value AS x, (event_id % 997) / 3.0 AS y,
         |         CAST(floor(value / $EPS) AS BIGINT) AS cx,
         |         CAST(floor(((event_id % 997) / 3.0) / $EPS) AS BIGINT) AS cy
         |  FROM events),
         |offs(dx, dy) AS (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0),
         |                        (0, 1), (1, -1), (1, 0), (1, 1)),
         |cand AS (
         |  SELECT a.id, b.id AS b_id,
         |         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
         |  FROM pts a CROSS JOIN offs o
         |  JOIN pts b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
         |  WHERE a.id <> b.id),
         |ranked AS (
         |  SELECT id, b_id, d2,
         |         row_number() OVER (PARTITION BY id ORDER BY d2 ASC, b_id ASC) AS rk
         |  FROM cand WHERE d2 <= ${EPS * EPS})
         |SELECT id, b_id AS neighbor_id, round(sqrt(d2), 6) AS dist
         |FROM ranked WHERE rk = 1
         |ORDER BY id ASC NULLS FIRST""".stripMargin
  )
}
