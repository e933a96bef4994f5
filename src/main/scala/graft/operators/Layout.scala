package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multi-dimensional data layout — Z-ORDER clustering for scan pruning.
  *
  * Parquet readers skip whole files/row-groups whose min/max stats exclude a
  * predicate. A single-column sort gives perfect pruning on that column and
  * NONE on any other; interleaving the bits of two columns (the Z-curve)
  * gives every file a small bounding BOX over both, so point/range
  * predicates on EITHER column (or both) prune — the layout trick behind
  * Delta/Iceberg OPTIMIZE ZORDER, and at 100 TB the difference between a
  * full scan and touching a few files when the filter isn't on the sort key.
  *
  * Mechanics: each dimension is min/max-normalized to 16 bits, the bits are
  * interleaved into a 32-bit z-value, and `repartitionByRange(z)` +
  * `sortWithinPartitions(z)` makes each output file a contiguous z-range —
  * a small rectangle in (a, b) space. Normalization bounds come from one
  * tiny aggregate broadcast back over the rows (no driver round-trip, no
  * collect). The z-value itself is plain codegen'd bit arithmetic.
  *
  * LayoutSpec quantifies the claim on real files: a z-ordered layout prunes
  * a user_id point predicate to a fraction of its files where a time-sorted
  * layout must read every file.
  */
object Layout {

  /** Bit-interleave two `bits`-wide non-negative longs: bit i of `a` lands
    * at 2i, bit i of `b` at 2i+1. Statically unrolled — whole-stage codegen
    * sees straight-line shifts and ORs.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }

  private val ZBits = 16

  /** `df` with a `_z` column: the Z-curve position of (`a`, `b`), each
    * min/max-normalized to 16 bits. `a`/`b` must be numeric (cast timestamps
    * with `unix_micros` first).
    */
  def withZ(df: DataFrame, a: Column, b: Column): DataFrame = {
    val bounds = df.agg(
      min(a).cast("double").as("_amin"), max(a).cast("double").as("_amax"),
      min(b).cast("double").as("_bmin"), max(b).cast("double").as("_bmax"))
    def norm(c: Column, lo: Column, hi: Column): Column =
      when(hi > lo,
        ((c.cast("double") - lo) / (hi - lo) * ((1 << ZBits) - 1)).cast("long"))
        .otherwise(lit(0L))
    df.join(broadcast(bounds))
      .withColumn("_z", interleaveBits(
        norm(a, col("_amin"), col("_amax")),
        norm(b, col("_bmin"), col("_bmax")), ZBits))
      .drop("_amin", "_amax", "_bmin", "_bmax")
  }

  /** Write `df` as `files` parquet files z-ordered on (`a`, `b`): range
    * partition by z (contiguous z-span per file = small (a,b) bounding box),
    * sort within each, drop the scratch column.
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, files: Int,
                    path: String): Unit =
    withZ(df, a, b)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.parquet(path)

  /** Graded roundtrip: events re-laid-out on the (user_id, time) Z-curve,
    * read back through a two-dimensional predicate. The hash proves the
    * layout is a pure permutation (no row lost/duplicated/mutated by the
    * normalize-interleave-range-partition chain); the pruning benefit is
    * pinned by LayoutSpec on the file stats.
    */
  private val zorderScan: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.Scratch.dir("graft-zorder").resolve("events_z").toString
    writeZOrdered(ev, col("user_id"), unix_micros(col("ts")), 8, out)
    s.read.parquet(out)
      .filter(col("user_id") % 50 === 7 &&
        col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** Hive-style partition pruning, graded: events land partitioned by day
    * (`partitionBy` directory layout — the coarsest and cheapest pruning
    * tool at 100 TB: a date-ranged query lists only matching directories,
    * the other 360 days of a year-long table are never even stat'd, which
    * no row-group min/max can do for you). Read back through a day-range
    * predicate; Catalyst turns it into PartitionFilters (asserted in
    * PlanShapeSpec — the filter prunes at LISTING time, before any file
    * opens). The hash proves the layout+restore is lossless including the
    * partition column's value reconstruction from directory names.
    */
  private val partitionPruneScan: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        to_date(col("ts")).as("day"))
    val out = graft.Scratch.dir("graft-partprune").resolve("events_by_day").toString
    ev.write.partitionBy("day").parquet(out)
    s.read.parquet(out)
      .filter(col("day") >= lit("2024-01-05").cast("date") &&
        col("day") <= lit("2024-01-09").cast("date"))
      .select("event_id", "ts", "user_id", "value", "day")
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** Bucketed CO-LOCATED join, graded: both sides are written as bucketed
    * datasource tables (8 buckets on the join key, one file per bucket,
    * sorted), so the sort-merge join consumes the layout's partitioning —
    * ZERO exchanges below the join (asserted in PlanShapeSpec; a LOCAL
    * per-bucket sort remains because modern Spark no longer trusts written
    * sort order at scan time, SPARK-28346 — shuffle-free and cheap).
    * This is the shuffle-free repeated-join story at 100 TB:
    * pay the bucketed write once, then every key-join against the table
    * skips its shuffle forever — what `repartition` can't give you across
    * jobs, because only the catalog's bucket metadata survives the session.
    * The merge hint pins SMJ so the demonstration isn't silently replaced
    * by a broadcast (which would also be exchange-free, but trivially).
    */
  private val bucketedJoin: Q = (s, dir) => {
    val scratch = graft.Scratch.dir("graft-bucketed")
    val ev = Tables(s, dir, "events").select("event_id", "user_id", "value")
      .repartition(8, col("user_id")) // one file per bucket (same hash as bucketBy)
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      .repartition(8, col("user_id"))
    ev.write.mode("overwrite").option("path", scratch.resolve("ev").toString)
      .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("graft_bkt_events")
    cust.write.mode("overwrite").option("path", scratch.resolve("cust").toString)
      .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("graft_bkt_customer")
    s.table("graft_bkt_events")
      .join(s.table("graft_bkt_customer").hint("merge"), Seq("user_id"))
      .select("event_id", "user_id", "value", "c_mktsegment")
      .orderBy(col("event_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "zorder_scan" -> zorderScan,
    "partition_prune_scan" -> partitionPruneScan,
    "bucketed_join" -> bucketedJoin
  )

  val oracle: Map[String, String] = Map(
    "zorder_scan" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events
        |WHERE user_id % 50 = 7 AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "partition_prune_scan" ->
      """SELECT event_id, ts, user_id, value, CAST(ts AS DATE) AS day
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-09'
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "bucketed_join" ->
      """SELECT event_id, user_id, value, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin
  )
}
