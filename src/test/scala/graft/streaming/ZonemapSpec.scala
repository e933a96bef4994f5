package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Manifest-level zonemap data skipping on the versioned sink: a range
  * route gives tight per-bucket min/max, `rangePrunedBuckets` proves the
  * skip set, `scanRange` stays value-identical to the unpruned filter,
  * carried-over buckets keep their stats across merges and reopen/clone,
  * and a hash layout (where zonemaps can prove nothing) degrades to
  * read-everything without ever dropping a row. Cross-engine values are
  * graded by sink_zonemap_scan vs DuckDB.
  */
class ZonemapSpec extends SparkTestBase {

  // 64 rows over 8 "days" (d = 0..7), x strictly increasing with d so a
  // day-routed bucket's [min, max] on x is tight and disjoint
  private def rows(ids: Range): DataFrame = {
    val session = spark
    import session.implicits._
    ids.map(i => (i.toLong % 8, i.toLong, i.toLong % 8 * 100 + i))
      .toDF("d", "id", "x")
  }

  private def daySink(dir: String) = new ParquetTableSink(spark, dir,
    rows(0 until 0), keys = Seq("d", "id"), buckets = 8,
    route = col("d").cast("int"), zonemapCols = Seq("x"))

  private def sortedRows(df: DataFrame) =
    df.orderBy("id").collect().toSeq

  test("range layout: narrow window prunes buckets, values match the unpruned filter") {
    val dir = Files.createTempDirectory("graft-zm-prune").toString
    val sink = daySink(dir)
    sink.merge(rows(0 until 64), 0L)
    // x in [200, 400) lives in days 2 and 3 only
    val kept = sink.rangePrunedBuckets("x", 200L, 400L)
    assert(kept == Seq(2, 3), s"expected buckets {2,3}, got $kept")
    val scanned = sink.scanRange("x", 200L, 400L)
    assert(sortedRows(scanned) ==
      sortedRows(sink.current.filter(col("x") >= 200 && col("x") < 400)))
    // the scan must actually read fewer files than the full table
    assert(scanned.inputFiles.length < sink.current.inputFiles.length)
  }

  test("carried-over buckets keep their zonemap across merges, reopen, and clone") {
    val dir = Files.createTempDirectory("graft-zm-carry").toString
    val sink = daySink(dir)
    sink.merge(rows(0 until 64), 0L)
    sink.merge(rows(64 until 72).filter(col("d") < 2), 1L) // rewrites only b0, b1
    assert(sink.rangePrunedBuckets("x", 200L, 400L) == Seq(2, 3),
      "untouched buckets must carry their stats to the new version")
    val reopened = daySink(dir) // state from the directories alone
    assert(reopened.rangePrunedBuckets("x", 200L, 400L) == Seq(2, 3))
    val clone = sink.cloneTo(Files.createTempDirectory("graft-zm-clone").toString)
    assert(clone.rangePrunedBuckets("x", 200L, 400L) == Seq(2, 3))
    assert(sortedRows(clone.scanRange("x", 200L, 400L)) ==
      sortedRows(sink.scanRange("x", 200L, 400L)))
  }

  test("hash layout: zonemap proves nothing, scan degrades to correct full read") {
    val dir = Files.createTempDirectory("graft-zm-hash").toString
    val sink = new ParquetTableSink(spark, dir, rows(0 until 0),
      keys = Seq("d", "id"), buckets = 8, zonemapCols = Seq("x"))
    sink.merge(rows(0 until 64), 0L)
    assert(sink.rangePrunedBuckets("x", 200L, 400L).size == 8,
      "hash placement scatters every span across all buckets")
    assert(sortedRows(sink.scanRange("x", 200L, 400L)) ==
      sortedRows(sink.current.filter(col("x") >= 200 && col("x") < 400)))
  }

  // bucket ids of every parquet relation surviving optimization — the level
  // ZonemapRouteRule rewrites at (data dirs are named b{X}-v{N})
  private def plannedBuckets(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths
          .map(p => p.getName.stripPrefix("b").takeWhile(_ != '-').toInt)
    }.flatten.sorted

  test("plain .filter over table() routes through the zonemap automatically") {
    val dir = Files.createTempDirectory("graft-zm-auto").toString
    val sink = daySink(dir)
    sink.merge(rows(0 until 64), 0L)
    val auto = sink.table().filter(col("x") >= 200L && col("x") < 400L)
    assert(plannedBuckets(auto) == Seq(2, 3),
      "the optimizer must derive the keep set from the plain predicate")
    assert(sortedRows(auto) ==
      sortedRows(sink.current.filter(col("x") >= 200L && col("x") < 400L)),
      "pruned filter must stay value-identical to the unpruned one")
    // one-sided + equality shapes prune too
    assert(plannedBuckets(sink.table().filter(col("x") >= 600L)) == Seq(6, 7))
    assert(plannedBuckets(sink.table().filter(col("x") === 315L)) == Seq(3))
    // a provably-empty window collapses to an empty LocalRelation
    val none = sink.table().filter(col("x") >= 5000L)
    assert(none.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(none.count() == 0)
  }

  test("IN-lists, null-safe equality, and string prefixes prune through the zonemap") {
    val dir = Files.createTempDirectory("graft-zm-in").toString
    val sink = daySink(dir)
    sink.merge(rows(0 until 64), 0L)
    // small IN list (stays a logical In): candidate values land in days 1 and 6
    val small = sink.table().filter(col("x").isin(105L, 610L))
    assert(plannedBuckets(small) == Seq(1, 6),
      "an IN-list must keep exactly the buckets whose zones admit a value")
    assert(sortedRows(small) ==
      sortedRows(sink.current.filter(col("x").isin(105L, 610L))))
    // a large IN list is InSet by this optimizer batch (OptimizeIn): all
    // twelve candidates live in day 2's zone
    val big: Seq[Any] = (200 until 212).map(_.toLong)
    val inset = sink.table().filter(col("x").isin(big: _*))
    assert(plannedBuckets(inset) == Seq(2))
    assert(sortedRows(inset) ==
      sortedRows(sink.current.filter(col("x").isin(big: _*))))
    // null-safe equality with a non-null literal prunes like equality
    assert(plannedBuckets(sink.table().filter(col("x") <=> 315L)) == Seq(3))
    // <=> NULL matches null rows, which zones do not track: full read
    assert(plannedBuckets(
      sink.table().filter(col("x") <=> lit(null).cast("long"))).size == 8)

    // string zones: s carries the day in its prefix, so each bucket's
    // [min, max] shares a 3-char prefix and LIKE 'k03%' proves bucket 3
    val sdir = Files.createTempDirectory("graft-zm-str").toString
    val session = spark
    import session.implicits._
    def srows(ids: Range): DataFrame =
      ids.map(i => (i.toLong % 8, i.toLong, f"k${i % 8}%02d-${i}%03d"))
        .toDF("d", "id", "s")
    val ssink = new ParquetTableSink(spark, sdir, srows(0 until 0),
      keys = Seq("d", "id"), buckets = 8,
      route = col("d").cast("int"), zonemapCols = Seq("s"))
    ssink.merge(srows(0 until 64), 0L)
    val pfx = ssink.table().filter(col("s").startsWith("k03"))
    assert(plannedBuckets(pfx) == Seq(3))
    assert(sortedRows(pfx) ==
      sortedRows(ssink.current.filter(col("s").startsWith("k03"))))
    // a prefix every bucket shares proves nothing; an impossible one
    // collapses to the empty relation
    assert(plannedBuckets(ssink.table().filter(col("s").startsWith("k"))).size == 8)
    val nothing = ssink.table().filter(col("s").startsWith("z"))
    assert(nothing.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(nothing.count() == 0)
  }

  // bucket ids planned for the relation whose paths live under `dir` —
  // the per-side view of plannedBuckets for join plans with two sinks
  private def plannedBucketsIn(df: DataFrame, dir: String): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.filter(_.toString.contains(dir))
          .map(p => p.getName.stripPrefix("b").takeWhile(_ != '-').toInt)
    }.flatten.sorted

  // dim side for the join-routing tests: one row per fact x, grouped two
  // days per grp, routed by grp with x+grp zonemapped — so a grp filter
  // prunes dim buckets and the survivors' x zones bound the fact scan
  private def dimRows: DataFrame = {
    val session = spark
    import session.implicits._
    (0 until 64).map(i => (i.toLong % 8 * 100 + i, i.toLong % 8 / 2))
      .toDF("x", "grp")
  }
  private def grpDim(dir: String): ParquetTableSink =
    new ParquetTableSink(spark, dir, dimRows.limit(0), keys = Seq("x"),
      buckets = 4, route = col("grp").cast("int"), zonemapCols = Seq("x", "grp"))

  test("a dim-filtered equi-join prunes the fact side through the dim's key zones") {
    val fdir = Files.createTempDirectory("graft-zmj-fact").toString
    val ddir = Files.createTempDirectory("graft-zmj-dim").toString
    val fact = daySink(fdir); fact.merge(rows(0 until 64), 0L)
    val dim = grpDim(ddir); dim.merge(dimRows, 0L)

    // grp 1 = days {2,3} → dim bucket 1 survives, its x zone is [202, 359]
    // → fact keeps exactly buckets 2 and 3 (their x zones overlap the bound)
    val joined = fact.table().join(dim.table().filter(col("grp") === 1), Seq("x"))
    assert(plannedBucketsIn(joined, fdir) == Seq(2, 3),
      "the dim filter must bound the fact scan to a strict bucket subset")
    assert(plannedBucketsIn(joined, ddir) == Seq(1),
      "the dim's own filter prunes its buckets too")
    assert(sortedRows(joined.select("x", "d", "id", "grp")) ==
      sortedRows(fact.current.join(dimRows.filter(col("grp") === 1), Seq("x"))
        .select("x", "d", "id", "grp")),
      "join-routed scan must stay value-identical to the unpruned join")

    // orientation-independent: fact on the RIGHT prunes the same way
    val flipped = dim.table().filter(col("grp") === 1).join(fact.table(), Seq("x"))
    assert(plannedBucketsIn(flipped, fdir) == Seq(2, 3))

    // left-semi joins prune too (existence probe against a filtered dim)
    val semi = fact.table().join(
      dim.table().filter(col("grp") === 1), Seq("x"), "left_semi")
    assert(plannedBucketsIn(semi, fdir) == Seq(2, 3))
    assert(sortedRows(semi) == sortedRows(
      fact.current.join(dimRows.filter(col("grp") === 1), Seq("x"), "left_semi")))

    // an OUTER join must NOT prune the preserved side: every fact row
    // survives unmatched, so all 8 buckets are read
    val outer = fact.table().join(
      dim.table().filter(col("grp") === 1), Seq("x"), "left_outer")
    assert(plannedBucketsIn(outer, fdir).size == 8,
      "left-outer keeps unmatched fact rows — pruning them would drop output")
    // ...but its NON-preserved side prunes: dim rows whose key can't match
    // any fact row only pad NULLs a missing row pads identically. Fact
    // filtered to x ∈ [200, 400) keeps fact buckets {2,3} (x zones
    // [202,258]/[303,359]) → only dim bucket 1 (grp 1 = days {2,3}) can
    // match.
    val outerDim = fact.table().filter(col("x") >= 200L && col("x") < 400L)
      .join(dim.table(), Seq("x"), "left_outer")
    assert(plannedBucketsIn(outerDim, ddir) == Seq(1),
      "left-outer's inner side must prune through the preserved side's zones")
    assert(sortedRows(outerDim.select("x", "d", "id", "grp")) ==
      sortedRows(fact.current.filter(col("x") >= 200L && col("x") < 400L)
        .join(dimRows, Seq("x"), "left_outer").select("x", "d", "id", "grp")))
    // right-outer mirrors: preserved right whole, left prunes
    val routed = fact.table()
      .join(dim.table().filter(col("grp") === 1), Seq("x"), "right_outer")
    assert(plannedBucketsIn(routed, fdir) == Seq(2, 3),
      "right-outer's inner (left) side prunes through the dim zones")
    assert(sortedRows(routed.select("x", "grp", "d", "id")) ==
      sortedRows(fact.current.join(dimRows.filter(col("grp") === 1),
        Seq("x"), "right_outer").select("x", "grp", "d", "id")))
    // anti join: the right side only matters where it CAN match — it
    // prunes; the left is all-preserved-or-dropped and stays whole. An
    // over-pruned right side would CREATE output rows here (every fact x
    // has a dim partner, so the true anti result is empty).
    val anti = fact.table().filter(col("x") >= 200L && col("x") < 400L)
      .join(dim.table(), Seq("x"), "left_anti")
    assert(plannedBucketsIn(anti, ddir) == Seq(1),
      "left-anti's right side prunes through the left's key zones")
    assert(sortedRows(anti) == sortedRows(
      fact.current.filter(col("x") >= 200L && col("x") < 400L)
        .join(dimRows, Seq("x"), "left_anti")))

    // disjoint dim survivors prune as an interval LIST, not their convex
    // union: grp IN (0, 3) keeps fact days {0,1} and {6,7} — the smeared
    // union bound would have kept every bucket in the gap too
    val inlist = fact.table().join(dim.table().filter(col("grp").isin(0, 3)), Seq("x"))
    assert(plannedBucketsIn(inlist, fdir) == Seq(0, 1, 6, 7),
      "per-dim-bucket intervals must not smear across the gap")
    assert(sortedRows(inlist.select("x", "d", "id", "grp")) ==
      sortedRows(fact.current.join(dimRows.filter(col("grp").isin(0, 3)), Seq("x"))
        .select("x", "d", "id", "grp")))

    // a provably-empty dim side collapses the whole join
    val none = fact.table().join(dim.table().filter(col("grp") === 99), Seq("x"))
    assert(none.count() == 0)
  }

  test("composite keys prune as one interval vector per bucket, not per-column") {
    val session = spark
    import session.implicits._
    // fact bucket 1 holds the MISMATCHED combination (x low, y high): dim
    // bucket 0 covers its x range and dim bucket 1 its y range, but no
    // SINGLE dim bucket covers both — per-column independent pruning
    // would keep it (each column overlaps somewhere), the interval-vector
    // test drops it
    val factRows =
      ((0 until 10).map(i => (i.toLong, 1000L + i, 0)) ++   // b0: matches dim b0
        (0 until 10).map(i => (i.toLong, 1200L + i, 1)) ++  // b1: mismatched combo
        (0 until 10).map(i => (500L + i, 1500L + i, 2)))    // b2: disjoint outright
        .toDF("x", "y", "grp")
    val dimRows2 =
      ((0 until 10).map(i => (i.toLong, 1000L + i, 0)) ++
        (0 until 10).map(i => (200L + i, 1200L + i, 1)))
        .toDF("x", "y", "grp")
    val fdir = Files.createTempDirectory("graft-zmj-vec-f").toString
    val ddir = Files.createTempDirectory("graft-zmj-vec-d").toString
    val fact = new ParquetTableSink(spark, fdir, factRows.limit(0),
      keys = Seq("x", "y"), buckets = 3, route = col("grp").cast("int"),
      zonemapCols = Seq("x", "y"))
    fact.merge(factRows, 0L)
    val dim = new ParquetTableSink(spark, ddir, dimRows2.limit(0),
      keys = Seq("x", "y"), buckets = 2, route = col("grp").cast("int"),
      zonemapCols = Seq("x", "y"))
    dim.merge(dimRows2, 0L)

    val joined = fact.table().drop("grp")
      .join(dim.table().drop("grp"), Seq("x", "y"))
    assert(plannedBucketsIn(joined, fdir) == Seq(0),
      "the mismatched-combination fact bucket must prune under the vector test")
    // symmetric: dim bucket 1's (x,y) pair overlaps no single fact bucket
    assert(plannedBucketsIn(joined, ddir) == Seq(0))
    assert(sortedRows(joined.withColumn("id", col("x"))) ==
      sortedRows(factRows.drop("grp").join(dimRows2.drop("grp"), Seq("x", "y"))
        .withColumn("id", col("x"))),
      "vector pruning must stay value-identical to the unpruned join")
  }

  test("join routing resolves keys and filters through pure-rename projections") {
    val fdir = Files.createTempDirectory("graft-zmj-alias-f").toString
    val ddir = Files.createTempDirectory("graft-zmj-alias-d").toString
    val fact = daySink(fdir); fact.merge(rows(0 until 64), 0L)
    val dim = grpDim(ddir); dim.merge(dimRows, 0L)

    // both join keys are ALIASES of the stored column: the rename map must
    // resolve fx -> x on each side or no zone is provable at all
    val aliased = fact.table().select(col("x").as("fx"), col("d"), col("id"))
      .join(dim.table().filter(col("grp") === 1)
        .select(col("x").as("fx"), col("grp")), Seq("fx"))
    assert(plannedBucketsIn(aliased, fdir) == Seq(2, 3),
      "an aliased join key must still route through the stored column's zones")
    assert(plannedBucketsIn(aliased, ddir) == Seq(1))
    assert(sortedRows(aliased.select(col("fx"), col("d"), col("id"), col("grp"))
        .withColumnRenamed("fx", "x")) ==
      sortedRows(fact.current.join(dimRows.filter(col("grp") === 1), Seq("x"))
        .select("x", "d", "id", "grp")),
      "alias-routed join must stay value-identical to the unpruned join")

    // a filter stated ABOVE a renaming projection narrows the survivor set
    // through the same map (g -> grp)
    val filteredAbove = fact.table().join(
      dim.table().select(col("x"), col("grp").as("g")).filter(col("g") === 1),
      Seq("x"))
    assert(plannedBucketsIn(filteredAbove, fdir) == Seq(2, 3),
      "a predicate over a renamed column must still bound the fact scan")

    // a COMPUTED alias that shadows the stored name must NOT resolve:
    // grp+1 = 2 means real grp = 1, and testing it against grp's zones
    // would keep the wrong dim bucket and prune fact buckets that match.
    // Conservative outcome: no fact pruning, values exact.
    val shadowed = fact.table().join(
      dim.table().select(col("x"), (col("grp") + 1).as("grp"))
        .filter(col("grp") === 2),
      Seq("x"))
    assert(plannedBucketsIn(shadowed, fdir).size == 8,
      "a computed alias shadowing a stored column must prove nothing")
    assert(sortedRows(shadowed.select("x", "d", "id", "grp")) ==
      sortedRows(fact.current.join(
        dimRows.select(col("x"), (col("grp") + 1).as("grp"))
          .filter(col("grp") === 2), Seq("x"))
        .select("x", "d", "id", "grp")))
  }

  test("join routing stays conservative when the dim key zone is unprovable") {
    val fdir = Files.createTempDirectory("graft-zmj-cons-f").toString
    val fact = daySink(fdir); fact.merge(rows(0 until 64), 0L)
    // dim WITHOUT an x zonemap: grp prunes dim buckets, but no key bound
    // is derivable — the fact side must degrade to a full (correct) read
    val ddir = Files.createTempDirectory("graft-zmj-cons-d").toString
    val dim = new ParquetTableSink(spark, ddir, dimRows.limit(0), keys = Seq("x"),
      buckets = 4, route = col("grp").cast("int"), zonemapCols = Seq("grp"))
    dim.merge(dimRows, 0L)
    val joined = fact.table().join(dim.table().filter(col("grp") === 1), Seq("x"))
    assert(plannedBucketsIn(joined, fdir).size == 8,
      "no provable dim key zone → no fact pruning")
    assert(sortedRows(joined.select("x", "d", "id", "grp")) ==
      sortedRows(fact.current.join(dimRows.filter(col("grp") === 1), Seq("x"))
        .select("x", "d", "id", "grp")))
    // a plain (unregistered) parquet dim is not ours: fact untouched
    val pdir = Files.createTempDirectory("graft-zmj-plain").toString
    dimRows.filter(col("grp") === 1).write.parquet(s"$pdir/dim.parquet")
    val foreign = fact.table()
      .join(spark.read.parquet(s"$pdir/dim.parquet"), Seq("x"))
    assert(plannedBucketsIn(foreign, fdir).size == 8)
    assert(foreign.count() ==
      fact.current.join(dimRows.filter(col("grp") === 1), Seq("x")).count())
  }

  test("automatic routing degrades to a full read on unprovable predicates") {
    val dir = Files.createTempDirectory("graft-zm-auto-deg").toString
    val sink = daySink(dir)
    sink.merge(rows(0 until 64), 0L)
    // a non-zonemap column proves nothing: all 8 buckets read, rows correct
    val byId = sink.table().filter(col("id") >= 60L)
    assert(plannedBuckets(byId).size == 8)
    assert(sortedRows(byId) == sortedRows(sink.current.filter(col("id") >= 60L)))
    // a disjunction is not a conjunct the rule recognizes: no pruning,
    // but also no wrong answers
    val disj = sink.table().filter(col("x") < 100L || col("x") >= 700L)
    assert(plannedBuckets(disj).size == 8)
    assert(sortedRows(disj) ==
      sortedRows(sink.current.filter(col("x") < 100L || col("x") >= 700L)))
  }

  test("a crashed attempt's stale zones sidecar cannot poison the replay") {
    val dir = Files.createTempDirectory("graft-zm-crash").toString
    val sink = daySink(dir)
    sink.merge(rows(0 until 32), 0L) // commits v0
    // forge the NEXT version's sidecar, as a crashed evolving attempt would
    // leave it: absurd stats that would prune every bucket if trusted
    Files.writeString(Paths.get(dir, "manifest", "v1.zones"),
      (0 until 8).map(b => s"$b\tx\t99999\t99999").mkString("\n"))
    sink.merge(rows(32 until 64), 1L) // commits the real v1
    assert(sortedRows(sink.scanRange("x", 0L, 1000L)) == sortedRows(sink.current),
      "replay must rewrite the sidecar from real data, not trust the orphan")
  }

  test("a deleted-and-reborn table dir re-registers: reborn zones govern, no stale prune fires") {
    // The declared residual (PLANS.md adversarial sweep): version numbering
    // restarts when a table dir is deleted and re-created from scratch, so
    // the reborn incarnation's bucket dirs REUSE absolute paths an earlier
    // incarnation already registered — with entirely different contents.
    // The argument is that `table()` re-registers every path at read
    // resolution before exposing a scan, so the stale entries can never
    // govern a reborn plan. This drives that argument end-to-end.
    val dir = Files.createTempDirectory("graft-zm-reborn").toString
    val sink1 = daySink(dir)
    sink1.merge(rows(0 until 64), 0L)
    // plan through the registry so incarnation 1's zones are registered
    assert(plannedBuckets(sink1.table().filter(col("x") >= 200L && col("x") < 400L)) == Seq(2, 3))

    // kill the table wholesale (no unregister API exists — deliberately)
    Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { Files.delete(p); () })

    // reborn from scratch at the SAME path: version numbering restarts, so
    // bucket dirs collide with registered paths; x shifts by +10000 so
    // every stale zone wildly disagrees (stale max ≈ 807 would prune ALL
    // reborn buckets for any reborn-range predicate)
    val sink2 = daySink(dir)
    sink2.merge(rows(0 until 64).withColumn("x", col("x") + 10000L), 0L)
    spark.catalog.refreshByPath(dir) // Spark's own file-status cache is not under test

    val all = sink2.table().filter(col("x") >= 10000L)
    assert(all.count() == 64,
      "a stale zone entry (max ~807) governing the reborn path would prune every row here")
    val window = sink2.table().filter(col("x") >= 10200L && col("x") < 10400L)
    assert(plannedBuckets(window) == Seq(2, 3),
      "the reborn registration must prune by the REBORN zones")
    assert(sortedRows(window) ==
      sortedRows(sink2.current.filter(col("x") >= 10200L && col("x") < 10400L)))
    // incarnation 1's window is provably empty under the reborn zones
    assert(sink2.rangePrunedBuckets("x", 200L, 400L).isEmpty)
    assert(sink2.table().filter(col("x") >= 200L && col("x") < 400L).count() == 0)
  }

  test("tables without zonemapCols read empty zones and never prune") {
    val dir = Files.createTempDirectory("graft-zm-off").toString
    val sink = new ParquetTableSink(spark, dir, rows(0 until 0),
      keys = Seq("d", "id"), buckets = 4)
    sink.merge(rows(0 until 32), 0L)
    val manifestFiles = {
      val s = Files.list(Paths.get(dir, "manifest"))
      try s.iterator().asScala.map(_.getFileName.toString).toList finally s.close()
    }
    assert(!manifestFiles.exists(_.endsWith(".zones")))
    assert(sink.rangePrunedBuckets("x", 0L, 10L).size == 4)
  }
}
