package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Model-based randomized drive of the versioned sink: random batches of
  * upserts and tombstones (with in-batch key collisions, where DELETE WINS
  * by contract), random replayed batch ids (which must no-op), and random
  * half-open zonemap range scans — each step compared against a plain
  * in-memory Map applying the declared semantics. This compresses the
  * example-based PersistentSinkSpec/ZonemapSpec contracts into seeded
  * random evidence: any divergence between the bucket rewrite machinery
  * (staging, combiner, tombstone anti-join, zonemap carry/recompute,
  * pointer swap) and the abstract table semantics fails with a
  * reproducible seed.
  *
  * Raw ScalaCheck generators under fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache) — the MergeSpec convention.
  */
class SinkModelSpec extends SparkTestBase {

  private case class Op(rows: Seq[(Long, Long, Long, Boolean)], replay: Boolean)

  // batch: ≤8 rows over a tiny key space (forced cross-batch collisions),
  // ~1/4 deletes. Upsert keys are unique per batch (duplicate same-key
  // upserts in ONE batch are outside the combiner contract — real pipelines
  // dedup first), but a delete MAY collide with a same-batch upsert: that
  // is the contract-covered delete-wins case.
  private val opGen: Gen[Op] = for {
    n <- Gen.choose(0, 8)
    gs <- Gen.listOfN(n, Gen.choose(0L, 3L))
    ks <- Gen.listOfN(n, Gen.choose(0L, 5L))
    xs <- Gen.listOfN(n, Gen.choose(0L, 100L))
    ds <- Gen.listOfN(n, Gen.frequency(3 -> false, 1 -> true))
    replay <- Gen.frequency(4 -> false, 1 -> true)
  } yield {
    val raw = gs.lazyZip(ks).lazyZip(xs).lazyZip(ds).toList.map {
      case (g, k, x, d) => (g, k, x, d)
    }
    val (dels, ups) = raw.partition(_._4)
    Op(ups.distinctBy(r => (r._1, r._2)) ++ dels.distinctBy(r => (r._1, r._2)), replay)
  }

  private def sample(seed: Long): Op =
    opGen.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Op(Nil, replay = false))

  private def frame(rows: Seq[(Long, Long, Long, Boolean)]): DataFrame = {
    val session = spark
    import session.implicits._
    rows.toDF("g", "k", "x", ParquetTableSink.DeleteCol)
  }

  private def canon(df: DataFrame): Set[(Long, Long, Long)] = {
    val session = spark
    import session.implicits._
    df.select("g", "k", "x").as[(Long, Long, Long)].collect().toSet
  }

  test("random upsert/delete/replay drives match the Map model; range scans match the filter") {
    (0 until 3).foreach { drive =>
      val dir = Files.createTempDirectory(s"graft-sink-model-$drive").toString
      val sink = new ParquetTableSink(spark, dir,
        frame(Nil).drop(ParquetTableSink.DeleteCol), keys = Seq("g", "k"),
        buckets = 4, route = col("g").cast("int"), zonemapCols = Seq("x"))
      val model = scala.collection.mutable.Map.empty[(Long, Long), Long]
      var batchId = -1L
      (0 until 6).foreach { step =>
        val op = sample(drive * 1000L + step)
        if (op.replay && batchId >= 0) {
          // a replayed (already-committed) batch id must be a no-op even
          // with DIFFERENT content — the exactly-once guard, not idempotence
          sink.merge(frame(op.rows), batchId)
        } else {
          batchId += 1
          sink.merge(frame(op.rows), batchId)
          // model semantics: upserts apply in order (last writer wins),
          // then this batch's tombstones (delete wins over same-batch upsert)
          op.rows.foreach { case (g, k, x, d) => if (!d) model((g, k)) = x }
          op.rows.foreach { case (g, k, _, d) => if (d) model.remove((g, k)) }
        }
        assert(canon(sink.current) ==
          model.map { case ((g, k), x) => (g, k, x) }.toSet,
          s"drive $drive step $step: table diverged from model (op=$op)")
        val lo = (drive * 7 + step * 13) % 90
        val hi = lo + 1 + (step * 17) % (101 - lo)
        assert(canon(sink.scanRange("x", lo, hi)) ==
          model.collect { case ((g, k), x) if x >= lo && x < hi => (g, k, x) }.toSet,
          s"drive $drive step $step: scanRange($lo,$hi) diverged (op=$op)")
      }
    }
  }
}
