package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Lifecycle of the persisted ANN index on a planted corpus: incremental
  * encode converges to the bulk build, replayed batches no-op, a reopened
  * index serves search from its directories alone (train-once), the codes
  * table grows only by the encoded batch, and the streaming drive admits
  * vectors through the same exactly-once path. Cross-engine value equality
  * is graded by sim_index_search / ann_admit_incremental vs DuckDB.
  */
class VectorIndexSpec extends SparkTestBase {

  private val N = 400
  private val SPLIT = 200L

  // deterministic synthetic vectors; ids ≡ 7 mod 50 exist (the Lloyd/PQ
  // seed picks), and ids 0,100,200,300 form the probe set
  private def corpus(ids: Seq[Int]): DataFrame = {
    val session = spark
    import session.implicits._
    ids.map { i =>
      (i.toLong, Array.tabulate(64)(d => (math.sin(i * 64.0 + d) * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
      .withColumn("norm",
        sqrt(graft.functions.VectorExpressions.dot(col("embedding"), col("embedding"))))
  }

  private def probes(c: DataFrame): DataFrame =
    c.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("norm").as("p_norm"))

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  private def bulkIndex(dir: String): VectorIndex = {
    val all = corpus(0 until N)
    val idx = new VectorIndex(spark, dir)
    idx.train(all.filter(col("vec_id") % 2 === 1))
    idx.encode(all, 0L)
    idx
  }

  test("incremental encode (with a replayed batch) converges to the bulk build") {
    val all = corpus(0 until N)
    val bulk = bulkIndex(Files.createTempDirectory("graft-vidx-bulk").toString)
    val inc = new VectorIndex(spark, Files.createTempDirectory("graft-vidx-inc").toString)
    inc.train(all.filter(col("vec_id") % 2 === 1))
    inc.encode(all.filter(col("vec_id") < SPLIT), 0L)
    inc.encode(all.filter(col("vec_id") >= SPLIT), 1L)
    inc.encode(all.filter(col("vec_id") >= SPLIT), 1L) // replay must no-op
    assert(inc.lastEncodedBatchId == 1L)
    val expected = rows(bulk.search(probes(all), 3))
    assert(expected.nonEmpty, "bulk search returns neighbors")
    assert(rows(inc.search(probes(all), 3)) == expected)
  }

  test("a reopened index searches from its directories alone (train-once)") {
    val dir = Files.createTempDirectory("graft-vidx-reopen").toString
    val expected = rows(bulkIndex(dir).search(probes(corpus(0 until N)), 3))
    val reopened = new VectorIndex(spark, dir) // no train, no encode
    assert(reopened.lastEncodedBatchId == 0L)
    assert(rows(reopened.search(probes(corpus(0 until N)), 3)) == expected)
  }

  test("encode touches only the passed batch; codes rows upsert by vec_id") {
    val all = corpus(0 until N)
    val idx = new VectorIndex(spark, Files.createTempDirectory("graft-vidx-grow").toString)
    idx.train(all.filter(col("vec_id") % 2 === 1))
    idx.encode(all.filter(col("vec_id") < SPLIT), 0L)
    assert(idx.search(probes(all), 3).select("neighbor_id").distinct()
      .filter(col("neighbor_id") >= SPLIT).count() == 0,
      "only batch-0 vectors are searchable before batch 1")
    idx.encode(all.filter(col("vec_id") >= SPLIT), 1L)
    // re-encoding an already-indexed vector under a NEW batch id must
    // upsert (idempotent content), not duplicate
    idx.encode(all.filter(col("vec_id") === 42L), 2L)
    val neighbors = idx.search(probes(all), 3)
    assert(neighbors.groupBy("probe_id").count().select(max("count")).head.getLong(0) <= 3)
  }

  test("retrain (drift) + full re-encode equals a fresh build; no stale cells linger") {
    val all = corpus(0 until N)
    val idx = new VectorIndex(spark, Files.createTempDirectory("graft-vidx-drift").toString)
    idx.train(all.filter(col("vec_id") < 200)) // first generation: seeds {7..157}
    idx.encode(all, 0L)
    idx.train(all.filter(col("vec_id") % 2 === 1), 1L) // drift: retrain on the odd half
    idx.encode(all, 2L)                               // codes only mean anything re-encoded
    val fresh = bulkIndex(Files.createTempDirectory("graft-vidx-fresh").toString)
    assert(rows(idx.search(probes(all), 3)) == rows(fresh.search(probes(all), 3)),
      "retrained index must equal a fresh build on the new training slice")
  }

  test("epoch migration: bucket-at-a-time, exactly-once; fully migrated + retired = fresh build") {
    val all = corpus(0 until N)
    val idx = new VectorIndex(spark, Files.createTempDirectory("graft-vidx-epoch").toString)
    idx.train(all.filter(col("vec_id") < 200))         // epoch 0
    idx.encode(all, 0L)
    assert(idx.currentEpoch == 0L)
    idx.train(all.filter(col("vec_id") % 2 === 1), 1L) // epoch 1 — NO re-encode
    assert(idx.currentEpoch == 1L)
    // the old epoch cannot retire while any bucket still holds its codes
    val blocked = intercept[IllegalArgumentException](idx.retireEpoch(0L, 2L))
    assert(blocked.getMessage.contains("still has encoded vectors"))
    // half-migrated index still serves a full top-k for every probe
    (0 until VectorIndex.CODES_BUCKETS / 2).foreach(b => idx.migrateBucket(all, b, 1L + b))
    idx.migrateBucket(all, 0, 1L) // replay: guarded no-op
    val half = idx.search(probes(all), 3)
    assert(half.groupBy("probe_id").count().select(min("count")).head.getLong(0) == 3,
      "a half-migrated index serves k neighbors per probe")
    // finish the migration; retirement then succeeds and equals a fresh build
    (VectorIndex.CODES_BUCKETS / 2 until VectorIndex.CODES_BUCKETS)
      .foreach(b => idx.migrateBucket(all, b, 1L + b))
    idx.retireEpoch(0L, 2L)
    val fresh = bulkIndex(Files.createTempDirectory("graft-vidx-efresh").toString)
    assert(rows(idx.search(probes(all), 3)) == rows(fresh.search(probes(all), 3)),
      "fully-migrated + retired must equal a fresh build on the new training slice")
  }

  test("migrateBucket retires rows whose vec_id left the corpus (so the epoch can retire)") {
    val all = corpus(0 until N)
    val idx = new VectorIndex(spark, Files.createTempDirectory("graft-vidx-gone").toString)
    idx.train(all.filter(col("vec_id") < 200))
    idx.encode(all, 0L)
    idx.train(all.filter(col("vec_id") % 2 === 1), 1L)
    // vec_id 16k lands in bucket 0; drop ids 16 and 32 from the source
    val shrunk = all.filter(!col("vec_id").isin(16L, 32L))
    (0 until VectorIndex.CODES_BUCKETS).foreach(b => idx.migrateBucket(shrunk, b, 1L + b))
    idx.retireEpoch(0L, 2L) // no straggler rows block retirement
    val after = idx.search(probes(all), 3)
    assert(after.filter(col("neighbor_id").isin(16L, 32L)).count() == 0,
      "rows absent from the migration corpus are retired, not stranded at the dead epoch")
  }

  test("vacuum physically drops retired vectors' bytes; search unchanged") {
    val all = corpus(0 until N)
    val dir = Files.createTempDirectory("graft-vidx-vac").toString
    val idx = bulkIndex(dir)
    val before = rows(idx.search(probes(all), 3))
    val victims = before.map(_.getLong(2)).distinct.take(3)
    val session = spark
    import session.implicits._
    idx.remove(victims.toDF("vec_id"), 1L)
    idx.vacuum(1)
    // every parquet byte under the codes table — including history — must
    // be free of the retired ids (right-to-be-forgotten is a BYTE deletion)
    val allFiles = spark.read.schema(
        "vec_id LONG, norm DOUBLE, epoch LONG, cell LONG, codes ARRAY<LONG>")
      .parquet(s"$dir/codes/data/*")
    assert(allFiles.filter(col("vec_id").isin(victims: _*)).count() == 0,
      "post-vacuum files must not contain retired vec_ids")
    val after = idx.search(probes(all), 3)
    assert(after.filter(col("neighbor_id").isin(victims: _*)).count() == 0)
    assert(rows(after).nonEmpty, "other vectors still serve")
  }

  test("probe sets beyond the wave cap split into waves with identical results") {
    val all = corpus(0 until N)
    val idx = bulkIndex(Files.createTempDirectory("graft-vidx-wave").toString)
    val p = probes(all) // 4 probes: 0, 100, 200, 300
    val single = rows(idx.search(p, 3))
    assert(rows(idx.search(p, 3, waveCap = 1)) == single,
      "hash-wave chunked search must equal the single-wave result")
  }

  test("a crash between the two codebook merges never exposes a half-registered epoch") {
    val all = corpus(0 until N)
    val dir = Files.createTempDirectory("graft-vidx-kill").toString
    val idx = new VectorIndex(spark, dir)
    idx.train(all.filter(col("vec_id") < 200))         // epoch 0, complete
    idx.encode(all, 0L)
    val before = rows(idx.search(probes(all), 3))

    // retrain dies between the cents commit and the pcents commit — the
    // half-registered epoch 1 (coarse codebooks, no PQ) is on disk
    idx.killBeforePcentsMerge = true
    intercept[RuntimeException](idx.train(all.filter(col("vec_id") % 2 === 1), 1L))
    idx.killBeforePcentsMerge = false

    // a fresh instance on the same dir (the restarted process) must still
    // report the last COMPLETE epoch and serve/encode against it
    val reopened = new VectorIndex(spark, dir)
    assert(reopened.currentEpoch == 0L,
      "currentEpoch must never expose an epoch missing its PQ codebooks")
    assert(rows(reopened.search(probes(all), 3)) == before,
      "search during the crash window serves the last complete epoch")
    reopened.encode(all.filter(col("vec_id") === 42L), 1L) // upsert, not epoch-1 garbage
    assert(rows(reopened.search(probes(all), 3)) == before)

    // the replayed train (same batchId) converges: cents no-ops under the
    // replay guard, pcents completes the pair, epoch 1 becomes visible
    reopened.train(all.filter(col("vec_id") % 2 === 1), 1L)
    assert(reopened.currentEpoch == 1L)
    reopened.encode(all, 2L)
    val fresh = bulkIndex(Files.createTempDirectory("graft-vidx-kfresh").toString)
    assert(rows(reopened.search(probes(all), 3)) == rows(fresh.search(probes(all), 3)),
      "healed retrain + re-encode equals a fresh build on the new training slice")
  }

  test("search before train fails loud, not silently empty") {
    val idx = new VectorIndex(spark, Files.createTempDirectory("graft-vidx-raw").toString)
    val e = intercept[IllegalArgumentException] {
      idx.search(probes(corpus(0 until 8)), 3)
    }
    assert(e.getMessage.contains("search before train"))
  }

  test("remove retires vectors: never candidates again, replay no-ops, re-encode restores") {
    val all = corpus(0 until N)
    val idx = bulkIndex(Files.createTempDirectory("graft-vidx-rm").toString)
    val before = rows(idx.search(probes(all), 3))
    val victims = before.map(_.getLong(2)).distinct.take(3) // some actual neighbors
    val session = spark
    import session.implicits._
    idx.remove(victims.toDF("vec_id"), 1L)
    val after = idx.search(probes(all), 3)
    assert(after.filter(col("neighbor_id").isin(victims: _*)).count() == 0,
      "retired vectors must never appear as neighbors")
    assert(rows(after).nonEmpty, "other vectors still serve")
    idx.remove(victims.toDF("vec_id"), 1L) // replay must no-op
    assert(idx.lastEncodedBatchId == 1L)
    // re-encoding the victims restores exactly the original ranking
    idx.encode(all.filter(col("vec_id").isin(victims: _*)), 2L)
    assert(rows(idx.search(probes(all), 3)) == before)
  }

  test("streaming drive: file drops index through the exactly-once path") {
    val all = corpus(0 until N)
    val src = Files.createTempDirectory("graft-vidx-src").toString
    val ckpt = Files.createTempDirectory("graft-vidx-ckpt").toString
    val dir = Files.createTempDirectory("graft-vidx-stream").toString
    all.filter(col("vec_id") < SPLIT).write.parquet(s"$src/d0")
    all.filter(col("vec_id") >= SPLIT).write.parquet(s"$src/d1")
    val idx = new VectorIndex(spark, dir)
    idx.train(all.filter(col("vec_id") % 2 === 1))
    idx.startIndexing(
      spark.readStream.schema(all.schema).parquet(s"$src/*"),
      ckpt, org.apache.spark.sql.streaming.Trigger.AvailableNow()
    ).awaitTermination()
    val bulk = bulkIndex(Files.createTempDirectory("graft-vidx-bulk2").toString)
    assert(rows(idx.search(probes(all), 3)) == rows(bulk.search(probes(all), 3)))
  }
}
