package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Admission semantics of the incremental LSH index on planted documents:
  * cross-batch rejection through the persisted index, in-batch smaller-id
  * wins, rejected docs still reject later dups (index-everything), shingle-
  * less docs pass, and replayed batches are no-ops. Cross-engine row sets
  * are graded by dedup_admit_incremental vs DuckDB.
  */
class DedupIndexSpec extends SparkTestBase {

  // near-dup pair generator: long shared prefix, tiny suffix difference
  private val base = "the quick brown fox jumps over the lazy dog again and " +
    "again while the indexer watches every arriving shard of text"

  private def docs(rows: (Long, String)*) = {
    val session = spark
    import session.implicits._
    rows.toDF("doc_id", "text")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val session = spark
    import session.implicits._
    df.select("doc_id").as[Long].collect().sorted.toSeq
  }

  test("cross-batch near-dup is rejected through the persisted index") {
    val dir = Files.createTempDirectory("graft-admit-1").toString
    val index = new LshAdmissionIndex(spark, dir, threshold = 0.5)
    val a0 = index.admit(docs(1L -> base, 2L -> "completely unrelated text about parquet bucket pruning and manifest commits in versioned tables"), 0L)
    assert(ids(a0) == Seq(1L, 2L), "first arrivals admit")
    val a1 = index.admit(docs(10L -> (base + " suffix")), 1L)
    assert(ids(a1) == Seq.empty, "near-dup of an indexed doc must be rejected")
  }

  test("signature-scheme guard: stamp written, stale scheme fails loud, legacy unstamped fails loud") {
    val dir = Files.createTempDirectory("graft-admit-scheme").toString
    val index = new LshAdmissionIndex(spark, dir, threshold = 0.5)
    index.admit(docs(1L -> base), 0L).count()
    val stamp = java.nio.file.Paths.get(dir).resolve("_scheme")
    assert(Files.exists(stamp), "first construction must stamp the scheme")
    assert(Files.readString(stamp).trim == DedupText.LSH_SCHEME)
    // a matching-scheme reopen (restart) works
    val reopened = new LshAdmissionIndex(spark, dir, threshold = 0.5)
    assert(reopened.lastCommittedBatchId == 0L)
    // an index written under a DIFFERENT scheme must refuse to open:
    // its stored signatures never collide with newly computed ones, so
    // admission would silently degrade to batch-local dedup
    Files.writeString(stamp, "mh60-v1:shingle=word3:K=8:bands=4:perm=golden-xor:sig=md5")
    val e = intercept[IllegalArgumentException] {
      new LshAdmissionIndex(spark, dir, threshold = 0.5)
    }
    assert(e.getMessage.contains("signature scheme"))
    // a pre-versioning index (committed batches, no stamp) also fails loud
    Files.delete(stamp)
    val e2 = intercept[IllegalStateException] {
      new LshAdmissionIndex(spark, dir, threshold = 0.5)
    }
    assert(e2.getMessage.contains("no _scheme"))
  }

  test("in-batch: smaller id admits, larger near-dup rejects; unrelated passes") {
    val dir = Files.createTempDirectory("graft-admit-2").toString
    val index = new LshAdmissionIndex(spark, dir, threshold = 0.5)
    val a = index.admit(docs(
      5L -> base,
      7L -> (base + " tail"),
      8L -> "short"), 0L) // < 3 tokens: shingle-less, always admitted
    assert(ids(a) == Seq(5L, 8L))
  }

  test("a rejected doc still rejects ITS later near-dups (index-everything)") {
    val dir = Files.createTempDirectory("graft-admit-3").toString
    val index = new LshAdmissionIndex(spark, dir, threshold = 0.5)
    index.admit(docs(1L -> base), 0L)
    val mid = index.admit(docs(2L -> (base + " v2")), 1L)
    assert(ids(mid) == Seq.empty, "near-dup of doc 1")
    // doc 3 is a near-dup of REJECTED doc 2's text form as well as doc 1's —
    // but even if it only collided with 2, 2 being indexed must reject it
    val last = index.admit(docs(3L -> (base + " v2 extra")), 2L)
    assert(ids(last) == Seq.empty, "rejected docs must still be in the index")
  }

  test("streaming drive: file drops admit through the persisted index across restarts") {
    val src = Files.createTempDirectory("graft-admit-src").toString
    val ckpt = Files.createTempDirectory("graft-admit-ckpt").toString
    val idxDir = Files.createTempDirectory("graft-admit-idx").toString
    val admDir = Files.createTempDirectory("graft-admit-out").toString
    val schema = docs(0L -> "x").schema

    def run(): Unit = {
      // NEW objects each run: state must come from the directories alone
      val index = new LshAdmissionIndex(spark, idxDir, threshold = 0.5)
      val admitted = new graft.streaming.ParquetTableSink(
        spark, admDir, docs(0L -> "x").limit(0), Seq("doc_id"))
      index.startAdmission(
        spark.readStream.schema(schema).parquet(s"$src/*"),
        admitted, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow()
      ).awaitTermination()
    }

    docs(1L -> base, 2L -> "a fresh unrelated corpus line about z-order file pruning and symmetric hash join state").repartition(1).write.parquet(s"$src/d1")
    run()
    docs(10L -> (base + " suffix"), 11L -> "another novel document mentioning derby staging transactions and watermark eviction").repartition(1).write.parquet(s"$src/d2")
    run() // second process: resumes index + checkpoint from disk

    val admitted = new graft.streaming.ParquetTableSink(
      spark, admDir, docs(0L -> "x").limit(0), Seq("doc_id")).current
    assert(ids(admitted) == Seq(1L, 2L, 11L),
      "doc 10 must be rejected against the index persisted by the first run")
  }

  test("startAdmission releases the per-batch LSH cache after each admitted merge") {
    val src = Files.createTempDirectory("graft-admit-leak-src").toString
    val ckpt = Files.createTempDirectory("graft-admit-leak-ckpt").toString
    val idxDir = Files.createTempDirectory("graft-admit-leak-idx").toString
    val admDir = Files.createTempDirectory("graft-admit-leak-out").toString
    val schema = docs(0L -> "x").schema

    // three drop files with strictly increasing mtimes → three one-file
    // micro-batches under maxFilesPerTrigger=1 (semantics below are also
    // order-robust: 2 rejects against 1 and 3 is unrelated, whatever the
    // batch order)
    Seq(
      "d1" -> docs(1L -> base),
      "d2" -> docs(2L -> (base + " suffix")),
      "d3" -> docs(3L -> "an unrelated line about manifest diffing and churned bucket replay")
    ).zipWithIndex.foreach { case ((name, df), i) =>
      df.repartition(1).write.parquet(s"$src/$name")
      val t = java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L)
      Files.walk(java.nio.file.Paths.get(src, name)).forEach(p => Files.setLastModifiedTime(p, t))
    }

    // start from a clean slate: sibling tests use the batch admit() entry
    // point, whose cache release is deferred to the session owner
    spark.sharedState.cacheManager.clearCache()
    val index = new LshAdmissionIndex(spark, idxDir, threshold = 0.5)
    val admitted = new graft.streaming.ParquetTableSink(
      spark, admDir, docs(0L -> "x").limit(0), Seq("doc_id"))
    index.startAdmission(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(s"$src/*"),
      admitted, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow()
    ).awaitTermination()

    assert(admitted.lastCommittedBatchId == 2L, "three one-file micro-batches expected")
    assert(ids(admitted.current) == Seq(1L, 3L), "near-dup 2 rejected through the index")
    assert(spark.sharedState.cacheManager.isEmpty,
      "per-batch LSH cache must be unpersisted after each admitted merge")
  }

  test("admitEager releases the per-batch LSH cache before returning") {
    val dir = Files.createTempDirectory("graft-admit-eager").toString
    spark.sharedState.cacheManager.clearCache() // sibling tests defer release
    val index = new LshAdmissionIndex(spark, dir, threshold = 0.5)
    val a0 = index.admitEager(docs(1L -> base), 0L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "admitEager must not leave a cache entry behind")
    val a1 = index.admitEager(docs(10L -> (base + " suffix"), 11L ->
      "an unrelated line about manifest diffing and churned bucket replay"), 1L)
    assert(spark.sharedState.cacheManager.isEmpty)
    // the returned frames stay consumable after the release (materialized,
    // not lazily chained to the dropped cache entry)
    assert(ids(a0) == Seq(1L) && ids(a1) == Seq(11L),
      "admission semantics unchanged under eager release")
  }

  test("replaying a committed batch is a no-op for the index state") {
    val dir = Files.createTempDirectory("graft-admit-4").toString
    val index = new LshAdmissionIndex(spark, dir, threshold = 0.5)
    index.admit(docs(1L -> base), 0L)
    assert(index.lastCommittedBatchId == 0L)
    index.admit(docs(1L -> base), 0L) // replay
    assert(index.lastCommittedBatchId == 0L)
    // and the replay didn't duplicate members: a fresh near-dup still rejects
    val a = index.admit(docs(9L -> (base + " tail")), 1L)
    assert(ids(a) == Seq.empty)
  }
}
