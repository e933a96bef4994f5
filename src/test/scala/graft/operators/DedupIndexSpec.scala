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
