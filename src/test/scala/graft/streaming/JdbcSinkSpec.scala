package graft.streaming

import java.nio.file.Files
import java.sql.DriverManager
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkTestBase, Tables}

/** The JDBC boundary made real: micro-batches cross the embedded Derby JDBC
  * driver into a database table with the staging-load + transactional-MERGE
  * protocol (reference: psycopg2 `connect.py:8-14`, committed upserts
  * `agency.py:311-322`). The tests mirror PersistentSinkSpec: restart
  * resumes from the database alone, a retried pipeline lands exactly-once,
  * replayed batches are skipped.
  */
class JdbcSinkSpec extends SparkTestBase {

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private def events = Tables(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "ts", "user_id", "value")

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def newSink(url: String) =
    new JdbcUpsertSink(url, "events_tbl", Seq("event_id"), events.schema)

  /** Read the sink table back THROUGH Spark's JDBC source (the read path a
    * user of the library gets), sorted ids. */
  private def tableIds(url: String): Seq[Long] = {
    val session = spark
    import session.implicits._
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", "events_tbl").load()
      .select(col("EVENT_ID").cast("long")).as[Long].collect().sorted.toSeq
  }

  private def sortedIds(df: DataFrame): Seq[Long] = {
    val session = spark
    import session.implicits._
    df.select("event_id").as[Long].collect().sorted.toSeq
  }

  test("JDBC table survives restart: a fresh sink object resumes from the database alone") {
    val url = freshUrl()
    val src = Files.createTempDirectory("graft-jdbc-drops").toString
    val ckpt = Files.createTempDirectory("graft-jdbc-ckpt").toString

    def run(): Unit = {
      val sink = newSink(url) // new object each run: state lives in the DB
      val stream = spark.readStream.schema(events.schema).parquet(s"$src/*")
      StreamingOps.startJdbcMergeSink(
        StreamingOps.dedupByKey(stream, "ts", "10 minutes", Seq("event_id")),
        sink, ckpt, Trigger.AvailableNow()
      ).awaitTermination()
    }

    events.filter(col("event_id") < 300).write.parquet(s"$src/d1")
    run() // first "process"
    events.filter(col("event_id") >= 300 && col("event_id") < 500).write.parquet(s"$src/d2")
    run() // second "process", same DB + checkpoint

    assert(tableIds(url) == sortedIds(events.filter(col("event_id") < 500)),
      "JDBC table after restart must equal the single-delivery result")
  }

  test("transaction boundary: merge + batch-id commit are atomic; replay is skipped") {
    val url = freshUrl()
    val sink = newSink(url)
    val batch = events.filter(col("event_id") < 100)

    sink.merge(batch, batchId = 0L)
    assert(sink.lastCommittedBatchId == 0L)
    sink.merge(batch.limit(1), batchId = 0L) // replay: guard skips entirely
    assert(tableIds(url) == sortedIds(batch))

    sink.merge(batch, batchId = 1L) // idempotent upsert of identical rows
    assert(sink.lastCommittedBatchId == 1L)
    assert(tableIds(url) == sortedIds(batch))

    // upsert semantics: re-merging a key updates the non-key columns
    sink.merge(batch.limit(5).withColumn("value", lit(-1.0)), batchId = 2L)
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT count(*) FROM events_tbl WHERE value = -1.0")
      rs.next()
      assert(rs.getInt(1) == 5, "matched keys must take the updated value")
    } finally c.close()
    assert(tableIds(url) == sortedIds(batch), "no duplicate keys after update")
  }

  test("transient failure before the merge transaction: retry lands exactly-once") {
    val url = freshUrl()
    val src = Files.createTempDirectory("graft-jdbc-retry").toString
    val ckpt = Files.createTempDirectory("graft-jdbc-retry-ckpt").toString
    val sink = newSink(url)
    events.filter(col("event_id") < 400).write.parquet(s"$src/d1")
    val injected = new AtomicBoolean(false)

    val attempts = StreamingOps.withRetries(3) { () =>
      spark.readStream.schema(events.schema).parquet(s"$src/*")
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          if (injected.compareAndSet(false, true))
            throw new RuntimeException("injected transient sink failure")
          sink.merge(b, id)
        }
        .start()
    }

    assert(attempts == 2, s"expected exactly one retry, used $attempts attempts")
    assert(tableIds(url) == sortedIds(events.filter(col("event_id") < 400)),
      "JDBC table after retry must be exactly-once")
  }
}
