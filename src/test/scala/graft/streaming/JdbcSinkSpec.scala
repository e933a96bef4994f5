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

  test("NULL values bind with the column's declared JDBC type (Derby rejects Types.NULL)") {
    // the GraftApp shape: a LEFT-join enrichment leaves NULL attributes for
    // unmatched keys — those rows must survive the staging INSERT
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("value", DoubleType),
      StructField("c_mktsegment", StringType)))
    val rows = java.util.Arrays.asList(
      Row(1L, 2.5, "BUILDING"),
      Row(2L, null, "MACHINERY"),
      Row(3L, 7.5, null),
      Row(4L, null, null))
    val batch = spark.createDataFrame(rows, schema)
    val url = freshUrl()
    val sink = new JdbcUpsertSink(url, "null_tbl", Seq("event_id"), schema)
    sink.merge(batch, batchId = 0L)

    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT count(*), count(value), count(c_mktsegment) FROM null_tbl")
      rs.next()
      assert((rs.getInt(1), rs.getInt(2), rs.getInt(3)) == ((4, 2, 2)),
        "all four rows must land; NULLs must stay NULL per column")
    } finally c.close()

    // and an UPDATE path writing NULL over a non-null value
    sink.merge(spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null, null)), schema), batchId = 1L)
    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery(
        "SELECT value, c_mktsegment FROM null_tbl WHERE event_id = 1")
      rs.next()
      rs.getDouble(1)
      assert(rs.wasNull(), "update must be able to write NULL over a value")
    } finally c2.close()
  }

  test("binding is order-independent: a column-permuted batch writes the right columns") {
    val url = freshUrl()
    val sink = newSink(url)
    val batch = events.filter(col("event_id") < 50)
    val permuted = batch.select("value", "user_id", "ts", "event_id")
    sink.merge(permuted, batchId = 0L)

    val expected = batch.select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT event_id, value FROM events_tbl")
      var n = 0
      while (rs.next()) {
        assert(expected(rs.getLong(1)) == rs.getDouble(2),
          s"value for event ${rs.getLong(1)} must come from the value column")
        n += 1
      }
      assert(n == 50)
    } finally c.close()

    // a batch whose types disagree with the declared schema must fail loud
    val bad = batch.withColumn("value", col("value").cast("float"))
    val e = intercept[Exception] { sink.merge(bad, batchId = 1L) }
    assert(e.getMessage.contains("value"), s"type mismatch must name the column: $e")
  }

  test("staging re-load (simulated committed-task retry) still merges single-delivery") {
    val url = freshUrl()
    val sink = newSink(url)
    val batch = events.filter(col("event_id") < 200)

    // simulate a partition whose INSERT transaction committed and whose task
    // was then re-run: the same rows land in staging twice
    sink.ensureTables()
    sink.clearStaging()
    sink.loadStaging(batch)
    sink.loadStaging(batch.filter(col("event_id") < 80)) // the "retried" subset
    sink.mergeCommit(batchId = 0L)

    assert(tableIds(url) == sortedIds(batch),
      "duplicated staging rows must collapse to single delivery through the retry-dedup table")
  }

  test("one-writer contract: a concurrent merger fails loud; committed state matches the single-writer sequence") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val url = freshUrl()
    val sinkA = newSink(url)
    val sinkB = newSink(url)
    val b0 = events.filter(col("event_id") < 100)
    val b1 = events.filter(col("event_id") >= 100 && col("event_id") < 200)
    val b2 = events.filter(col("event_id") >= 200 && col("event_id") < 250)
    sinkA.merge(b0, 0L)

    // writer A parks MID-MERGE holding the sink lock (transaction open,
    // nothing staged yet); writer B must fail loud without touching staging
    val held = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    sinkA.onLockAcquired = () => {
      held.countDown(); release.await(120, TimeUnit.SECONDS); ()
    }
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = scala.concurrent.Future(sinkA.merge(b1, 1L))
    assert(held.await(120, TimeUnit.SECONDS), "writer A must reach the lock-held point")
    val e = intercept[RuntimeException](sinkB.merge(b2, 2L))
    assert(e.getMessage.contains("another writer holds the sink lock"),
      s"the losing merger must stop loudly on the held sink lock: ${e.getMessage}")
    assert(tableIds(url) == sortedIds(b0),
      "the losing merger must leave committed state untouched")

    // release A; its commit lands; B's serialized retry then lands; the
    // final table equals the single-writer sequential run
    release.countDown()
    scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration(180, "seconds"))
    sinkA.onLockAcquired = () => ()
    sinkB.merge(b2, 2L)
    assert(sinkB.lastCommittedBatchId == 2L)
    assert(tableIds(url) == sortedIds(b0.union(b1).union(b2)),
      "serialized writers must produce exactly the single-writer result")
  }

  test("a crashed lock holder self-releases: the holding transaction IS the lock") {
    val url = freshUrl()
    val sink = newSink(url)
    val b0 = events.filter(col("event_id") < 100)
    val b1 = events.filter(col("event_id") >= 100 && col("event_id") < 150)
    sink.merge(b0, 0L)

    // a foreign holder with an OPEN transaction X-locking the sink row
    val foreign = DriverManager.getConnection(url)
    foreign.setAutoCommit(false)
    val st = foreign.createStatement()
    assert(st.executeUpdate(
      "UPDATE graft_sink_locks SET holder = 'crashed-writer' WHERE sink_name = 'events_tbl'") == 1)
    val e = intercept[RuntimeException](sink.merge(b1, 1L))
    assert(e.getMessage.contains("another writer holds the sink lock"))

    // the holder dies: the engine rolls its transaction back (modeled here
    // by the rollback crash recovery performs) — the lock is gone with no
    // sweep, no registry surgery, no operator action
    foreign.rollback(); st.close(); foreign.close()
    sink.merge(b1, 1L)
    assert(tableIds(url) == sortedIds(b0.union(b1)),
      "after the holder's death the next merge proceeds hands-off")
  }

  test("two real processes: the late writer errors before touching anything; the table is intact") {
    import java.nio.file.Files
    val url = freshUrl()
    val sink = newSink(url)
    val b0 = events.filter(col("event_id") < 100)
    sink.merge(b0, 0L) // boots the embedded engine in THIS JVM and keeps it booted

    // a REAL second JVM pointed at the same database directory: embedded
    // Derby's dual-boot guard (db.lck) refuses the second engine at connect
    // — upstream of staging, loud by construction. (On a client/server
    // warehouse URL both processes connect and the graft_sink_locks row
    // X-lock — driven above — is the arbiter.)
    val log = Files.createTempFile("graft-jdbcdrive", ".log")
    val p = new ProcessBuilder(
      Seq("java", "-cp", System.getProperty("java.class.path"),
        "graft.streaming.JdbcDriveMain", url): _*)
      .redirectErrorStream(true)
      .redirectOutput(log.toFile)
      .start()
    assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "the child process must terminate")
    val out = Files.readString(log)
    assert(out.contains("LOST"),
      s"the second process must fail to reach the busy database: $out")
    assert(out.contains("XSDB6") || out.contains("XJ040") ||
        out.toLowerCase.contains("another instance"),
      s"the failure must be the engine's boot guard, not something obscure: $out")
    assert(tableIds(url) == sortedIds(b0),
      "the failed foreign writer must leave the table untouched")
  }

  test("conflicting same-key staging rows (nondeterministic upstream) fail loud, not merge") {
    val url = freshUrl()
    val sink = newSink(url)
    val batch = events.filter(col("event_id") < 50)

    sink.ensureTables()
    sink.clearStaging()
    sink.loadStaging(batch)
    // a re-run that changed a row's VALUE for an existing key: DISTINCT
    // cannot collapse it, and MERGE must not pick an arbitrary winner
    sink.loadStaging(batch.limit(3).withColumn("value", col("value") + 1.0))
    val e = intercept[Exception] { sink.mergeCommit(batchId = 0L) }
    assert(e.getMessage.contains("not deterministic"),
      s"conflicting keys must fail loud with the contract named: $e")
    assert(sink.lastCommittedBatchId == -1L, "nothing may commit on conflict")
  }

  test("column names differing only in case still align (JDBC read-back uppercases)") {
    val url = freshUrl()
    val sink = newSink(url)
    val batch = events.filter(col("event_id") < 40)
    // the round-trip shape: a frame read back through Derby carries
    // EVENT_ID/TS/... — under the default case-insensitive resolver the
    // sink must accept it
    val uppercased = batch.toDF(batch.columns.map(_.toUpperCase).toIndexedSeq: _*)
    sink.merge(uppercased, batchId = 0L)
    assert(tableIds(url) == sortedIds(batch),
      "an uppercased-identifier batch must land through the case-insensitive alignment")
  }

  test("CDC deletes cross the JDBC boundary: tombstones DELETE, delete wins in-batch, absent keys no-op") {
    val url = freshUrl()
    val sink = newSink(url)
    sink.merge(events.filter(col("event_id") < 200), 0L)

    // one CDC batch: upsert [200,250), tombstone 10–19 (present), 210 (also
    // upserted in this batch — delete must win), and 99999 (absent — no-op);
    // tombstones carry junk payloads to prove payload noise never merges
    val ups = events.filter(col("event_id") >= 200 && col("event_id") < 250)
      .withColumn(ParquetTableSink.DeleteCol, lit(false))
    val dels = events.filter(
      (col("event_id") >= 10 && col("event_id") < 20) || col("event_id") === 210)
      .withColumn("value", col("value") * -999) // junk payload on the tombstone
      .withColumn(ParquetTableSink.DeleteCol, lit(true))
    val absent = events.limit(1).withColumn("event_id", lit(99999L))
      .withColumn(ParquetTableSink.DeleteCol, lit(true))
    sink.merge(ups.unionByName(dels).unionByName(absent), 1L)

    val expected = sortedIds(events.filter(col("event_id") < 250 &&
      !(col("event_id") >= 10 && col("event_id") < 20) && col("event_id") =!= 210))
    assert(tableIds(url) == expected)

    // two tombstones for one key with different payloads must not trip the
    // conflict probe (payloads are normalized away), and replay is a no-op
    val twoTombs = events.filter(col("event_id") === 30)
      .withColumn(ParquetTableSink.DeleteCol, lit(true))
      .unionByName(events.filter(col("event_id") === 30)
        .withColumn("value", lit(-1.0))
        .withColumn(ParquetTableSink.DeleteCol, lit(true)))
    sink.merge(twoTombs, 2L)
    assert(tableIds(url) == expected.filterNot(_ == 30L))
    sink.merge(twoTombs, 2L) // replay: batchId guard
    assert(tableIds(url) == expected.filterNot(_ == 30L))
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
