package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkTestBase, Tables}

/** The durable half of the sink story (reference: committed Postgres merges,
  * agency.py:311-322) plus the ST7 retry envelope (run.py:69-77,114-121):
  *
  *   - ParquetTableSink survives "process death" — only the on-disk
  *     directory carries state between runs; a fresh sink object over the
  *     same directory resumes exactly where the previous one committed.
  *   - withRetries restarts a failed pipeline from its checkpoint within a
  *     bounded attempt budget and the final table is exactly-once.
  */
class PersistentSinkSpec extends SparkTestBase {

  private def events = Tables(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "ts", "user_id", "value")

  private def sortedIds(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val session = spark
    import session.implicits._
    df.select("event_id").as[Long].collect().sorted.toSeq
  }

  test("on-disk table survives restart: fresh sink object resumes from the committed version") {
    val src = Files.createTempDirectory("graft-psink-drops").toString
    val ckpt = Files.createTempDirectory("graft-psink-ckpt").toString
    val table = Files.createTempDirectory("graft-psink-table").toString
    val zero = events.limit(0)

    def run(): Unit = {
      // a NEW sink object each run: state must come from the directory alone
      val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))
      val stream = spark.readStream.schema(events.schema).parquet(s"$src/*")
      StreamingOps.startPersistentMergeSink(
        StreamingOps.dedupByKey(stream, "ts", "10 minutes", Seq("event_id")),
        sink, ckpt, Trigger.AvailableNow()
      ).awaitTermination()
    }

    events.filter(col("event_id") < 300).write.parquet(s"$src/d1")
    run() // first "process"

    events.filter(col("event_id") >= 300 && col("event_id") < 500).write.parquet(s"$src/d2")
    run() // second "process", same table dir + checkpoint

    val expected = events.filter(col("event_id") < 500)
    val onDisk = new ParquetTableSink(spark, table, zero, Seq("event_id")).current
    assert(onDisk.count() == expected.count())
    assert(sortedIds(onDisk) == sortedIds(expected),
      "on-disk table after restart must equal the single-delivery result")
  }

  test("batchId guard: a replayed already-committed batch does not rewrite the table") {
    val table = Files.createTempDirectory("graft-psink-guard").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))
    val batch = events.filter(col("event_id") < 100)

    sink.merge(batch, batchId = 0L)
    val afterFirst = sink.lastCommittedBatchId
    sink.merge(batch, batchId = 0L) // replay of a committed batch: no-op
    assert(sink.lastCommittedBatchId == afterFirst)
    assert(sink.current.count() == batch.count())

    sink.merge(batch, batchId = 1L) // idempotent upsert: same state, new version
    assert(sink.current.count() == batch.count())
  }

  test("bucket pruning: a batch touching one bucket leaves the other buckets byte-identical") {
    val table = Files.createTempDirectory("graft-psink-bucket").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))

    sink.merge(events.filter(col("event_id") < 300), batchId = 0L)

    // every data file of the committed v0 layout: path -> size
    def dataFiles(): Map[String, Long] = {
      val data = java.nio.file.Paths.get(table, "data")
      val s = java.nio.file.Files.walk(data)
      try s.iterator().asScala.toSeq
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
      finally s.close()
    }
    val before = dataFiles()
    assert(before.keys.map(_.replaceAll(".*/data/", "").takeWhile(_ != '/')).toSet.size > 1,
      "fixture must populate more than one bucket for pruning to be observable")

    // one single-key batch: exactly one bucket is touched
    val session = spark
    import session.implicits._
    val touchedBucket = events.filter(col("event_id") === 301)
      .select(pmod(hash(col("event_id")), lit(16))).as[Int].head()
    sink.merge(events.filter(col("event_id") === 301), batchId = 1L)
    val after = dataFiles()

    val untouchedBefore = before.filterNot(_._1.contains(s"/b$touchedBucket-v"))
    untouchedBefore.foreach { case (path, size) =>
      assert(after.get(path).contains(size),
        s"untouched bucket file must survive the merge byte-identical: $path")
    }
    assert(after.keys.exists(_.contains(s"/b$touchedBucket-v1")),
      "the touched bucket must be rewritten under the new version")
    assert(sortedIds(sink.current) ==
      sortedIds(events.filter(col("event_id") < 300 || col("event_id") === 301)),
      "pruned rewrite must still produce the correct merged table")
  }

  test("bucket-count mismatch with an existing table is rejected; GC keeps exactly two manifests") {
    val table = Files.createTempDirectory("graft-psink-cfg").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"), buckets = 16)
    sink.merge(events.filter(col("event_id") < 100), 0L)

    val e = intercept[IllegalArgumentException] {
      new ParquetTableSink(spark, table, zero, Seq("event_id"), buckets = 8)
    }
    assert(e.getMessage.contains("B=16"))

    sink.merge(events.filter(col("event_id") === 150), 1L)
    sink.merge(events.filter(col("event_id") === 151), 2L)
    val manifests = java.nio.file.Files.list(java.nio.file.Paths.get(table, "manifest"))
    val kept = try manifests.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      finally manifests.close()
    assert(kept == Seq("v1", "v2"),
      s"GC must keep the last two manifest versions only, got $kept")
  }

  test("a crashed attempt's garbage (orphan v{next} dirs, stale staging) cannot wedge the next merge") {
    val table = Files.createTempDirectory("graft-psink-crash").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))
    sink.merge(events.filter(col("event_id") < 200), batchId = 0L)

    // simulate a crash AFTER data promotion but BEFORE the pointer swap:
    // an orphaned next-version bucket dir plus staging residue on disk
    val data = java.nio.file.Paths.get(table, "data")
    val orphan = data.resolve("b3-v1")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-junk.parquet"), "not parquet at all")
    val staging = java.nio.file.Paths.get(table, "_staging", "batch")
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("leftover"), "stale")

    // the replayed batch must commit cleanly over the garbage
    sink.merge(events.filter(col("event_id") >= 200 && col("event_id") < 300), batchId = 1L)
    assert(sortedIds(sink.current) == sortedIds(events.filter(col("event_id") < 300)),
      "recovery merge must produce the correct table despite crash garbage")
  }

  test("time travel: snapshotAt reads each retained version; changesSince reads only churned buckets") {
    val table = Files.createTempDirectory("graft-psink-tt").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"), retain = 4)

    sink.merge(events.filter(col("event_id") < 200), 0L)              // v0
    sink.merge(events.filter(col("event_id") === 301), 1L)           // v1: one key
    // a v2 batch of 3 keys: touches ≤3 of the 16 buckets, so the
    // changesSince subset assertion below has slack
    sink.merge(events.filter(col("event_id") >= 400 && col("event_id") < 403), 2L) // v2

    assert(sink.versions == Seq(0L, 1L, 2L))
    assert(sortedIds(sink.snapshotAt(0)) == sortedIds(events.filter(col("event_id") < 200)),
      "snapshotAt(0) must be the state as of the first commit")
    assert(sortedIds(sink.snapshotAt(1)) ==
      sortedIds(events.filter(col("event_id") < 200 || col("event_id") === 301)))
    assert(sortedIds(sink.snapshotAt(2)) == sortedIds(sink.current))

    // incremental read from v1: only buckets merged after v1 (the v2 batch's
    // buckets) come back — a strict subset of the table containing all v2 keys
    val changed = sink.changesSince(1)
    val changedIds = sortedIds(changed)
    val v2Ids = sortedIds(events.filter(col("event_id") >= 400 && col("event_id") < 403))
    assert(v2Ids.forall(changedIds.contains), "changesSince must cover every merged key")
    assert(changedIds.size < sortedIds(sink.current).size,
      "changesSince must be a bucket-granular subset, not a full-table read")
    assert(sink.changesSince(2).count() == 0, "no merges after v2 → empty delta")

    // a single-bucket churn: the delta reads exactly that bucket
    sink.merge(events.filter(col("event_id") === 302), 3L)           // v3
    val oneBucket = sink.changesSince(2)
    val session = spark
    import session.implicits._
    val b302 = events.filter(col("event_id") === 302)
      .select(pmod(hash(col("event_id")), lit(16))).as[Int].head()
    val rowBuckets = oneBucket.select(pmod(hash(col("event_id")), lit(16))).as[Int].collect().toSet
    assert(rowBuckets == Set(b302), s"delta after a one-key merge must read one bucket, got $rowBuckets")
  }

  test("schema evolution: an added column joins the table nullable, old eras keep their schema") {
    val table = Files.createTempDirectory("graft-psink-evolve").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"), retain = 4)

    sink.merge(events.filter(col("event_id") < 100), 0L)                // v0: base schema
    sink.merge(events.filter(col("event_id") >= 100 && col("event_id") < 200)
      .withColumn("note", concat(lit("n"), col("event_id"))), 1L)       // v1: + note

    val cur = sink.current
    assert(cur.columns.contains("note"), "evolved column must be part of the current schema")
    assert(sink.currentSchema("note").nullable, "added columns must be nullable")
    // pre-evolution rows read back NULL for the new column — no rewrite
    assert(cur.filter(col("event_id") < 100 && col("note").isNull).count() == 100)
    assert(cur.filter(col("event_id") >= 100 && col("note") === concat(lit("n"), col("event_id"))).count() == 100)
    // time travel reads the v0 era under the schema it was written with
    assert(!sink.snapshotAt(0).columns.contains("note"),
      "a snapshot must carry its own era's schema, not the evolved one")
    assert(sortedIds(sink.snapshotAt(0)) == sortedIds(events.filter(col("event_id") < 100)))

    // a third merge WITH the evolved column updates evolved rows in place
    sink.merge(events.filter(col("event_id") === 50)
      .withColumn("note", lit("updated")), 2L)
    assert(sink.current.filter(col("note") === "updated").count() == 1)

    // a fresh sink over the same directory sees the evolved schema from disk
    val reopened = new ParquetTableSink(spark, table, zero, Seq("event_id"), retain = 4)
    assert(reopened.currentSchema.fieldNames.contains("note"))
  }

  test("aggregate combiner: groups accumulate across merges; a replayed batch cannot double-count") {
    val table = Files.createTempDirectory("graft-psink-rollup").toString
    val ev = events
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy((col("user_id") % 10).as("cohort"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(25,6)")).cast("decimal(25,6)").as("sum_v"))
    val combine: ParquetTableSink.Combiner = (t, d) =>
      graft.operators.IncrementalAgg.mergeStates(t, d, Seq("cohort"),
        add = Seq("n", "sum_v"))
        .select(col("cohort"), col("n"), col("sum_v").cast("decimal(25,6)").as("sum_v"))
    val sink = new ParquetTableSink(spark, table, partial(ev).limit(0),
      Seq("cohort"), buckets = 4, combine = combine)

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("cohort"), col("n"), col("sum_v").cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq

    sink.merge(partial(ev.filter(col("event_id") < 200)), 0L)
    sink.merge(partial(ev.filter(col("event_id") >= 200 && col("event_id") < 300)), 1L)
    assert(canon(sink.current) == canon(partial(ev.filter(col("event_id") < 300))),
      "accumulated view must equal the from-scratch aggregate")

    // the failure mode of incremental maintenance is double-counting — the
    // batchId guard must make an at-least-once replay a no-op
    sink.merge(partial(ev.filter(col("event_id") >= 200 && col("event_id") < 300)), 1L)
    assert(canon(sink.current) == canon(partial(ev.filter(col("event_id") < 300))),
      "a replayed committed batch must not re-accumulate")
  }

  test("schema evolution rejects dropped or retyped columns loud") {
    val table = Files.createTempDirectory("graft-psink-evolve-bad").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))
    sink.merge(events.filter(col("event_id") < 50), 0L)

    val dropped = intercept[RuntimeException] {
      sink.merge(events.filter(col("event_id") === 60).drop("value"), 1L)
    }
    assert(dropped.getMessage.contains("missing existing column value"))

    val retyped = intercept[IllegalArgumentException] {
      sink.merge(events.filter(col("event_id") === 60)
        .withColumn("value", col("value").cast("string")), 1L)
    }
    assert(retyped.getMessage.contains("type changes are not additive"))
    // failures committed nothing: the table is still at v0, batch 0
    assert(sink.lastCommittedBatchId == 0L)
    assert(sortedIds(sink.current) == sortedIds(events.filter(col("event_id") < 50)))
  }

  test("bucket files are clustered by the merge key (row-group stats prune key lookups)") {
    val table = Files.createTempDirectory("graft-psink-cluster").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))
    sink.merge(events.filter(col("event_id") < 500), 0L)

    val session = spark
    import session.implicits._
    val data = java.nio.file.Paths.get(table, "data")
    val files = java.nio.file.Files.walk(data).iterator().asScala.toSeq
      .filter(p => p.toString.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f.toString).select("event_id").as[Long].collect().toSeq
      assert(ids == ids.sorted, s"rows in $f must be key-ordered for stats pruning")
    }
  }

  test("crash orphans are invisible: uncommitted manifests are not readable, stale schema files cannot poison a replay") {
    val table = Files.createTempDirectory("graft-psink-orphan").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))
    sink.merge(events.filter(col("event_id") < 100), 0L)

    // crash between the manifest move and the pointer swap: a v1 manifest
    // exists on disk but the pointer still says v0 — it must not be readable
    val manifest = java.nio.file.Paths.get(table, "manifest")
    Files.writeString(manifest.resolve("v1"), "0 b0-v1")
    assert(sink.versions == Seq(0L), "an uncommitted manifest must not be listed")
    intercept[IllegalArgumentException](sink.snapshotAt(1))

    // crash of an EVOLVING attempt after its schema write: a stale v1.schema
    // with a phantom column — a non-evolving replay must clean it, not
    // commit under it (which would wedge every later merge)
    val phantom = org.apache.spark.sql.types.StructType(zero.schema.fields :+
      org.apache.spark.sql.types.StructField("phantom",
        org.apache.spark.sql.types.StringType, nullable = true))
    Files.writeString(manifest.resolve("v1.schema"), phantom.json)
    sink.merge(events.filter(col("event_id") >= 100 && col("event_id") < 150), 1L)
    assert(!sink.currentSchema.fieldNames.contains("phantom"),
      "a stale schema file from a crashed attempt must not survive the replay")
    // and the table still merges fine afterwards
    sink.merge(events.filter(col("event_id") === 150), 2L)
    assert(sortedIds(sink.current) == sortedIds(events.filter(col("event_id") <= 150)))
  }

  test("retention: GC prunes past the retain window and snapshotAt fails loud on a pruned version") {
    val table = Files.createTempDirectory("graft-psink-retain").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"), retain = 3)
    (0 to 4).foreach(i => sink.merge(events.filter(col("event_id") === 100 + i), i.toLong))
    assert(sink.versions == Seq(2L, 3L, 4L), s"retain=3 must keep the last three, got ${sink.versions}")
    val e = intercept[IllegalArgumentException](sink.snapshotAt(0))
    assert(e.getMessage.contains("not retained"),
      "time travel past retention must fail loud, not fall back silently")
    assert(sortedIds(sink.current) ==
      sortedIds(events.filter(col("event_id").between(100, 104))))
  }

  test("vacuum: expires history on demand, keeps the live snapshot intact, frees the disk") {
    val table = Files.createTempDirectory("graft-psink-vacuum").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, Paths.get(table).resolve("t").toString,
      zero, Seq("event_id"), retain = 4)
    // growing windows so successive merges CHURN the same buckets — each
    // version then pins its own superseded copy of those bucket dirs, the
    // storage a vacuum exists to free
    (0 to 2).foreach(i => sink.merge(
      events.filter(col("event_id").between(100, 100 + i)), i.toLong))
    assert(sink.versions == Seq(0L, 1L, 2L), "retain=4 keeps all three pre-vacuum")
    val dataDirsBefore = Files.list(Paths.get(table).resolve("t/data")).count()

    sink.vacuum(keep = 1)

    assert(sink.versions == Seq(2L), s"keep=1 must leave only current, got ${sink.versions}")
    val e = intercept[IllegalArgumentException](sink.snapshotAt(1))
    assert(e.getMessage.contains("not retained"),
      "time travel to a vacuumed version must fail loud")
    assert(sortedIds(sink.current) ==
      sortedIds(events.filter(col("event_id").between(100, 102))),
      "the live snapshot must survive the vacuum byte-for-byte")
    val dataDirsAfter = Files.list(Paths.get(table).resolve("t/data")).count()
    assert(dataDirsAfter < dataDirsBefore,
      s"vacuum must delete unreferenced data dirs ($dataDirsBefore -> $dataDirsAfter)")
    // a later merge proceeds normally and re-applies the automatic policy
    sink.merge(events.filter(col("event_id") === 103), 3L)
    assert(sink.versions == Seq(2L, 3L))
    assert(intercept[IllegalArgumentException](sink.vacuum(0)).getMessage
      .contains("at least the current"), "keep=0 must be rejected")
  }

  test("CDC deletes: tombstones remove keys, delete wins within a batch, absent-key delete is a no-op") {
    val table = Files.createTempDirectory("graft-psink-del").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"), retain = 4)
    sink.merge(events.filter(col("event_id") < 200), 0L) // v0

    // one CDC batch: upsert [200,300), tombstone ids 50–59 (present),
    // id 250 (upserted in the SAME batch — delete must win), and id 9999
    // (absent — a no-op, not an error)
    val ups = events.filter(col("event_id") >= 200 && col("event_id") < 300)
      .withColumn(ParquetTableSink.DeleteCol, lit(false))
    val dels = events.filter(
      (col("event_id") >= 50 && col("event_id") < 60) || col("event_id") === 250)
      .withColumn(ParquetTableSink.DeleteCol, lit(true))
    val absent = events.limit(1)
      .withColumn("event_id", lit(9999L))
      .withColumn(ParquetTableSink.DeleteCol, lit(true))
    sink.merge(ups.unionByName(dels).unionByName(absent), 1L) // v1

    val expected = events.filter(col("event_id") < 300 &&
      !(col("event_id") >= 50 && col("event_id") < 60) && col("event_id") =!= 250)
    assert(sortedIds(sink.current) == sortedIds(expected))
    assert(!sink.current.columns.contains(ParquetTableSink.DeleteCol),
      "the tombstone marker must never become a table column")
    // time travel still sees the pre-delete era
    assert(sortedIds(sink.snapshotAt(0)) == sortedIds(events.filter(col("event_id") < 200)))
    // replay of the committed CDC batch: the batchId guard no-ops it
    sink.merge(ups.unionByName(dels), 1L)
    assert(sortedIds(sink.current) == sortedIds(expected))
  }

  test("CDC deletes: an emptied bucket leaves the manifest; deleteKeys needs only key columns") {
    val session = spark
    import session.implicits._
    val table = Files.createTempDirectory("graft-psink-del2").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"), retain = 4)
    val base = events.filter(col("event_id") < 100)
    sink.merge(base, 0L) // v0

    // tombstone EVERY key of one bucket through the key-only convenience API
    val victim = base.select(pmod(hash(col("event_id")), lit(16)).as("b"),
      col("event_id")).filter(col("b") === 3).select("event_id")
    val victimIds = victim.as[Long].collect().toSet
    assert(victimIds.nonEmpty, "fixture must place keys in bucket 3")
    sink.deleteKeys(victim, 1L) // v1

    assert(sortedIds(sink.current) ==
      sortedIds(base.filter(!col("event_id").isin(victimIds.toSeq: _*))))
    assert(sink.droppedBucketsSince(0) == Seq(3),
      "the emptied bucket must be reported dropped since v0")
    // and its data dir is gone from the CURRENT manifest: a fresh reader
    // over the table never scans it
    val files = sink.current.inputFiles
    assert(files.nonEmpty && !files.exists(_.contains("/b3-v")),
      "an emptied bucket must not contribute a data dir to the current scan")
    // other buckets were untouched by the delete-only batch
    assert(sink.changesSince(0).count() == 0,
      "a delete-only batch churns no surviving bucket: changesSince sees rows only for rewritten dirs that still exist")
  }

  test("point lookup scans only the buckets its keys hash to and returns exactly those rows") {
    val session = spark
    import session.implicits._
    val table = Files.createTempDirectory("graft-psink-lookup").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))
    sink.merge(events.filter(col("event_id") < 500), 0L)

    val probe = events.filter(col("event_id").isin(7L, 123L, 456L)).select("event_id")
    val got = sink.lookupKeys(probe)
    assert(sortedIds(got) == Seq(7L, 123L, 456L))

    // the scan must touch only the probed keys' buckets — never the table
    val wantedBuckets = probe
      .select(pmod(hash(col("event_id")), lit(16)).as("b")).as[Int].collect().toSet
    val scannedBuckets = got.inputFiles.filter(_.contains(s"$table/data/b"))
      .map(_.replaceAll(".*/data/b", "").takeWhile(_ != '-')).map(_.toInt).toSet
    assert(scannedBuckets == wantedBuckets,
      s"lookup must scan exactly the probed buckets: scanned $scannedBuckets, keys hash to $wantedBuckets")
    assert(scannedBuckets.size < 16, "pruning must be observable (not all buckets probed)")

    // absent keys: empty result, still no full scan
    val absent = sink.lookupKeys(Seq(999999L).toDF("event_id"))
    assert(absent.count() == 0)
  }

  test("ST7: transient first-attempt failure, pipeline completes on retry, table exactly-once") {
    val src = Files.createTempDirectory("graft-retry-drops").toString
    val ckpt = Files.createTempDirectory("graft-retry-ckpt").toString
    val table = Files.createTempDirectory("graft-retry-table").toString
    val zero = events.limit(0)
    val sink = new ParquetTableSink(spark, table, zero, Seq("event_id"))

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
    val expected = events.filter(col("event_id") < 400)
    assert(sink.current.count() == expected.count())
    assert(sortedIds(sink.current) == sortedIds(expected),
      "table after retry must be exactly-once")
  }

  test("withRetries propagates a persistent failure after the attempt budget") {
    val src = Files.createTempDirectory("graft-retry2-drops").toString
    events.filter(col("event_id") < 50).write.parquet(s"$src/d1")
    var calls = 0
    val e = intercept[Throwable] {
      StreamingOps.withRetries(2) { () =>
        calls += 1
        spark.readStream.schema(events.schema).parquet(s"$src/*")
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", Files.createTempDirectory("graft-retry2-ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (_: Dataset[Row], _: Long) =>
            throw new RuntimeException("permanent failure")
          }
          .start()
      }
    }
    assert(calls == 2, s"must stop at the attempt budget, made $calls attempts")
    assert(e.getMessage != null)
  }

  private def inodes(dir: java.nio.file.Path): Set[Long] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => Files.getAttribute(p, "unix:ino").asInstanceOf[Long]).toSet
    finally s.close()
  }

  test("cloneTo is zero-copy (hard links), isolated both ways, and carries the replay guard") {
    val srcDir = Files.createTempDirectory("graft-clone-src")
    val forkDir = Files.createTempDirectory("graft-clone-fork")
    val sink = new ParquetTableSink(spark, srcDir.toString, events.limit(0),
      Seq("event_id"), buckets = 4)
    sink.merge(events.filter(col("event_id") < 400), 0L)

    val clone = sink.cloneTo(forkDir.toString)
    // zero-copy: every cloned parquet file IS a source file (same inode)
    val srcInodes = inodes(srcDir.resolve("data"))
    val cloneInodes = inodes(forkDir.resolve("data"))
    assert(cloneInodes.nonEmpty && cloneInodes.subsetOf(srcInodes),
      "cloned data files must be hard links into the source's files")
    // the fork carries the source's exactly-once watermark
    assert(clone.lastCommittedBatchId == 0L)
    clone.merge(events.filter(col("event_id") < 10), 0L) // replay: must no-op
    assert(sortedIds(clone.current) == sortedIds(events.filter(col("event_id") < 400)))

    // divergence is isolated in BOTH directions
    val srcFilesBefore = inodes(srcDir.resolve("data"))
    clone.merge(events.filter(col("event_id") >= 400 && col("event_id") < 500), 1L)
    sink.merge(events.filter(col("event_id") >= 500 && col("event_id") < 600), 1L)
    assert(sortedIds(clone.current) == sortedIds(events.filter(col("event_id") < 500)),
      "source's post-fork merge must not reach the clone")
    assert(sortedIds(sink.current) == sortedIds(
      events.filter(col("event_id") < 400 || (col("event_id") >= 500 && col("event_id") < 600))),
      "clone's post-fork merge must not reach the source")
    assert(srcFilesBefore.subsetOf(inodes(srcDir.resolve("data")) ++ inodes(forkDir.resolve("data"))),
      "copy-on-write: no shared file may be rewritten in place")

    // a clone must refuse to land on a committed table
    val e = intercept[IllegalArgumentException](sink.cloneTo(forkDir.toString))
    assert(e.getMessage.contains("already holds a committed table"))
  }

  test("changeFeed: ops classify, identical rewrites emit nothing, v==current is empty") {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-cdf").toString
    val base = events.filter(col("event_id") < 100)
    // B=2 so the update/delete batch churns buckets holding many unchanged
    // keys — those identical re-emits must NOT appear in the feed
    val sink = new ParquetTableSink(spark, dir, events.limit(0), Seq("event_id"), buckets = 2)
    sink.merge(base, 0L)
    assert(sink.changeFeed(0L).count() == 0, "no diff against self")

    val upd = base.filter(col("event_id") === 1).withColumn("value", col("value") + 1.0)
      .withColumn(ParquetTableSink.DeleteCol, lit(false))
    val ins = events.filter(col("event_id") === 900)
      .withColumn(ParquetTableSink.DeleteCol, lit(false))
    val del = base.filter(col("event_id") === 2)
      .withColumn(ParquetTableSink.DeleteCol, lit(true))
    sink.merge(upd.unionByName(ins).unionByName(del), 1L)

    val feed = sink.changeFeed(0L)
      .select("_op", "event_id").as[(String, Long)].collect().toSeq.sorted
    assert(feed == Seq(("delete", 2L), ("insert", 900L), ("update", 1L)),
      s"exactly the three changed rows, got $feed")
    // delete rows carry the OLD values
    val delVal = sink.changeFeed(0L).filter(col("_op") === "delete").select("value")
      .as[Double].head()
    val origVal = base.filter(col("event_id") === 2).select("value").as[Double].head()
    assert(delVal == origVal, "delete must carry the retracted (old) state")
    // past retention fails loud like snapshotAt
    sink.merge(events.filter(col("event_id") === 901), 2L)
    sink.merge(events.filter(col("event_id") === 902), 3L)
    intercept[IllegalArgumentException](sink.changeFeed(0L))
  }

  test("CDC mirror maintained purely from the change feed converges, prunes, and replays as no-op") {
    val session = spark
    import session.implicits._
    val srcDir = Files.createTempDirectory("graft-cdf-src").toString
    val mirDir = Files.createTempDirectory("graft-cdf-mir").toString
    val src = new ParquetTableSink(spark, srcDir, events.limit(0), Seq("event_id"))
    val mirror = new ParquetTableSink(spark, mirDir, events.limit(0), Seq("event_id"))
    def sync(since: Long): Unit = mirror.merge(
      src.changeFeed(since)
        .withColumn(ParquetTableSink.DeleteCol, col("_op") === "delete")
        .drop("_op"),
      since + 1)

    src.merge(events.limit(0), 0L)                       // v0: empty
    src.merge(events.filter(col("event_id") < 200), 1L)  // v1: load
    sync(0L)
    assert(sortedIds(mirror.current) == sortedIds(src.current),
      "initial load must arrive through the feed")

    // one-key churn upstream → the sync must rewrite exactly one mirror bucket
    src.merge(events.filter(col("event_id") === 5)
      .withColumn("value", col("value") + 1.0), 2L)      // v2
    sync(1L)
    assert(sortedIds(mirror.current) == sortedIds(src.current))
    val mirrored = mirror.current.filter(col("event_id") === 5).select("value").as[Double].head()
    val upstream = src.current.filter(col("event_id") === 5).select("value").as[Double].head()
    assert(mirrored == upstream, "update must propagate new values")
    val b5 = events.filter(col("event_id") === 5)
      .select(pmod(hash(col("event_id")), lit(16))).as[Int].head()
    val touched = mirror.changesSince(0)  // mirror buckets churned by the 2nd sync
      .select(pmod(hash(col("event_id")), lit(16))).as[Int].collect().toSet
    assert(touched == Set(b5),
      s"a one-key upstream churn must rewrite one mirror bucket, got $touched")

    // a replayed sync (same upstream version, same mirror batch id) no-ops
    sync(1L)
    assert(mirror.lastCommittedBatchId == 2L && mirror.versions.size == 2,
      "replayed sync must not commit a new mirror version")

    // deletes retract through the feed
    src.deleteKeys(events.filter(col("event_id") < 50).select("event_id"), 3L) // v3
    sync(2L)
    assert(sortedIds(mirror.current) == sortedIds(src.current),
      "tombstones must retract mirrored rows")
  }

  test("rebucket rewrites at the new bucket count, preserves content, carries the guard") {
    val srcDir = Files.createTempDirectory("graft-rebucket-src")
    val dstDir = Files.createTempDirectory("graft-rebucket-dst")
    val narrow = new ParquetTableSink(spark, srcDir.toString, events.limit(0),
      Seq("event_id"), buckets = 2)
    narrow.merge(events.filter(col("event_id") < 300), 0L)
    narrow.merge(events.filter(col("event_id") >= 300 && col("event_id") < 400), 1L)

    val wide = narrow.rebucket(dstDir.toString, newBuckets = 8)
    assert(Files.readString(dstDir.resolve("_BUCKETS")).trim == "8")
    assert(sortedIds(wide.current) == sortedIds(events.filter(col("event_id") < 400)),
      "rebucket must preserve the exact row set")
    // the new layout is enforced: re-opening at the old count fails loud
    val e = intercept[IllegalArgumentException](
      new ParquetTableSink(spark, dstDir.toString, events.limit(0), Seq("event_id"), buckets = 2))
    assert(e.getMessage.contains("bucketed with B=8"))
    // replay guard carried: the last pre-rebucket batch skips, the next applies
    assert(wide.lastCommittedBatchId == 1L)
    wide.merge(events.filter(col("event_id") < 10), 1L) // replay: no-op
    wide.merge(events.filter(col("event_id") >= 400 && col("event_id") < 450), 2L)
    assert(sortedIds(wide.current) == sortedIds(events.filter(col("event_id") < 450)))
    // point lookups hash against the NEW count and still resolve
    val session = spark
    import session.implicits._
    val probe = Seq(5L, 123L, 321L, 449L, 9999L).toDF("event_id")
    assert(sortedIds(wide.lookupKeys(probe)) == Seq(5L, 123L, 321L, 449L))
  }

  test("writer lock: a live foreign lock blocks merge loudly; a dead one sweeps; release on commit") {
    val dir = Files.createTempDirectory("graft-claim").toString
    val sink = new ParquetTableSink(spark, dir, events.limit(0), Seq("event_id"))
    sink.merge(events.filter(col("event_id") < 100), 0L)
    val manifest = Paths.get(dir, "manifest")
    assert(!Files.exists(manifest.resolve(".writer-lock")),
      "a completed merge must release the writer lock")

    // a lock held by a LIVE foreign writer (this very process — the pid
    // is alive, the nonce is not ours): merge must stop loudly before
    // touching anything, and breakLock() is the operator's unlock
    Files.writeString(manifest.resolve(".writer-lock"),
      s"999,feedfeedfeed,${ProcessHandle.current().pid()}")
    val e = intercept[RuntimeException](
      sink.merge(events.filter(col("event_id") >= 100 && col("event_id") < 200), 1L))
    assert(e.getMessage.contains("locked by a live writer"))
    assert(sortedIds(sink.current) == sortedIds(events.filter(col("event_id") < 100)),
      "the blocked merge must leave the committed state untouched")

    // operator-verified unblock, then the same merge lands
    sink.breakLock()
    sink.merge(events.filter(col("event_id") >= 100 && col("event_id") < 200), 1L)
    assert(sortedIds(sink.current) == sortedIds(events.filter(col("event_id") < 200)))

    // a DEAD writer's lock (crashed process, SAME machine identity —
    // hostname + persisted per-machine uuid) is swept automatically: the
    // restarted process replays hands-off
    val host = java.net.InetAddress.getLocalHost.getHostName
    val machine = s"$host+${ParquetTableSink.machineUuid}"
    val gone = new ProcessBuilder("true").start()
    gone.waitFor()
    Files.writeString(manifest.resolve(".writer-lock"),
      s"2,deadbeefdead,${gone.pid()},$machine")
    sink.merge(events.filter(col("event_id") >= 200 && col("event_id") < 300), 2L)
    assert(sortedIds(sink.current) == sortedIds(events.filter(col("event_id") < 300)))
    assert(!Files.exists(manifest.resolve(".writer-lock")))

    // a BARE-hostname lock (pre-machine-uuid format, or a default-hostname
    // container clone on a shared volume) is unverifiable even with a dead
    // pid: fails loud, never swept — the documented one-time breakLock()
    // upgrade path
    Files.writeString(manifest.resolve(".writer-lock"),
      s"2,deadbeefdead,${gone.pid()},$host")
    val bare = intercept[RuntimeException](
      sink.merge(events.filter(col("event_id") >= 300 && col("event_id") < 350), 8L))
    assert(bare.getMessage.contains("locked by a live writer"))
    sink.breakLock()

    // the SAME dead pid stamped by ANOTHER host (NFS / shared volume) is
    // unverifiable — that pid may be a live writer in the foreign pid
    // namespace; sweeping it would re-open the lost-update race
    Files.writeString(manifest.resolve(".writer-lock"),
      s"2,deadbeefdead,${gone.pid()},other-host.example")
    val foreign = intercept[RuntimeException](
      sink.merge(events.filter(col("event_id") >= 300 && col("event_id") < 350), 9L))
    assert(foreign.getMessage.contains("locked by a live writer"))
    sink.breakLock()

    // a host-less (legacy / truncated) lock with a dead pid is equally
    // unverifiable: never stolen on pid evidence alone
    Files.writeString(manifest.resolve(".writer-lock"), s"2,deadbeefdead,${gone.pid()}")
    intercept[RuntimeException](
      sink.merge(events.filter(col("event_id") >= 300 && col("event_id") < 350), 9L))
    sink.breakLock()

    // a malformed / pid-less lock is unverifiable: treated as live (the
    // conservative direction — never steal what might be held)
    Files.writeString(manifest.resolve(".writer-lock"), "7")
    intercept[RuntimeException](
      sink.merge(events.filter(col("event_id") >= 300 && col("event_id") < 400), 3L))
    sink.breakLock()
  }

  test("vacuum contends for the writer lock: blocked by a live foreign writer, deletes nothing") {
    val table = Files.createTempDirectory("graft-vacuum-lock").toString
    val sink = new ParquetTableSink(spark, Paths.get(table).resolve("t").toString,
      events.limit(0), Seq("event_id"), retain = 4)
    (0 to 2).foreach(i => sink.merge(
      events.filter(col("event_id").between(100, 100 + i)), i.toLong))
    val manifest = Paths.get(table, "t", "manifest")
    val dataDirsBefore = Files.list(Paths.get(table).resolve("t/data")).count()

    // another process's in-flight merge may still be reading the dirs GC
    // would delete — a vacuum against its live lock must stop loudly
    // BEFORE touching any bytes
    Files.writeString(manifest.resolve(".writer-lock"),
      s"999,feedfeedfeed,${ProcessHandle.current().pid()}")
    val e = intercept[RuntimeException](sink.vacuum(keep = 1))
    assert(e.getMessage.contains("locked by a live writer"))
    assert(sink.versions == Seq(0L, 1L, 2L),
      "a blocked vacuum must leave every retained version intact")
    assert(Files.list(Paths.get(table).resolve("t/data")).count() == dataDirsBefore,
      "a blocked vacuum must not delete any data dir")

    // unblocked, the same vacuum lands AND releases the lock so the next
    // merge proceeds hands-off
    sink.breakLock()
    sink.vacuum(keep = 1)
    assert(sink.versions == Seq(2L))
    assert(!Files.exists(manifest.resolve(".writer-lock")),
      "a completed vacuum must release the writer lock")
    sink.merge(events.filter(col("event_id") === 103), 3L)
    assert(sortedIds(sink.current) ==
      sortedIds(events.filter(col("event_id").between(100, 103))))
  }

  test("duplicate concurrent writers race the same batches: exactly-once, nothing lost") {
    // the accidental double-deployment scenario the claim guard exists
    // for: two writer instances drive the SAME logical batch sequence
    // concurrently; each version must be won by exactly one of them, the
    // loser must stop loudly (and find the batch committed on retry), and
    // the final table must hold every batch exactly once
    val dir = Files.createTempDirectory("graft-claim-race").toString
    val batches = (0 until 6).map(b =>
      (b.toLong, events.filter(col("event_id") >= b * 50 && col("event_id") < (b + 1) * 50)))
    def writer(): Unit = {
      val sink = new ParquetTableSink(spark, dir, events.limit(0), Seq("event_id"))
      batches.foreach { case (id, df) =>
        var done = false
        while (!done) {
          try { sink.merge(df, id); done = true }
          catch {
            case e: RuntimeException
                if Option(e.getMessage).exists(m =>
                  m.contains("locked by a live writer") || m.contains("lock was taken")) =>
              Thread.sleep(5) // loser: back off, re-attempt (replay guard skips if won)
          }
        }
      }
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq.fill(2)(new Thread(() =>
      try writer() catch { case t: Throwable => errs.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join(300000))
    assert(errs.isEmpty, s"unexpected writer failure: ${errs.asScala.headOption}")
    val fin = new ParquetTableSink(spark, dir, events.limit(0), Seq("event_id"))
    assert(sortedIds(fin.current) == sortedIds(events.filter(col("event_id") < 300)),
      "the racing writers must land every batch exactly once")
    assert(fin.lastCommittedBatchId == 5L)
  }
}
