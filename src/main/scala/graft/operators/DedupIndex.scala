package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.streaming.ParquetTableSink

/** Incremental near-duplicate ADMISSION — the streaming form of the LSH
  * dedup family: a persistent LSH index lives in a bucket-pruned versioned
  * table, and each arriving micro-batch of documents is checked against it
  * (and against itself), admitted or rejected, then folded into the index.
  * This is how a training-data pipeline dedups a corpus that arrives over
  * weeks instead of sitting in one scan.
  *
  * Index layout: one row per LSH bucket — key (band, sig), value = the
  * bucket's member list [(doc_id, shingle set)]. Storing the verify payload
  * beside the signature keeps admission a single lookup (at 100 TB one would
  * store doc pointers + sketches and verify against the doc store; the
  * bucket-list layout and the plan shapes are the same). The sink combiner
  * UNIONs member lists (dedup by member), so replayed batches are idempotent
  * on top of the batch-id guard.
  *
  * Admission rule (graded): a document is REJECTED iff some verified
  * near-dup partner (band collision + exact Jaccard ≥ τ) with a SMALLER
  * doc_id exists among already-indexed docs or its own batch. When batches
  * arrive in nondecreasing doc_id order this equals the global batch rule
  * ("drop every doc with a smaller near-dup partner" — dedup_drop_list);
  * under arbitrary arrival it degrades gracefully to "…that was seen no
  * later than me". ALL banded rows are indexed, admitted or not — a
  * rejected doc must still reject its own later near-dups, and this is
  * what keeps the rule batch-split-invariant.
  *
  * The MAX_BUCKET boilerplate guard applies to the bucket's CUMULATIVE
  * population at check time (index members + this batch) — the incremental
  * counterpart of the batch pipeline's guard, mirrored batch-aware in the
  * oracle so the cap is graded semantics, not silent truncation.
  *
  * Scale design: the index read is `lookupKeys` on the batch's distinct
  * (band, sig) set — bucket-pruned to O(|batch signatures| / B of the
  * table), never a full index scan. Candidate generation is equi-joins on
  * (band, sig) (batch × index-members, batch × batch); the population cap
  * rides the same keys. Nothing corpus-proportional is broadcast or
  * collected; the index update is one bucket-pruned merge of
  * O(|batch| × bands) grouped rows.
  */
final class LshAdmissionIndex(spark: SparkSession, dir: String,
                              threshold: Double, buckets: Int = 16) {

  // all-nullable inner types (the parquet convention): every frame entering
  // the sink casts `members` to this exact type, because the sink's additive
  // schema check compares nested dataTypes INCLUDING inner nullability
  private val memberType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("hs", ArrayType(LongType, containsNull = true), nullable = true))),
    containsNull = true)
  private val indexSchema = StructType(Seq(
    StructField("band", IntegerType, nullable = true),
    StructField("sig", StringType, nullable = true),
    StructField("members", memberType, nullable = true)))

  /** Stored-members bound: candidate generation drops any bucket whose
    * cumulative population exceeds MAX_BUCKET, and members are never
    * removed — so once a bucket holds MAX_BUCKET+1 members it is dead to
    * admission FOREVER, and storing more changes nothing. Truncating the
    * stored list at MAX_BUCKET+1 therefore preserves the graded semantics
    * bit-exactly (below the cap the list is complete; above it the count
    * stays ≥ cap+1, so the drop decision is identical) while bounding the
    * row to O(cap × shingles) — without this, one boilerplate signature
    * shared by millions of documents would accumulate a multi-GB row. */
  private val StoredCap = DedupText.MAX_BUCKET + 1

  /** Bucket-list union: members accumulate across batches, dedup'd so a
    * replayed batch cannot double-insert a member, truncated at the dead-
    * bucket bound. Associative + idempotent (see StoredCap: truncation only
    * ever bites buckets already past the cap, where member identity is
    * irrelevant to admission). */
  private val unionMembers: ParquetTableSink.Combiner = (target, staged) =>
    target.select(col("band"), col("sig"), col("members"))
      .unionByName(staged.select(col("band"), col("sig"), col("members")))
      .groupBy(col("band"), col("sig"))
      .agg(slice(array_distinct(flatten(collect_list(col("members")))), 1, StoredCap)
        .cast(memberType).as("members"))

  private val sink = new ParquetTableSink(spark, dir,
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), indexSchema),
    keys = Seq("band", "sig"), buckets = buckets, combine = unionMembers)

  // ---- signature-scheme guard ------------------------------------------
  // The stored (band, sig) keys are only meaningful under the EXACT LSH
  // geometry that wrote them: a signature computed under a different
  // scheme (different rotations, seeds, K, shingling) never collides with
  // the stored ones, so admission against a stale index silently degrades
  // to batch-local dedup — no error, just admitted duplicates. Stamp the
  // scheme beside the table on first use and fail loud on mismatch (or on
  // a pre-stamp legacy index), forcing an explicit rebuild.
  {
    val schemeFile = java.nio.file.Paths.get(dir).resolve("_scheme")
    val current = DedupText.LSH_SCHEME
    if (java.nio.file.Files.exists(schemeFile)) {
      val stored = java.nio.file.Files.readString(schemeFile).trim
      require(stored == current,
        s"LSH admission index at $dir was written under signature scheme\n  $stored\n" +
          s"but this engine computes\n  $current\n" +
          "Stale signatures never collide with new ones, so admission would " +
          "silently stop rejecting near-duplicates against the indexed corpus. " +
          "Rebuild the index: delete the directory and re-admit.")
    } else if (sink.lastCommittedBatchId >= 0L) {
      throw new IllegalStateException(
        s"LSH admission index at $dir has committed batches but no _scheme " +
          "stamp — it predates scheme versioning and its signatures cannot be " +
          "trusted against this engine's geometry. Rebuild the index.")
    } else {
      val tmp = java.nio.file.Paths.get(dir).resolve("._scheme.tmp")
      java.nio.file.Files.writeString(tmp, current)
      java.nio.file.Files.move(tmp, schemeFile,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def lastCommittedBatchId: Long = sink.lastCommittedBatchId

  /** Check `docs` (doc_id, text) against the index and itself, fold the
    * batch into the index under `batchId`, and return the ADMITTED rows of
    * `docs`. The index merge happens eagerly (it is the durable state
    * transition); the returned frame is lazy — consume it within the sink's
    * retention window (or materialize it) like any versioned-table reader.
    */
  def admit(docs: DataFrame, batchId: Long): DataFrame = admitCore(docs, batchId)._1

  /** `admit` with the cache release handled INTERNALLY: the admitted frame
    * materializes (localCheckpoint — lineage to the per-batch cached LSH
    * frame is severed) and the cache entry is dropped before returning, so
    * a batch caller cannot leak one entry per call by ignoring the lazy
    * contract. Costs one extra materialization of the admitted rows; use
    * plain `admit` when a downstream merge will consume the frame promptly
    * (the `startAdmission` pattern). */
  def admitEager(docs: DataFrame, batchId: Long): DataFrame = {
    val (admitted, cached) = admitCore(docs, batchId)
    try admitted.localCheckpoint() finally cached.unpersist(blocking = true)
  }

  /** The admission computation plus the cached per-batch LSH frame backing
    * the returned (lazy) admitted result. The caller that consumes the
    * admitted frame OWNS the release: `startAdmission` unpersists right
    * after the admitted merge materializes it; the batch `admit` entry
    * point leaves release to session owners (Verify/Bench/tests) via
    * `cacheManager.clearCache()`, because its result is handed back lazy.
    * Without the hand-off a long-lived admission stream would pin one cache
    * entry per micro-batch until executor storage is exhausted.
    */
  private def admitCore(docs: DataFrame, batchId: Long): (DataFrame, DataFrame) = {
    // spread the scan across cores BEFORE the md5/MinHash chain (a small
    // batch arrives as one split — the docsSpread lesson), and cache: this
    // one frame feeds the signature collect, the population count, both
    // candidate join sides, the verify set, the index merge, and the
    // admitted result — recomputing the hash chain per consumer multiplied
    // the whole query ~8x (measured 87 s → 9 s at sf0.1).
    val rows = DedupText.lshRows(docs.repartition(col("doc_id"))).cache() // doc_id, hs, band, sig
    val sigs = rows.select(col("band"), col("sig")).distinct()
    val idxRows = sink.lookupKeys(sigs)
      .select(col("band"), col("sig"), explode(col("members")).as("m"))
      .select(col("band"), col("sig"),
        col("m.doc_id").as("pid"), col("m.hs").as("phs"))

    // cumulative bucket population at check time = index ∪ this batch
    val pop = rows.select(col("band"), col("sig"), col("doc_id"))
      .unionByName(idxRows.select(col("band"), col("sig"), col("pid").as("doc_id")))
      .distinct()
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= DedupText.MAX_BUCKET)
      .select(col("band"), col("sig"))

    val okRows = rows.join(pop, Seq("band", "sig"))
    val okIdx = idxRows.join(pop, Seq("band", "sig"))

    // candidates: batch × indexed (smaller prior id rejects) and batch ×
    // batch. Pairs dedup by IDS ONLY — an id pair is a few bytes where a
    // shingle-set pair is kilobytes, and grouping on array columns falls out
    // of hash aggregation; the sets join back exactly once per side after
    // the distinct (measured: the array-carrying distinct was 40× slower).
    val candIds = okRows.join(okIdx, Seq("band", "sig"))
      .filter(col("pid") < col("doc_id"))
      .select(col("doc_id"), col("pid"))
      .unionByName(okRows.as("a").join(okRows.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("doc_id"), col("a.doc_id").as("pid")))
      .distinct()
    // one hashed shingle set per doc id, batch ∪ index (batch wins on
    // replay — identical content either way)
    val sets = rows.select(col("doc_id"), col("hs")).dropDuplicates("doc_id")
      .unionByName(idxRows.select(col("pid").as("doc_id"), col("phs").as("hs")))
      .dropDuplicates("doc_id")
    val rejected = candIds
      .join(sets, Seq("doc_id"))
      .join(sets.select(col("doc_id").as("pid"), col("hs").as("phs")), Seq("pid"))
      .filter(DedupText.jaccard(col("hs"), col("phs")) >= threshold)
      .select(col("doc_id")).distinct()

    // index the WHOLE batch (see admission rule), then hand back the admitted
    sink.merge(
      rows.groupBy(col("band"), col("sig"))
        .agg(slice(array_distinct(collect_list(struct(col("doc_id"), col("hs")))), 1, StoredCap)
          .cast(memberType).as("members")),
      batchId)
    (docs.join(rejected, Seq("doc_id"), "left_anti"), rows)
  }

  /** Drive admission from a STREAM of documents: each micro-batch admits
    * against the index and the admitted rows merge into `admittedTable`
    * under the same batch id — so index update and admitted output are each
    * exactly-once (both tables carry the batch-id guard; a replayed batch
    * no-ops on both). A restarted process resumes from the two tables plus
    * the checkpoint alone — the same durability contract as the other
    * versioned-table pipelines (DedupIndexSpec drives it across restarts
    * with fresh objects).
    */
  def startAdmission(docs: DataFrame, admittedTable: ParquetTableSink,
                     checkpoint: String,
                     trigger: org.apache.spark.sql.streaming.Trigger)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val (admitted, cached) = admitCore(batch.toDF(), id)
        // the admitted merge is the eager consumer of this batch's cached
        // LSH frame — release it immediately after (leak finding, r9): a
        // stream that never unpersists pins one entry per micro-batch
        try admittedTable.merge(admitted, id)
        finally cached.unpersist()
      }
      .start()
}

/** Graded binding: two id-ordered batches of `documents` stream through a
  * fresh admission index; the output is every admitted (doc_id, batch). The
  * oracle replays the same rule globally — banding, the batch-aware
  * cumulative bucket cap, exact-Jaccard verify, smaller-id rejection — so
  * any divergence between the incremental path (bucket-pruned lookups,
  * combiner unions, replay guard) and the declarative semantics breaks the
  * hash.
  */
object DedupIndex {

  private val SPLIT = 250L  // batch boundary: ids < SPLIT arrive first
  private val TAU = 0.5

  private val dedupAdmit: Q = (s, dir) => {
    // cloned-session scoping (the stream_sink_table convention): admission
    // batches are poll-sized, and the pipeline runs ~10 exchanges per admit
    // (candidate joins, population cap, two sink-merge shuffles) — 8
    // partitions quarters the per-exchange task overhead without touching
    // any concurrent query on the outer session
    val local = s.newSession()
    local.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = Tables(local, dir, "documents").select(col("doc_id"), col("text"))
    val work = graft.Scratch.dir("graft-lsh-admit")
    val index = new LshAdmissionIndex(local, work.resolve("index").toString, TAU)
    val a0 = index.admit(docs.filter(col("doc_id") < SPLIT), 0L)
      .withColumn("batch", lit(0L))
    val a1 = index.admit(docs.filter(col("doc_id") >= SPLIT), 1L)
      .withColumn("batch", lit(1L))
    a0.unionByName(a1).select(col("doc_id"), col("batch"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "dedup_admit_incremental" -> dedupAdmit
  )

  // custom bands CTE: no global cap — the cap is applied per-pair below with
  // the population the incremental check actually saw (batch-aware)
  private val bands0Sql: String = {
    val r = DedupText.K / DedupText.BANDS
    (0 until DedupText.BANDS).map { g =>
      val sig = (0 until r).map(k => s"mh_${r * g + k}").mkString("||','||")
      s"SELECT doc_id, $g AS band, md5($sig) AS sig FROM mh WHERE len(s) > 0"
    }.mkString("b0 AS (\n  ", " UNION ALL\n  ", ")")
  }

  val oracle: Map[String, String] = Map(
    "dedup_admit_incremental" ->
      s"""WITH ${DedupText.shSql},
         |${DedupText.mhSql},
         |$bands0Sql,
         |bb AS (
         |  SELECT doc_id, band, sig,
         |    CASE WHEN doc_id < $SPLIT THEN 0 ELSE 1 END AS batch,
         |    count(*) FILTER (WHERE doc_id < $SPLIT) OVER (PARTITION BY band, sig) AS bsz1,
         |    count(*) OVER (PARTITION BY band, sig) AS bszall
         |  FROM b0),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bb a JOIN bb b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |  WHERE CASE WHEN a.batch = 0 AND b.batch = 0 THEN a.bsz1 ELSE a.bszall END
         |          <= ${DedupText.MAX_BUCKET}),
         |rej AS (
         |  -- verify over the 60-bit HASHED sets, exactly what the incremental
         |  -- index stores and checks (hsd is mhSql's hashed-shingle CTE)
         |  SELECT DISTINCT c.doc_b AS doc_id
         |  FROM cand c JOIN hsd x ON c.doc_a = x.doc_id JOIN hsd y ON c.doc_b = y.doc_id
         |  WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
         |          / len(list_distinct(list_concat(x.hs, y.hs))) >= $TAU)
         |SELECT d.doc_id, CAST(CASE WHEN d.doc_id < $SPLIT THEN 0 ELSE 1 END AS BIGINT) AS batch
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM rej)
         |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin
  )
}
