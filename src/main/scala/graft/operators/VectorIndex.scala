package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Q
import graft.streaming.ParquetTableSink

/** Persisted ANN index: train ONCE, search MANY, admit vectors
  * INCREMENTALLY, and retrain WITHOUT a stop-the-world re-encode — the
  * production lifecycle the in-session `sim_*` queries deliberately don't
  * model (each of those retrains its Lloyd/PQ codebooks per invocation so
  * the DuckDB oracle can replay the whole chain; at 100 TB the codebooks
  * are a build artifact, not a per-query cost).
  *
  * Three versioned tables (ParquetTableSink — the same durable boundary the
  * LSH admission index rides), all EPOCH-VERSIONED so codebook generations
  * coexist:
  *
  *   - `cents`   epoch, cent_id, c_emb, c_norm — the IVF coarse codebooks
  *               (≤ 32 rows per epoch; trained by `Similarity.trainedCodebookOf`);
  *   - `pcents`  epoch, m, cent_id, c_emb — the PQ per-subspace codebooks
  *               (≤ M·K rows per epoch);
  *   - `codes`   vec_id, norm, epoch, cell, codes[M] — one compact row per
  *               indexed vector: the EPOCH it was quantized under, its IVF
  *               cell in that epoch, and its M PQ code ids. THIS is the
  *               100 TB-proportional table, routed `vec_id mod B` (mod, not
  *               hash: the bucket membership is then a plain SQL predicate,
  *               so migration progress and the graded oracle can name a
  *               bucket's rows declaratively), with an `epoch` zonemap so
  *               "is this epoch fully migrated?" is driver-side metadata.
  *
  * Lifecycle contracts:
  *
  *   - `train` freezes a NEW codebook epoch (`currentEpoch + 1`) from
  *     whatever training slice has arrived. Prior epochs' codebooks stay:
  *     codes quantized under them remain searchable — a retrain is a
  *     metadata operation, NOT an O(corpus) re-encode outage;
  *   - `encode` quantizes ONLY the passed batch against the LATEST epoch
  *     (cost O(|batch| · M · K), independent of the already-indexed corpus)
  *     and upserts by vec_id under the exactly-once batchId guard;
  *   - `search` scores each stored vector against its OWN epoch's
  *     codebooks: probe cells and ADC LUTs are built per live epoch (the
  *     codebook union is still ≤ epochs · M · K broadcast rows), candidates
  *     join on (epoch, cell), and one global top-k ranks the union — a
  *     half-migrated index serves exact cross-epoch results;
  *   - `migrateBucket` re-encodes ONE bucket's stale rows under the latest
  *     epoch (and retires rows whose vec_id has left the source corpus), so
  *     migration is incremental, bucket-at-a-time, exactly-once per batch —
  *     the index never stops serving;
  *   - `retireEpoch` drops an old epoch's codebooks once no codes row
  *     references it — proven first from the epoch ZONEMAP (O(B) driver
  *     strings), then exactly on the ≤ few candidate buckets.
  *
  * Cross-engine determinism is inherited: codebooks and norms round-trip
  * parquet as exact doubles, ADC pivots the M subspace terms into fixed
  * columns summed in syntactic order, and each vector is scored under
  * exactly one epoch — so `search` over a half-migrated index hash-matches
  * the declarative two-epoch union oracle (`VectorIndexOps.twoEpochSql`).
  */
final class VectorIndex(spark: SparkSession, dir: String) {

  import VectorIndex.CODES_BUCKETS

  private val centsSchema = StructType(Seq(
    StructField("epoch", LongType, nullable = true),
    StructField("cent_id", LongType, nullable = true),
    StructField("c_emb", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("c_norm", DoubleType, nullable = true)))
  private val pcentsSchema = StructType(Seq(
    StructField("epoch", LongType, nullable = true),
    StructField("m", IntegerType, nullable = true),
    StructField("cent_id", LongType, nullable = true),
    StructField("c_emb", ArrayType(DoubleType, containsNull = true), nullable = true)))
  private val codesSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = true),
    StructField("norm", DoubleType, nullable = true),
    StructField("epoch", LongType, nullable = true),
    StructField("cell", LongType, nullable = true),
    StructField("codes", ArrayType(LongType, containsNull = true), nullable = true)))

  private def emptyOf(schema: StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  private def conform(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)

  // codebook tables are one bucket each: they are constant-size artifacts
  // (≤ 32 and ≤ M·K rows PER EPOCH, live epochs bounded by the migration
  // cadence) read whole and broadcast — bucketing them would only multiply
  // tiny files. The codes table scales with the corpus.
  //
  // Codebook merges REPLACE WITHIN THEIR EPOCH: re-shipping an epoch's
  // codebook replaces exactly that epoch's rows (cells that died in the
  // new training must not linger), while other epochs carry over — the
  // per-epoch generalization of whole-table replacement, still
  // batch-associative because a training batch always carries one whole
  // epoch.
  private val replaceEpochs: ParquetTableSink.Combiner = (target, staged) => {
    val cols = target.columns.toSeq.map(col)
    target.join(staged.select(col("epoch")).distinct(), Seq("epoch"), "left_anti")
      .select(cols: _*)
      .unionByName(staged.select(cols: _*))
  }
  private val centsSink = new ParquetTableSink(spark, s"$dir/cents",
    emptyOf(centsSchema), keys = Seq("epoch", "cent_id"), buckets = 1,
    combine = replaceEpochs)
  private val pcentsSink = new ParquetTableSink(spark, s"$dir/pcents",
    emptyOf(pcentsSchema), keys = Seq("epoch", "m", "cent_id"), buckets = 1,
    combine = replaceEpochs)
  private val codesSink = new ParquetTableSink(spark, s"$dir/codes",
    emptyOf(codesSchema), keys = Seq("vec_id"), buckets = CODES_BUCKETS,
    route = col("vec_id"), zonemapCols = Seq("epoch"))

  def lastEncodedBatchId: Long = codesSink.lastCommittedBatchId

  /** Latest FULLY-committed codebook epoch, −1 before the first train.
    *
    * `train` lands the coarse and PQ codebooks as two sink transactions; a
    * crash between them leaves the coarse epoch N+1 on disk without its PQ
    * half. Deriving the epoch from the MIN of the two sinks' max epochs
    * makes that window invisible: encode/search keep serving epoch N until
    * BOTH halves of N+1 exist, and the replayed train converges (the cents
    * merge no-ops under its batchId, the pcents merge completes the pair).
    *
    * Consulted on every encode/migrate, but the answer only changes when a
    * codebook table commits — so the memo is keyed on both sinks' pointers
    * (driver-side file reads, no Spark job). A train from ANOTHER
    * VectorIndex instance on the same dir moves a pointer and invalidates
    * correctly. The uncached reads are the ≤ 32·epochs-row and ≤ M·K·epochs-
    * row codebook tables — metadata-class work, paid once per commit. */
  @volatile private var epochMemo: ((Long, Long), Long) = ((Long.MinValue, Long.MinValue), -1L)
  def currentEpoch: Long = {
    val ptr = (centsSink.lastCommittedBatchId, pcentsSink.lastCommittedBatchId)
    val memo = epochMemo
    if (memo._1 == ptr) memo._2
    else {
      def maxEpoch(df: DataFrame): Long = {
        val m = df.agg(max(col("epoch"))).head().get(0)
        if (m == null) -1L else m.asInstanceOf[Long]
      }
      val e = math.min(maxEpoch(centsSink.current), maxEpoch(pcentsSink.current))
      epochMemo = (ptr, e)
      e
    }
  }

  private def requireTrained(op: String): Unit =
    require(centsSink.lastCommittedBatchId >= 0 &&
      pcentsSink.lastCommittedBatchId >= 0,
      s"VectorIndex($dir): $op before train — no committed codebooks")

  /** Codebooks of one epoch, epoch column dropped (the trainers' shape). */
  private def codebooksAt(epoch: Long): (DataFrame, DataFrame) = (
    centsSink.current.filter(col("epoch") === epoch).drop("epoch"),
    pcentsSink.current.filter(col("epoch") === epoch).drop("epoch"))

  /** Train both codebooks on `corpus` (vec_id, embedding, norm — any slice
    * of the table that has arrived) and persist them as a NEW epoch
    * (`currentEpoch + 1`; the first train mints epoch 0). One-time cost;
    * the chains are the graded Lloyd/PQ trainers, unchanged. Codes encoded
    * under prior epochs stay valid and searchable — migrate them
    * bucket-at-a-time with `migrateBucket`, then `retireEpoch` the old
    * codebooks; a retrain never stops the index from serving. */
  def train(corpus: DataFrame, batchId: Long = 0L): Unit = {
    val epoch = currentEpoch + 1
    centsSink.merge(
      conform(Similarity.trainedCodebookOf(corpus).withColumn("epoch", lit(epoch)),
        centsSchema), batchId)
    // a crash HERE leaves the coarse epoch without its PQ half; currentEpoch
    // (min over both sinks) keeps serving the prior epoch and the replayed
    // train converges — the cents merge no-ops, this merge completes the pair
    if (killBeforePcentsMerge)
      sys.error(s"VectorIndex($dir): injected crash between codebook merges")
    pcentsSink.merge(
      conform(Similarity.pqCodebooksOf(Similarity.pqSubOf(corpus))
        .withColumn("epoch", lit(epoch)), pcentsSchema), batchId)
  }

  /** Test-only kill point for the window between the two codebook merges. */
  private[operators] var killBeforePcentsMerge: Boolean = false

  /** The codes rows of `vectors` quantized under `epoch`'s codebooks. Both
    * quantizers collapse their scored rows map-side (assignTo / pqAssign
    * partial aggregates), and the cell/codes join is two frames derived
    * from the same batch co-keyed on vec_id. */
  private def encodedFrame(vectors: DataFrame, epoch: Long): DataFrame = {
    val (cents, pcents) = codebooksAt(epoch)
    val cells = Similarity.assignTo(vectors, cents)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val mcodes = Similarity.pqAssign(Similarity.pqSubOf(vectors), pcents)
      .groupBy(col("vec_id"))
      .agg(first(col("norm")).as("norm"),
        transform(array_sort(collect_list(struct(col("m"), col("code")))),
          x => x.getField("code")).as("codes"))
    conform(mcodes.join(cells, "vec_id").withColumn("epoch", lit(epoch)), codesSchema)
  }

  /** Quantize ONLY `vectors` (vec_id, embedding, norm) against the LATEST
    * epoch's frozen codebooks and upsert their rows: per-batch cost is
    * O(|batch| · M · K) regardless of index size, and the batchId guard
    * makes replay a no-op. */
  def encode(vectors: DataFrame, batchId: Long): Unit = {
    // fail loud like search: encoding against an absent codebook would
    // produce ZERO rows yet still consume the batchId, so the corrected
    // retry after a train would be rejected by the replay guard
    requireTrained("encode")
    if (batchId <= codesSink.lastCommittedBatchId) return
    codesSink.merge(encodedFrame(vectors, currentEpoch), batchId)
  }

  /** Migrate ONE bucket of the codes table to the latest epoch: its stale
    * rows (epoch < latest) re-encode from `corpus` (the source-of-truth
    * vector table — codes are lossy, so migration needs the originals);
    * stale rows whose vec_id has LEFT the corpus retire instead of lingering
    * at a dead epoch forever (they no longer exist upstream, and one such
    * straggler would block `retireEpoch`). One merge, exactly-once under
    * `batchId`; per-bucket cost is O(bucket + corpus-slice), and the mod
    * routing lets the corpus slice push down as a plain `vec_id % B = b`
    * scan filter. The index serves searches throughout — rows not yet
    * migrated score under their own epoch. */
  def migrateBucket(corpus: DataFrame, bucket: Int, batchId: Long): Unit =
    migrateBuckets(corpus, Seq(bucket), batchId)

  /** Migrate a WAVE of buckets in one commit — the production migration
    * driver's unit (per-bucket commits pay a merge transaction each; a
    * wave amortizes it while staying incremental: the index serves
    * searches between waves exactly as between single buckets). Same
    * exactly-once batch guard; same per-row work. */
  def migrateBuckets(corpus: DataFrame, buckets: Seq[Int], batchId: Long): Unit = {
    requireTrained("migrate")
    require(buckets.nonEmpty, "migrateBuckets: at least one bucket")
    buckets.foreach(b => require(b >= 0 && b < CODES_BUCKETS,
      s"bucket must be in [0, $CODES_BUCKETS), got $b"))
    if (batchId <= codesSink.lastCommittedBatchId) return
    val latest = currentEpoch
    val stale = codesSink.bucketRows(buckets)
      .filter(col("epoch") < latest).select(col("vec_id"))
    val slice = corpus.filter(
      pmod(col("vec_id"), lit(CODES_BUCKETS)).isin(buckets.map(b => b: Any): _*))
    val present = slice.join(stale, Seq("vec_id"), "left_semi")
    val gone = stale.join(slice.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .withColumn("norm", lit(null).cast(DoubleType))
      .withColumn("epoch", lit(null).cast(LongType))
      .withColumn("cell", lit(null).cast(LongType))
      .withColumn("codes", lit(null).cast(ArrayType(LongType, containsNull = true)))
      .withColumn(ParquetTableSink.DeleteCol, lit(true))
    codesSink.merge(
      encodedFrame(present, latest)
        .withColumn(ParquetTableSink.DeleteCol, lit(false))
        .unionByName(gone.select(
          (codesSchema.fieldNames.toSeq :+ ParquetTableSink.DeleteCol).map(col): _*)),
      batchId)
  }

  /** Drop a fully-migrated epoch's codebooks. Liveness is proven cheap-to-
    * exact: the codes table's epoch ZONEMAP names the only buckets whose
    * committed [min, max] epoch span admits `epoch` (O(B) driver-side
    * strings, no Spark job), and only those buckets are scanned for an
    * actual surviving row. Fails loud while any remains — retiring the
    * codebooks under a live code row would strand it unsearchable. */
  def retireEpoch(epoch: Long, batchId: Long): Unit = {
    val latest = currentEpoch
    require(epoch >= 0 && epoch < latest,
      s"VectorIndex($dir): can only retire a past epoch (got $epoch, current $latest)")
    val candidates = codesSink.rangePrunedBuckets("epoch", epoch, epoch + 1)
    val live = candidates.nonEmpty &&
      !codesSink.bucketRows(candidates).filter(col("epoch") === epoch).isEmpty
    require(!live,
      s"VectorIndex($dir): epoch $epoch still has encoded vectors — migrate every bucket first")
    centsSink.merge(
      centsSink.current.filter(col("epoch") === epoch)
        .withColumn(ParquetTableSink.DeleteCol, lit(true)), batchId)
    pcentsSink.merge(
      pcentsSink.current.filter(col("epoch") === epoch)
        .withColumn(ParquetTableSink.DeleteCol, lit(true)), batchId)
  }

  /** Retire vectors from the index (deletion/right-to-be-forgotten): their
    * codes rows tombstone out of the versioned table, so they can never
    * appear as candidates again — no codebook retrain (the codebooks carry
    * no per-vector state), no rewrite beyond the touched buckets. Rides
    * the same batchId guard as `encode`; `vecIds` carries a `vec_id`
    * column. The bytes of PRIOR versions persist until the retention
    * horizon — `vacuum` compacts them away. */
  def remove(vecIds: DataFrame, batchId: Long): Unit = {
    if (batchId <= codesSink.lastCommittedBatchId) return
    codesSink.merge(
      vecIds.select(col("vec_id").cast("long").as("vec_id"))
        .withColumn("norm", lit(null).cast("double"))
        .withColumn("epoch", lit(null).cast("long"))
        .withColumn("cell", lit(null).cast("long"))
        .withColumn("codes", lit(null).cast(ArrayType(LongType, containsNull = true)))
        .withColumn(ParquetTableSink.DeleteCol, lit(true)),
      batchId)
  }

  /** Physically drop data of versions older than the last `keep` across all
    * three tables. A `remove`/`migrateBucket` rewrites its buckets WITHOUT
    * the retired rows, but the pre-rewrite files stay readable (time
    * travel) until GC — this is the retention hatch that makes retirement a
    * BYTE deletion, not just a visibility one (right-to-be-forgotten needs
    * the bytes gone). `keep = 1` keeps only the current version. */
  def vacuum(keep: Int): Unit = {
    centsSink.vacuum(keep)
    pcentsSink.vacuum(keep)
    codesSink.vacuum(keep)
  }

  /** IVFPQ/ADC top-k over the PERSISTED artifact. `probes` carries
    * (probe_id, p_emb, p_norm); cost per probe ≈ NPROBE/cells of the codes
    * table per live epoch, scored at M lookup-adds per candidate.
    *
    * The per-probe ADC lookup table broadcasts |probes| · epochs · M · K
    * rows — bounded by the PROBE SET, not the corpus, but unbounded if a
    * caller hands an arbitrarily large probe table. Probe sets beyond
    * `waveCap` therefore split into hash-waves scored independently (each
    * wave re-scans the pruned candidate buckets — the standard batched-ANN
    * trade: bounded memory per wave for repeated scans), so the broadcast
    * stays ≈ waveCap/2 · epochs · M · K rows per wave no matter how many
    * probes arrive. Results are per-probe, so the wave union is exact. */
  def search(probes: DataFrame, k: Int,
             waveCap: Int = VectorIndex.SEARCH_WAVE): DataFrame = {
    // fail loud, not empty: an untrained index has no codebooks, and a
    // silently-empty top-k reads as "no neighbors" downstream
    requireTrained("search")
    require(waveCap >= 1, s"waveCap must be >= 1, got $waveCap")
    val n = probes.count()
    val waved =
      if (n <= waveCap) searchWave(probes, k)
      else {
        // expected wave size ≈ waveCap/2 (xxhash64 spreads ids uniformly);
        // each wave is its own broadcast subtree in the unioned plan
        val waves = ((2 * n + waveCap - 1) / waveCap).toInt
        (0 until waves).map(w => searchWave(
            probes.filter(pmod(xxhash64(col("probe_id")), lit(waves)) === w), k))
          .reduce(_ unionByName _)
      }
    waved.orderBy(col("probe_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  private def searchWave(probes: DataFrame, k: Int): DataFrame = {
    import Similarity.{NPROBE, PQ_M, PQ_SUBDIM}
    val cents = centsSink.current   // epoch, cent_id, c_emb, c_norm — all live epochs
    val pcents = pcentsSink.current // epoch, m, cent_id, c_emb
    // probes rank cells WITHIN each epoch: a stored vector is only
    // comparable to a cell of the epoch that quantized it
    val wCell = Window.partitionBy("probe_id", "p_epoch")
      .orderBy(col("pc_cos").desc, col("cent_id").asc)
    val probeCells = probes.crossJoin(broadcast(cents.withColumnRenamed("epoch", "p_epoch")))
      .withColumn("pc_cos",
        graft.functions.VectorExpressions.dot(col("p_emb"), col("c_emb"))
          / (col("p_norm") * col("c_norm")))
      .withColumn("cell_rank", row_number().over(wCell)).filter(col("cell_rank") <= NPROBE)
      .select(col("probe_id"), col("p_epoch"), col("cent_id").as("p_cent"))
    // the per-(probe, epoch) ADC lookup table: slice each probe into its M
    // subspaces and dot against every stored subspace centroid of every
    // live epoch — ≤ |probes| · epochs · M · K rows
    val lut = probes
      .select(col("probe_id").as("lprobe"), col("p_norm"),
        explode(sequence(lit(0), lit(PQ_M - 1))).as("lm"), col("p_emb"))
      .select(col("lprobe"), col("p_norm"), col("lm"),
        slice(col("p_emb"), col("lm") * lit(PQ_SUBDIM) + lit(1), lit(PQ_SUBDIM)).as("p_x"))
      .join(broadcast(pcents.withColumnRenamed("epoch", "l_epoch")), col("lm") === col("m"))
      .select(col("lprobe"), col("l_epoch"), col("p_norm"), col("lm"),
        col("cent_id").as("lcent"),
        graft.functions.VectorExpressions.dot(col("p_x"), col("c_emb")).as("lv"))
    val cand = codesSink.current
      .select(col("vec_id"), col("norm"), col("epoch"), col("cell"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(probeCells),
        col("cell") === col("p_cent") && col("epoch") === col("p_epoch") &&
          col("vec_id") =!= col("probe_id"))
    val perM = (0 until PQ_M).map(i =>
      sum(when(col("m") === i, col("lv"))).as(s"a_$i"))
    val scored = cand.join(broadcast(lut),
        col("m") === col("lm") && col("code") === col("lcent") &&
          col("probe_id") === col("lprobe") && col("epoch") === col("l_epoch"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(first(col("norm")).as("norm"),
        first(col("p_norm")).as("p_norm") +: perM: _*)
    val adc = (0 until PQ_M).map(i => col(s"a_$i")).reduceLeft(_ + _)
    val w = Window.partitionBy("probe_id").orderBy(col("adc_sim").desc, col("vec_id").asc)
    scored.withColumn("adc_sim", adc / (col("norm") * col("p_norm")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("adc_sim"), 6).as("adc_sim"))
  }

  /** Drive encoding from a STREAM of vectors: each micro-batch quantizes
    * against the frozen codebooks and upserts under its batch id — the
    * exactly-once admission pattern of `LshAdmissionIndex.startAdmission`,
    * minus the reject path (an index admits everything; dedup gates live
    * upstream). A restarted process resumes from the codes table plus the
    * checkpoint alone. */
  def startIndexing(vectors: DataFrame, checkpoint: String,
                    trigger: org.apache.spark.sql.streaming.Trigger)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        encode(batch.toDF(), id)
      }
      .start()
}

object VectorIndex {
  /** Codes-table bucket count — also the migration quantum. */
  val CODES_BUCKETS = 16
  /** Probe-set size above which `search` splits into hash-waves so the
    * per-wave ADC LUT broadcast stays constant-bounded. */
  val SEARCH_WAVE = 1024
}

/** Graded bindings. All queries train epoch 0 on the ODD half of the corpus
  * (`vec_id % 2 = 1` — the "arrived slice"; odd because the Lloyd/PQ seed
  * ids are ≡ 7 mod 50, all odd, so the even half would empty the seed) and
  * search the standard probe set, so the oracle is the one-shot IVFPQ chain
  * with the SAME training restriction (`Similarity.ivfpqSql(Some(...))`):
  * any divergence between the persisted path — parquet round-trip, bucket
  * upserts, replay guard, incremental encode order — and the declarative
  * semantics breaks the hash.
  *
  * `sim_index_retrain_epoch` additionally retrains epoch 1 on a DRIFTED
  * slice (`vec_id % 4 = 3`) and migrates exactly half the buckets (plus one
  * replayed migration, which must no-op), so its search runs over a
  * HALF-MIGRATED index: the oracle is the declarative two-epoch union —
  * every vector scored under the epoch that quantized it, one global top-k.
  */
object VectorIndexOps {

  private[operators] val TRAIN_WHERE = "vec_id % 2 = 1"
  /** Epoch-1 training slice: a strict sub-population of the odd half (the
    * drift), still containing Lloyd seeds (7, 107, …) and PQ seeds
    * (7, 107, 207, 307). */
  private[operators] val RETRAIN_WHERE = "vec_id % 4 = 3"
  private val SPLIT = 3000L // ann_admit_incremental batch boundary
  /** Buckets 0..MIGRATED-1 are migrated to epoch 1 in the graded retrain
    * query; mod routing makes their row set the plain SQL predicate
    * `vec_id % CODES_BUCKETS < MIGRATED`. */
  private val MIGRATED = VectorIndex.CODES_BUCKETS / 2

  private[operators] def freshIndex(s: SparkSession, dir: String): (VectorIndex, DataFrame) = {
    // cloned-session scoping (the dedup_admit_incremental convention):
    // index maintenance batches are small and run many exchanges; 8
    // partitions quarters task overhead without touching concurrent queries
    val local = s.newSession()
    local.conf.set("spark.sql.shuffle.partitions", "8")
    val work = graft.Scratch.dir("graft-vec-index")
    (new VectorIndex(local, work.toString), Similarity.vecs(local, dir))
  }

  private def probesOf(corpus: DataFrame): DataFrame =
    corpus.filter(Similarity.isProbe)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("norm").as("p_norm"))

  // train once on the arrived half → encode the whole corpus → search from
  // the artifact alone
  private val simIndexSearch: Q = (s, dir) => {
    val (idx, corpus) = freshIndex(s, dir)
    idx.train(corpus.filter(expr(TRAIN_WHERE)))
    idx.encode(corpus, 0L)
    idx.search(probesOf(corpus), 3)
  }

  // same artifact built INCREMENTALLY: two id-split batches plus a replayed
  // one (which must no-op) — the search result is batch-split-invariant, so
  // the same one-shot oracle grades it
  private val annAdmitIncremental: Q = (s, dir) => {
    val (idx, corpus) = freshIndex(s, dir)
    idx.train(corpus.filter(expr(TRAIN_WHERE)))
    idx.encode(corpus.filter(col("vec_id") < SPLIT), 0L)
    idx.encode(corpus.filter(col("vec_id") >= SPLIT), 1L)
    idx.encode(corpus.filter(col("vec_id") >= SPLIT), 1L) // replay: guarded no-op
    idx.search(probesOf(corpus), 3)
  }

  // the non-stop-the-world retrain: epoch 0 indexes everything, epoch 1
  // trains on the drifted slice, HALF the buckets migrate (one replayed —
  // must no-op), and search serves the half-migrated index exactly
  private val simIndexRetrainEpoch: Q = (s, dir) => {
    val (idx, corpus) = freshIndex(s, dir)
    idx.train(corpus.filter(expr(TRAIN_WHERE)))          // epoch 0
    idx.encode(corpus, 0L)
    idx.train(corpus.filter(expr(RETRAIN_WHERE)), 1L)    // epoch 1 (drift)
    // two migration WAVES + a bucket-at-a-time tail: same final epoch-1
    // set (buckets 0..MIGRATED-1), three commits instead of eight — the
    // wave driver a production migration runs
    idx.migrateBuckets(corpus, 0 until MIGRATED / 2, 1L)
    idx.migrateBuckets(corpus, MIGRATED / 2 until MIGRATED - 1, 2L)
    idx.migrateBucket(corpus, MIGRATED - 1, 3L)
    idx.migrateBuckets(corpus, 0 until MIGRATED / 2, 1L) // replay: guarded no-op
    idx.search(probesOf(corpus), 3)
  }

  // index observability: per-cell population of the coarse quantizer — the
  // balance metric a production ANN deployment watches continuously,
  // because a skewed cell is a latency hot spot (search cost per probe is
  // the probed cells' population) and the trigger for a retrain. No PQ
  // side needed: cell balance is a property of the IVF assignment alone.
  private val simIndexCellStats: Q = (s, dir) => {
    val corpus = Similarity.vecs(s, dir)
    val cents = Similarity.trainedCodebookOf(corpus.filter(expr(TRAIN_WHERE)))
    Similarity.assignTo(corpus, cents)
      .groupBy(col("cent_id").as("cell"))
      .agg(count(lit(1)).as("n_vecs"))
      .select(col("cell"), col("n_vecs"))
      .orderBy(col("cell").asc_nulls_first)
  }

  /** The declarative two-epoch union: epoch-0 and epoch-1 codebook chains
    * train independently (prefixed CTEs), each vector belongs to exactly
    * one epoch (`epoch1Where` — the migrated buckets under mod routing),
    * candidates and ADC scores form per-epoch, and one global top-k ranks
    * the union. The oracle twin of a half-migrated `VectorIndex`. */
  private[operators] def twoEpochSql(w0: String, w1: String,
                                     epoch1Where: String): String = {
    import Similarity.{LLOYD_ROUNDS, PQ_ROUNDS, PQ_M, NPROBE, PROBE_CAP}
    val aCols = (0 until PQ_M).map(i =>
      s"sum(lv) FILTER (WHERE l.m = $i) AS a_$i").mkString(",\n         |    ")
    val adc = (0 until PQ_M).map(i => s"a_$i").mkString(" + ")
    def epochBlock(p: String, memberWhere: String): String = {
      val cWhere = memberWhere.replace("vec_id", "c.vec_id")
      val sWhere = memberWhere.replace("vec_id", "s.vec_id")
      s"""${p}asg AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT c.vec_id, k.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(c.v, k.c_v) / (c.norm * k.c_norm) DESC, k.cent_id ASC) AS arn
         |    FROM vecs c CROSS JOIN ${p}cents k WHERE ($cWhere)) WHERE arn = 1),
         |${p}codes AS (
         |  SELECT vec_id, norm, m, cent_id AS code FROM (
         |    SELECT s.vec_id, s.norm, s.m, k.cent_id,
         |      row_number() OVER (PARTITION BY s.vec_id, s.m
         |        ORDER BY ${Similarity.d2Sql("s.x", "k.c_v")} ASC, k.cent_id ASC) AS rn
         |    FROM sub s JOIN ${p}pqcents k ON s.m = k.m WHERE ($sWhere)) WHERE rn = 1),
         |${p}pcells AS (
         |  SELECT probe_id, cent_id AS p_cent FROM (
         |    SELECT p.probe_id, k.cent_id,
         |      row_number() OVER (PARTITION BY p.probe_id
         |        ORDER BY list_dot_product(p.p_v, k.c_v) / (p.p_norm * k.c_norm) DESC,
         |                 k.cent_id ASC) AS cell_rank
         |    FROM probes p CROSS JOIN ${p}cents k) WHERE cell_rank <= $NPROBE),
         |${p}lut AS (SELECT pr.probe_id, pr.p_norm, pr.m, k.cent_id,
         |          list_dot_product(pr.p_x, k.c_v) AS lv
         |        FROM psub pr JOIN ${p}pqcents k ON pr.m = k.m),
         |${p}cand AS (
         |  SELECT c.vec_id, c.norm, c.m, c.code, pc.probe_id
         |  FROM ${p}codes c JOIN ${p}asg a ON c.vec_id = a.vec_id
         |  JOIN ${p}pcells pc ON a.cent_id = pc.p_cent AND c.vec_id <> pc.probe_id),
         |${p}sc AS (
         |  SELECT d.probe_id, d.vec_id, min(d.norm) AS norm, min(l.p_norm) AS p_norm,
         |    $aCols
         |  FROM ${p}cand d JOIN ${p}lut l ON d.m = l.m AND d.code = l.cent_id
         |    AND d.probe_id = l.probe_id
         |  GROUP BY 1, 2)""".stripMargin
    }
    s"""WITH vecs AS (${Similarity.vecsSql}),
       |${Similarity.lloydCentsSql(LLOYD_ROUNDS, Some(w0), "e0")},
       |${Similarity.pqCentsSql(PQ_ROUNDS, Some(w0), "e0")},
       |${Similarity.lloydCentsSql(LLOYD_ROUNDS, Some(w1), "e1")},
       |${Similarity.pqCentsSql(PQ_ROUNDS, Some(w1), "e1", emitSub = false)},
       |probes AS (
       |  SELECT vec_id AS probe_id, v AS p_v, norm AS p_norm
       |  FROM vecs WHERE vec_id % 100 = 0 AND vec_id < $PROBE_CAP),
       |psub AS (SELECT vec_id AS probe_id, norm AS p_norm, m, x AS p_x FROM sub
       |         WHERE vec_id % 100 = 0 AND vec_id < $PROBE_CAP),
       |${epochBlock("e0", s"NOT ($epoch1Where)")},
       |${epochBlock("e1", epoch1Where)},
       |ranked AS (
       |  SELECT probe_id, vec_id, ($adc) / (norm * p_norm) AS adc_sim FROM e0sc
       |  UNION ALL
       |  SELECT probe_id, vec_id, ($adc) / (norm * p_norm) AS adc_sim FROM e1sc),
       |top AS (
       |  SELECT probe_id, vec_id, adc_sim,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY adc_sim DESC, vec_id ASC) AS rank
       |  FROM ranked)
       |SELECT probe_id, rank, vec_id AS neighbor_id, round(adc_sim, 6) AS adc_sim
       |FROM top WHERE rank <= 3
       |ORDER BY probe_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "sim_index_search" -> simIndexSearch,
    "ann_admit_incremental" -> annAdmitIncremental,
    "sim_index_retrain_epoch" -> simIndexRetrainEpoch,
    "sim_index_cell_stats" -> simIndexCellStats
  )

  val oracle: Map[String, String] = Map(
    "sim_index_search" -> Similarity.ivfpqSql(Some(TRAIN_WHERE)),
    "ann_admit_incremental" -> Similarity.ivfpqSql(Some(TRAIN_WHERE)),
    "sim_index_retrain_epoch" -> twoEpochSql(TRAIN_WHERE, RETRAIN_WHERE,
      s"vec_id % ${VectorIndex.CODES_BUCKETS} < $MIGRATED"),
    // the assigned CTE of the IVFPQ chain, aggregated — same Lloyd training
    // restriction, so cell ids and memberships replay exactly
    "sim_index_cell_stats" ->
      s"""WITH vecs AS (${Similarity.vecsSql}),
         |${Similarity.lloydCentsSql(Similarity.LLOYD_ROUNDS, Some(TRAIN_WHERE))},
         |assigned AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT c.vec_id, k.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(c.v, k.c_v) / (c.norm * k.c_norm) DESC, k.cent_id ASC) AS arn
         |    FROM vecs c CROSS JOIN cents k) WHERE arn = 1)
         |SELECT cent_id AS cell, count(*) AS n_vecs FROM assigned
         |GROUP BY 1
         |ORDER BY cell ASC NULLS FIRST""".stripMargin
  )
}
