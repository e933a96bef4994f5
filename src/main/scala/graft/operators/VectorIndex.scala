package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Q
import graft.streaming.ParquetTableSink

/** Persisted ANN index: train ONCE, search MANY, admit vectors
  * INCREMENTALLY — the production lifecycle the in-session `sim_*` queries
  * deliberately don't model (each of those retrains its Lloyd/PQ codebooks
  * per invocation so the DuckDB oracle can replay the whole chain; at
  * 100 TB the codebooks are a build artifact, not a per-query cost).
  *
  * Three versioned tables (ParquetTableSink — the same durable boundary the
  * LSH admission index rides):
  *
  *   - `cents`   cent_id, c_emb, c_norm — the IVF coarse codebook
  *               (≤ 32 rows; trained by `Similarity.trainedCodebookOf`);
  *   - `pcents`  m, cent_id, c_emb — the PQ per-subspace codebooks
  *               (≤ M·K rows; trained by `Similarity.pqCodebooksOf`);
  *   - `codes`   vec_id, norm, cell, codes[M] — one compact row per indexed
  *               vector: its IVF cell plus its M PQ code ids. THIS is the
  *               100 TB-proportional table, hash-bucketed by vec_id; at 64
  *               float dims a row shrinks 256 B → ~40 B (the PQ promise).
  *
  * Lifecycle contracts:
  *
  *   - `train` freezes both codebooks from whatever training slice has
  *     arrived — after that, search plans never recompute them (they read
  *     ≤ M·K stored rows and broadcast them);
  *   - `encode` quantizes ONLY the passed batch (cost O(|batch| · M · K),
  *     independent of the already-indexed corpus) and upserts it by vec_id
  *     under the exactly-once batchId guard: a replayed micro-batch no-ops,
  *     a re-sent vector overwrites its own row idempotently;
  *   - `search` is the IVFPQ/ADC plan of `Similarity.ivfpqTopK` with every
  *     training input swapped for a stored artifact: probe cells rank the
  *     broadcast codebook, the per-probe LUT is |probes|·M·K broadcast
  *     rows, and the candidate scan reads stored (cell, codes) rows pruned
  *     to the probes' NPROBE cells — nothing corpus-proportional is
  *     broadcast, collected, or retrained.
  *
  * Cross-engine determinism is inherited: codebooks and norms round-trip
  * parquet as exact doubles, ADC pivots the M subspace terms into fixed
  * columns summed in syntactic order, so `search` over an index trained on
  * slice W hash-matches the one-shot oracle `Similarity.ivfpqSql(Some(W))`.
  */
final class VectorIndex(spark: SparkSession, dir: String) {

  private val centsSchema = StructType(Seq(
    StructField("cent_id", LongType, nullable = true),
    StructField("c_emb", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("c_norm", DoubleType, nullable = true)))
  private val pcentsSchema = StructType(Seq(
    StructField("m", IntegerType, nullable = true),
    StructField("cent_id", LongType, nullable = true),
    StructField("c_emb", ArrayType(DoubleType, containsNull = true), nullable = true)))
  private val codesSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = true),
    StructField("norm", DoubleType, nullable = true),
    StructField("cell", LongType, nullable = true),
    StructField("codes", ArrayType(LongType, containsNull = true), nullable = true)))

  private def emptyOf(schema: StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  private def conform(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)

  // codebook tables are one bucket each: they are constant-size artifacts
  // (≤ 32 and ≤ M·K rows) read whole and broadcast — bucketing them would
  // only multiply tiny files. The codes table scales with the corpus.
  //
  // Codebook merges REPLACE, not upsert: a retrain ships the whole new
  // codebook in one batch, and cells that died in the new training must
  // not linger from the old one (with one bucket, the staged batch is the
  // entire table, so replacement is exact and batch-associative).
  private val replace: ParquetTableSink.Combiner =
    (target, staged) => staged.select(target.columns.toSeq.map(col): _*)
  private val centsSink = new ParquetTableSink(spark, s"$dir/cents",
    emptyOf(centsSchema), keys = Seq("cent_id"), buckets = 1, combine = replace)
  private val pcentsSink = new ParquetTableSink(spark, s"$dir/pcents",
    emptyOf(pcentsSchema), keys = Seq("m", "cent_id"), buckets = 1, combine = replace)
  private val codesSink = new ParquetTableSink(spark, s"$dir/codes",
    emptyOf(codesSchema), keys = Seq("vec_id"), buckets = 16)

  def lastEncodedBatchId: Long = codesSink.lastCommittedBatchId

  /** Train both codebooks on `corpus` (vec_id, embedding, norm — any slice
    * of the table that has arrived) and persist them, REPLACING any prior
    * codebooks. One-time cost; the chains are the graded Lloyd/PQ
    * trainers, unchanged. Retraining an index that already holds encoded
    * vectors (drift) requires re-encoding them — codes are meaningful only
    * against the codebooks that produced them (VectorIndexSpec pins that
    * retrain + full re-encode equals a fresh build). */
  def train(corpus: DataFrame, batchId: Long = 0L): Unit = {
    centsSink.merge(
      conform(Similarity.trainedCodebookOf(corpus), centsSchema), batchId)
    pcentsSink.merge(
      conform(Similarity.pqCodebooksOf(Similarity.pqSubOf(corpus)), pcentsSchema), batchId)
  }

  /** Quantize ONLY `vectors` (vec_id, embedding, norm) against the frozen
    * codebooks and upsert their rows: per-batch cost is O(|batch| · M · K)
    * regardless of index size, and the batchId guard makes replay a no-op.
    * Both quantizers collapse their scored rows map-side (assignTo /
    * pqAssign partial aggregates), and the cell/codes join is two frames
    * derived from the same batch co-keyed on vec_id. */
  def encode(vectors: DataFrame, batchId: Long): Unit = {
    // fail loud like search: encoding against an absent codebook would
    // produce ZERO rows yet still consume the batchId, so the corrected
    // retry after a train would be rejected by the replay guard
    require(centsSink.lastCommittedBatchId >= 0 &&
      pcentsSink.lastCommittedBatchId >= 0,
      s"VectorIndex($dir): encode before train — no committed codebooks")
    if (batchId <= codesSink.lastCommittedBatchId) return
    val cents = centsSink.current
    val pcents = pcentsSink.current
    val cells = Similarity.assignTo(vectors, cents)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val mcodes = Similarity.pqAssign(Similarity.pqSubOf(vectors), pcents)
      .groupBy(col("vec_id"))
      .agg(first(col("norm")).as("norm"),
        transform(array_sort(collect_list(struct(col("m"), col("code")))),
          x => x.getField("code")).as("codes"))
    codesSink.merge(conform(mcodes.join(cells, "vec_id"), codesSchema), batchId)
  }

  /** Retire vectors from the index (deletion/right-to-be-forgotten): their
    * codes rows tombstone out of the versioned table, so they can never
    * appear as candidates again — no codebook retrain (the codebooks carry
    * no per-vector state), no rewrite beyond the touched buckets. Rides
    * the same batchId guard as `encode`; `vecIds` carries a `vec_id`
    * column. */
  def remove(vecIds: DataFrame, batchId: Long): Unit = {
    if (batchId <= codesSink.lastCommittedBatchId) return
    codesSink.merge(
      vecIds.select(col("vec_id").cast("long").as("vec_id"))
        .withColumn("norm", lit(null).cast("double"))
        .withColumn("cell", lit(null).cast("long"))
        .withColumn("codes", lit(null).cast(ArrayType(LongType, containsNull = true)))
        .withColumn(ParquetTableSink.DeleteCol, lit(true)),
      batchId)
  }

  /** IVFPQ/ADC top-k over the PERSISTED artifact. `probes` carries
    * (probe_id, p_emb, p_norm); cost per probe ≈ NPROBE/cells of the codes
    * table, scored at M lookup-adds per candidate. */
  def search(probes: DataFrame, k: Int): DataFrame = {
    import Similarity.{NPROBE, PQ_M, PQ_SUBDIM}
    // fail loud, not empty: an untrained index has no codebooks, and a
    // silently-empty top-k reads as "no neighbors" downstream
    require(centsSink.lastCommittedBatchId >= 0 &&
      pcentsSink.lastCommittedBatchId >= 0,
      s"VectorIndex($dir): search before train — no committed codebooks")
    val cents = centsSink.current
    val pcents = pcentsSink.current
    val wCell = Window.partitionBy("probe_id").orderBy(col("pc_cos").desc, col("cent_id").asc)
    val probeCells = probes.crossJoin(broadcast(cents))
      .withColumn("pc_cos",
        graft.functions.VectorExpressions.dot(col("p_emb"), col("c_emb"))
          / (col("p_norm") * col("c_norm")))
      .withColumn("cell_rank", row_number().over(wCell)).filter(col("cell_rank") <= NPROBE)
      .select(col("probe_id"), col("cent_id").as("p_cent"))
    // the per-probe ADC lookup table: slice each probe into its M subspaces
    // and dot against every stored subspace centroid — ≤ |probes|·M·K rows
    val lut = probes
      .select(col("probe_id").as("lprobe"), col("p_norm"),
        explode(sequence(lit(0), lit(PQ_M - 1))).as("lm"), col("p_emb"))
      .select(col("lprobe"), col("p_norm"), col("lm"),
        slice(col("p_emb"), col("lm") * lit(PQ_SUBDIM) + lit(1), lit(PQ_SUBDIM)).as("p_x"))
      .join(broadcast(pcents), col("lm") === col("m"))
      .select(col("lprobe"), col("p_norm"), col("lm"), col("cent_id").as("lcent"),
        graft.functions.VectorExpressions.dot(col("p_x"), col("c_emb")).as("lv"))
    val cand = codesSink.current
      .select(col("vec_id"), col("norm"), col("cell"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(probeCells),
        col("cell") === col("p_cent") && col("vec_id") =!= col("probe_id"))
    val perM = (0 until PQ_M).map(i =>
      sum(when(col("m") === i, col("lv"))).as(s"a_$i"))
    val scored = cand.join(broadcast(lut),
        col("m") === col("lm") && col("code") === col("lcent") &&
          col("probe_id") === col("lprobe"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(first(col("norm")).as("norm"),
        first(col("p_norm")).as("p_norm") +: perM: _*)
    val adc = (0 until PQ_M).map(i => col(s"a_$i")).reduceLeft(_ + _)
    val w = Window.partitionBy("probe_id").orderBy(col("adc_sim").desc, col("vec_id").asc)
    scored.withColumn("adc_sim", adc / (col("norm") * col("p_norm")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("adc_sim"), 6).as("adc_sim"))
      .orderBy(col("probe_id").asc_nulls_first, col("rank").asc_nulls_first)
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

/** Graded bindings. Both queries train on the ODD half of the corpus
  * (`vec_id % 2 = 1` — the "arrived slice"; odd because the Lloyd/PQ seed
  * ids are ≡ 7 mod 50, all odd, so the even half would empty the seed) and
  * search the standard probe set, so the oracle is the one-shot IVFPQ chain
  * with the SAME training restriction (`Similarity.ivfpqSql(Some(...))`):
  * any divergence between the persisted path — parquet round-trip, bucket
  * upserts, replay guard, incremental encode order — and the declarative
  * semantics breaks the hash.
  */
object VectorIndexOps {

  private[operators] val TRAIN_WHERE = "vec_id % 2 = 1"
  private val SPLIT = 3000L // ann_admit_incremental batch boundary

  private def freshIndex(s: SparkSession, dir: String): (VectorIndex, DataFrame) = {
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

  val queries: Map[String, Q] = Map(
    "sim_index_search" -> simIndexSearch,
    "ann_admit_incremental" -> annAdmitIncremental,
    "sim_index_cell_stats" -> simIndexCellStats
  )

  val oracle: Map[String, String] = Map(
    "sim_index_search" -> Similarity.ivfpqSql(Some(TRAIN_WHERE)),
    "ann_admit_incremental" -> Similarity.ivfpqSql(Some(TRAIN_WHERE)),
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
