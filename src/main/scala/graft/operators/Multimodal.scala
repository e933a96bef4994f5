package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column handling (builder brief: image/audio/video as opaque
  * binary columns + typed metadata).
  *
  * The testdata has no real media, so payloads are *constructed*
  * deterministically from `documents` (magic bytes + md5-derived body) and
  * every downstream op treats them as genuine `BinaryType` columns:
  * format-sniffing on magic bytes, metadata extraction, a decode stage, and
  * per-frame sampling (one payload → N frame rows).
  *
  * The codec boundary: a real deployment decodes via a vectorized batch UDF
  * (mapInPandas in PySpark; a typed `mapPartitions` with a pluggable decoder
  * in Scala — see `decodeWith`, the one sanctioned mapPartitions in this
  * codebase, unit-tested with a fake codec). The decoder in this container
  * is a clearly-marked deterministic fake (`FakeCodec`): the brief asks for
  * real plumbing — schema, batch shape, partition behavior — with the
  * image/audio library itself stubbed.
  *
  * Scale design: everything is per-row map work over the scan — no shuffle,
  * no driver collection; frame sampling fans out rows with `posexplode`
  * (bounded fan-out per payload). Graded queries stay expression-only so the
  * DuckDB oracle can mirror them in hex-string space (Spark `hex(unhex(x))`
  * normalizes to uppercase; the oracle applies `upper(...)` to match).
  */
object Multimodal {

  // Deterministic payload: magic prefix by doc_id%3 + md5 body + variable
  // even-length tail, as a hex string; the binary column is its unhex.
  // The BODY hashes the text's leading 64 chars, so the near-dup document
  // families (long shared prefix) carry the SAME media body behind
  // different wrappers — the planted relationship mm_payload_dedup detects
  // (re-containered copies of one image), invisible to whole-text hashing.
  private val magicCol: Column =
    when(col("doc_id") % 3 === 0, lit("89504E47"))   // PNG  \x89PNG
      .when(col("doc_id") % 3 === 1, lit("FFD8FFE0")) // JPEG SOI/APP0
      .otherwise(lit("47494638"))                      // GIF  GIF8
  // body = three chained md5s of the prefix (96 hex chars): long enough
  // that the shared body dominates the wrapper in the payload's gram set,
  // the way a real image's bytes dominate its container metadata
  private val payloadHex: Column = concat(
    magicCol,
    md5(substring(col("text"), 1, 64)),
    md5(concat(substring(col("text"), 1, 64), lit("a"))),
    md5(concat(substring(col("text"), 1, 64), lit("b"))),
    substring(md5(concat(substring(col("text"), 1, 64), lit("!"))),
      lit(1), (col("doc_id") % 8).cast("int") * 2))

  /** documents + payload BINARY + n_bytes + sniffed format. */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("payload", unhex(payloadHex))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("format",
        when(substring(hex(col("payload")), 1, 8) === "89504E47", "png")
          .when(substring(hex(col("payload")), 1, 8) === "FFD8FFE0", "jpeg")
          .when(substring(hex(col("payload")), 1, 8) === "47494638", "gif")
          .otherwise("unknown"))

  // ---- graded queries ----

  /** Binary metadata extraction: size, magic-byte format sniff, head bytes. */
  private val mmBinaryMeta: Q = (s, dir) =>
    media(s, dir)
      .select(col("doc_id"), col("format"), col("n_bytes"),
        substring(hex(col("payload")), 1, 16).as("head_hex"))
      .orderBy(col("doc_id").asc_nulls_first)

  /** The decode stub as expressions: pseudo-dimensions derived from a hash of
    * the payload — deterministic fake decode with the real metadata schema
    * (width/height/channels/mean luma) a codec would emit. */
  private val mmDecodeFeatures: Q = (s, dir) =>
    media(s, dir)
      .withColumn("h", md5(hex(col("payload"))))
      .select(
        col("doc_id"), col("format"),
        (conv(substring(col("h"), 1, 4), 16, 10).cast("long") % 1024 + 1).as("width"),
        (conv(substring(col("h"), 5, 4), 16, 10).cast("long") % 1024 + 1).as("height"),
        (conv(substring(col("h"), 9, 1), 16, 10).cast("long") % 4 + 1).as("channels"),
        round(conv(substring(col("h"), 10, 6), 16, 10).cast("double") / 16777215.0, 6)
          .as("mean_luma"))
      .orderBy(col("doc_id").asc_nulls_first)

  /** Video-style frame sampling: one payload → N frame rows with byte
    * ranges; N and the stride derive from the payload size. */
  private val mmFrameSample: Q = (s, dir) =>
    media(s, dir)
      .withColumn("n_frames", (col("n_bytes") % 5 + 1).cast("int"))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * (col("n_bytes").cast("long") / col("n_frames")).cast("long"))
          .cast("long").as("byte_off"),
        (col("n_bytes").cast("long") / col("n_frames")).cast("long").as("frame_len"))
      .orderBy(col("doc_id").asc_nulls_first, col("frame_idx").asc_nulls_first)

  /** Audio-style windowed feature extraction: treat the payload as PCM-ish
    * samples, frame it into fixed 4-byte windows, and emit per-window energy
    * (sum of sample magnitudes) and peak — the map shape of every audio
    * featurizer (RMS/VAD/silence trim). Integer byte sums, so the oracle is
    * exact. The per-window stats come from the one-pass BinaryWindowStats
    * kernel computed BEFORE the fan-out, so the explode carries 16-byte
    * stat structs — the previous hex/substr composition duplicated the whole
    * payload's hex into every window row and re-sliced it per byte,
    * O(payload × windows) per document. Per-row work only, zero shuffle at
    * any corpus size.
    */
  private val WIN_BYTES = 4
  private val mmAudioEnergy: Q = (s, dir) =>
    media(s, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.BinaryWindowExpression.binaryWindows(
          col("payload"), WIN_BYTES)).as(Seq("pos", "ws")))
      .select(col("doc_id"), col("pos").cast("long").as("win_idx"),
        col("ws.energy").as("energy"), col("ws.peak").as("peak"))
      .orderBy(col("doc_id").asc_nulls_first, col("win_idx").asc_nulls_first)

  /** Scene-cut detection: the change-point shape of video shot segmentation.
    * A real pipeline diffs per-frame histograms; the 1-D stand-in is the
    * window energy the BinaryWindowStats kernel already emits. A cut is a
    * window whose energy jumps ≥ CUT_THRESH from its predecessor — one
    * doc-keyed lag window over the fan-out, then a per-doc collapse: count,
    * cut count, first cut index. Per-row work + one doc-keyed exchange
    * (lag + groupBy share the doc partitioning); nothing corpus-global.
    */
  private val CUT_THRESH = 256L
  private val mmSceneCuts: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("pos").asc)
    media(s, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.BinaryWindowExpression.binaryWindows(
          col("payload"), WIN_BYTES)).as(Seq("pos", "ws")))
      .select(col("doc_id"), col("pos"), col("ws.energy").as("energy"))
      .withColumn("delta", abs(col("energy") - lag(col("energy"), 1).over(w)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("delta") >= CUT_THRESH, 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("delta") >= CUT_THRESH, col("pos"))).cast("long").as("first_cut"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Binary-payload NEAR-dup: the same media body behind a different
    * container — here literally, since the fixture payload is one md5 body
    * wrapped by a doc-dependent magic prefix and tail length (the
    * deterministic stand-in for a re-containered image). Signature = 60-bit
    * simhash over byte-4-grams (8 hex chars of the payload), then the
    * shared pigeonhole hamming-band kernel from the text family — radius 5
    * (the full B−1 pigeonhole bound: wrapper variants differ in a larger
    * gram fraction than token-level text edits), MAX_BUCKET guard, exact
    * recall. Zero new machinery: only the signature SOURCE changed, which
    * is the kernel contract. At 100 TB the hex/gram/simhash chain is
    * per-row map work over the media scan; candidates stay an equi-join on
    * (combo, key) — at radius 5 the C(6,1) combos are the six single
    * bands, so this lane's admission is unchanged by the combo-key kernel.
    */
  private val mmPayloadDedup: Q = (s, dir) =>
    DedupText.hammingPairs(
        media(s, dir).repartition(col("doc_id"))
          .withColumn("hx", hex(col("payload")))
          .withColumn("hs", transform(
            graft.functions.ShingleExpression.charShingles(col("hx"), 8),
            g => Hashing.h60(concat(lit("0:"), g))))
          .filter(size(col("hs")) > 0)
          .select(col("doc_id"), DedupText.simhash60(col("hs")).as("sig")),
        k = 5)
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)

  val queries: Map[String, Q] = Map(
    "mm_binary_meta" -> mmBinaryMeta,
    "mm_decode_features" -> mmDecodeFeatures,
    "mm_frame_sample" -> mmFrameSample,
    "mm_audio_energy" -> mmAudioEnergy,
    "mm_scene_cuts" -> mmSceneCuts,
    "mm_payload_dedup" -> mmPayloadDedup
  )

  // NOTE: interpolated into stripMargin'd strings below — no line here may
  // start with '|' (e.g. a leading '||' concat) or the outer stripMargin
  // would eat it.
  private val hexSql =
    """SELECT doc_id,
      |  upper(concat(
      |    CASE WHEN doc_id % 3 = 0 THEN '89504E47'
      |         WHEN doc_id % 3 = 1 THEN 'FFD8FFE0'
      |         ELSE '47494638' END,
      |    md5(substr(text, 1, 64)),
      |    md5(concat(substr(text, 1, 64), 'a')),
      |    md5(concat(substr(text, 1, 64), 'b')),
      |    substr(md5(concat(substr(text, 1, 64), '!')), 1, CAST(doc_id % 8 AS INT) * 2))) AS hx
      |FROM documents""".stripMargin

  val oracle: Map[String, String] = Map(
    // byte-4-gram simhash + the shared hamming-band mirror at radius 5
    "mm_payload_dedup" ->
      s"""WITH m AS ($hexSql),
         |hs AS (
         |  -- lower(hx): the Spark-side shingle kernel normalizes (lowercases)
         |  -- its input; hex case is irrelevant to gram identity
         |  SELECT doc_id,
         |    list_transform(
         |      CASE WHEN len(hx) >= 8
         |        THEN list_distinct(list_transform(range(1, len(hx)-6), i -> substr(lower(hx), i, 8)))
         |        ELSE [] END,
         |      g -> CAST(('0x'||substr(md5('0:'||g),1,15)) AS BIGINT)) AS hs
         |  FROM m),
         |${DedupText.hammingPairsSql(k = 5)}
         |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin,
    "mm_binary_meta" ->
      s"""WITH m AS ($hexSql)
         |SELECT doc_id,
         |  CASE substr(hx, 1, 8) WHEN '89504E47' THEN 'png' WHEN 'FFD8FFE0' THEN 'jpeg'
         |       WHEN '47494638' THEN 'gif' ELSE 'unknown' END AS format,
         |  CAST(len(hx) / 2 AS BIGINT) AS n_bytes,
         |  substr(hx, 1, 16) AS head_hex
         |FROM m ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "mm_decode_features" ->
      s"""WITH m AS ($hexSql), h AS (SELECT doc_id, hx, md5(hx) AS h FROM m)
         |SELECT doc_id,
         |  CASE substr(hx, 1, 8) WHEN '89504E47' THEN 'png' WHEN 'FFD8FFE0' THEN 'jpeg'
         |       WHEN '47494638' THEN 'gif' ELSE 'unknown' END AS format,
         |  CAST(('0x' || substr(h, 1, 4)) AS BIGINT) % 1024 + 1 AS width,
         |  CAST(('0x' || substr(h, 5, 4)) AS BIGINT) % 1024 + 1 AS height,
         |  CAST(('0x' || substr(h, 9, 1)) AS BIGINT) % 4 + 1 AS channels,
         |  round(CAST(('0x' || substr(h, 10, 6)) AS BIGINT) / 16777215.0, 6) AS mean_luma
         |FROM h ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "mm_audio_energy" ->
      s"""WITH m AS ($hexSql),
         |w AS (SELECT doc_id, hx,
         |        CAST(len(hx) / 2 AS BIGINT) // 4 AS n_win FROM m),
         |f AS (SELECT doc_id, hx, unnest(range(0, n_win)) AS win_idx FROM w),
         |b AS (SELECT doc_id, win_idx,
         |        list_transform(range(0, 4), i ->
         |          CAST(('0x' || substr(hx, CAST(win_idx * 8 + i * 2 + 1 AS INT), 2)) AS BIGINT)) AS bytes
         |      FROM f)
         |SELECT doc_id, win_idx,
         |  CAST(list_sum(bytes) AS BIGINT) AS energy,
         |  CAST(list_max(bytes) AS BIGINT) AS peak
         |FROM b ORDER BY doc_id ASC NULLS FIRST, win_idx ASC NULLS FIRST""".stripMargin,
    "mm_scene_cuts" ->
      s"""WITH m AS ($hexSql),
         |w AS (SELECT doc_id, hx,
         |        CAST(len(hx) / 2 AS BIGINT) // $WIN_BYTES AS n_win FROM m),
         |f AS (SELECT doc_id, hx, unnest(range(0, n_win)) AS win_idx FROM w),
         |b AS (SELECT doc_id, win_idx,
         |        list_transform(range(0, $WIN_BYTES), i ->
         |          CAST(('0x' || substr(hx, CAST(win_idx * ${WIN_BYTES * 2} + i * 2 + 1 AS INT), 2)) AS BIGINT)) AS bytes
         |      FROM f),
         |e AS (SELECT doc_id, win_idx, CAST(list_sum(bytes) AS BIGINT) AS energy FROM b),
         |d AS (SELECT doc_id, win_idx,
         |        abs(energy - lag(energy) OVER (PARTITION BY doc_id ORDER BY win_idx ASC)) AS delta
         |      FROM e)
         |SELECT doc_id, count(*) AS n_windows,
         |  CAST(sum(CASE WHEN delta >= $CUT_THRESH THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
         |  CAST(min(CASE WHEN delta >= $CUT_THRESH THEN win_idx END) AS BIGINT) AS first_cut
         |FROM d GROUP BY doc_id ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH m AS ($hexSql),
         |f AS (SELECT doc_id, CAST(len(hx) / 2 AS BIGINT) AS n_bytes,
         |             CAST(len(hx) / 2 AS BIGINT) % 5 + 1 AS n_frames FROM m)
         |SELECT doc_id, unnest(range(0, n_frames)) AS frame_idx,
         |  unnest(range(0, n_frames)) * (n_bytes // n_frames) AS byte_off,
         |  n_bytes // n_frames AS frame_len
         |FROM f ORDER BY doc_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""".stripMargin
  )

  // ---- the pluggable decode seam (unit-tested; not oracle-gradable) ----

  /** One decoded media row: the schema a real codec stage emits. */
  case class Decoded(doc_id: Long, format: String, width: Int, height: Int,
                     channels: Int, pixels: Array[Byte])

  /** A decoder turns one payload into decoded metadata + pixel bytes. */
  type Codec = (Long, String, Array[Byte]) => Decoded

  /** STUB — deterministic fake standing in for libjpeg/libpng/ffmpeg (not in
    * this container): derives dimensions from payload bytes and "decodes" the
    * payload as its own pixels. The plumbing around it is real.
    */
  val FakeCodec: Codec = (id, fmt, bytes) => {
    val w = 1 + (math.abs(bytes.map(_.toInt).sum) % 64)
    Decoded(id, fmt, w, 1 + bytes.length % 64, 3, bytes)
  }

  /** REAL decode for the formats the JDK ships codecs for (PNG, GIF, JPEG,
    * BMP via `javax.imageio` — in-JVM, zero native deps): genuine pixel
    * decode through the same seam the fake plugs into, so the plumbing is
    * proven against actual image bytes, not only the stub. Emits raster
    * samples row-major, one byte per channel sample. A payload that is not
    * a decodable image fails loudly — a production pipeline would route
    * those rows to a quarantine sink instead.
    */
  val ImageIOCodec: Codec = (id, fmt, bytes) => {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $id: payload is not an image ImageIO can decode")
    val (w, h) = (img.getWidth, img.getHeight)
    val ch = img.getRaster.getNumBands
    val samples = img.getRaster.getPixels(0, 0, w, h, new Array[Int](w * h * ch))
    Decoded(id, fmt, w, h, ch, samples.map(_.toByte))
  }

  /** The batch-decode stage: typed mapPartitions over (id, format, payload)
    * — the Scala analogue of mapInPandas. One codec instance per partition
    * (real codecs carry per-thread native state); rows stream through
    * without materializing the partition.
    */
  def decodeWith(media: DataFrame, codec: Codec): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, fmt, bytes) => codec(id, fmt, bytes) })
  }

  // ---- the audio half of the seam (same pattern, javax.sound in-JVM) ----

  /** One decoded audio row: rate/layout metadata + raw PCM. */
  case class DecodedAudio(doc_id: Long, sample_rate: Int, channels: Int,
                          bits: Int, n_frames: Long, pcm: Array[Byte])

  type AudioCodec = (Long, Array[Byte]) => DecodedAudio

  /** REAL audio decode for the formats the JDK ships codecs for (WAV/AIFF/AU
    * via `javax.sound.sampled` — in-JVM, zero native deps): container parse
    * + PCM extraction through the same pluggable seam as the image codec.
    * Non-audio payloads fail loudly (quarantine-sink routing in production).
    */
  val WavCodec: AudioCodec = (id, bytes) => {
    val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    catch {
      case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(
          s"doc $id: payload is not audio javax.sound can decode", e)
    }
    val f = in.getFormat
    DecodedAudio(id, f.getSampleRate.toInt, f.getChannels,
      f.getSampleSizeInBits, in.getFrameLength, in.readAllBytes())
  }

  /** Batch audio decode — mapPartitions for the same reason as `decodeWith`
    * (per-partition codec instance, streaming rows). */
  def decodeAudioWith(media: DataFrame, codec: AudioCodec): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => codec(id, bytes) })
  }
}
