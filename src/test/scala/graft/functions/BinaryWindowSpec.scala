package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the one-pass BinaryWindowStats kernel to the hex/substr composition
  * it replaces (mm_audio_energy's former shape, which the DuckDB oracle
  * mirrors): per full window, unsigned-byte sum and max; tail bytes drop. */
class BinaryWindowSpec extends SparkTestBase {

  private val W = 4

  test("kernel matches the hex/substr composition on corpus payloads") {
    val media = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        // deterministic pseudo-payload from the text bytes (same trick the
        // multimodal fixtures use): enough to exercise arbitrary bytes
        encode(col("text"), "UTF-8").cast("binary").as("payload"))
    val viaKernel = media
      .select(col("doc_id"),
        posexplode(BinaryWindowExpression.binaryWindows(col("payload"), W))
          .as(Seq("pos", "ws")))
      .select(col("doc_id"), col("pos").cast("long").as("win_idx"),
        col("ws.energy").as("energy"), col("ws.peak").as("peak"))
    val viaHex = media
      .withColumn("hx", hex(col("payload")))
      .withColumn("n_win", (length(col("payload")) / W).cast("int"))
      .filter(col("n_win") > 0)
      .select(col("doc_id"), col("hx"),
        posexplode(sequence(lit(0), col("n_win") - 1)).as(Seq("pos", "win_idx")))
      .withColumn("bytes", transform(sequence(lit(0), lit(W - 1)), i =>
        conv(col("hx").substr(col("win_idx") * (W * 2) + i * 2 + 1, lit(2)), 16, 10)
          .cast("long")))
      .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
        aggregate(col("bytes"), lit(0L), (acc, x) => acc + x).as("energy"),
        array_max(col("bytes")).as("peak"))
    assert(viaKernel.exceptAll(viaHex).count() === 0)
    assert(viaHex.exceptAll(viaKernel).count() === 0)
  }

  test("edges: NULL payload, empty payload, payload under one window") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, Option.empty[Array[Byte]]),
      (2L, Some(Array.empty[Byte])),
      (3L, Some(Array[Byte](1, 2, 3))),            // under W: no full window
      (4L, Some(Array[Byte](1, 2, 3, -1, 5)))      // one window + tail drop
    ).toDF("doc_id", "payload")
      .select(col("doc_id"),
        BinaryWindowExpression.binaryWindows(col("payload"), W).as("w"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isEmpty)                       // NULL in → NULL out
    assert(rows(2L).get.asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(rows(3L).get.asInstanceOf[scala.collection.Seq[_]].isEmpty)
    val w4 = df.filter(col("doc_id") === 4L)
      .select(col("w")(0).getField("energy"), col("w")(0).getField("peak"), size(col("w")))
      .head()
    assert(w4.getLong(0) === 1 + 2 + 3 + 255)      // -1 reads unsigned 255
    assert(w4.getLong(1) === 255)
    assert(w4.getInt(2) === 1)                     // the 5th byte dropped
  }
}
