package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The decode seam: schema, per-partition flow, and determinism of the
  * stubbed codec stage (the real library is out of scope by design).
  */
class MultimodalSpec extends SparkTestBase {

  test("decodeWith streams payloads through the codec with the decoded schema") {
    val session = spark
    import session.implicits._
    val media = Seq(
      (1L, "png", Array[Byte](1, 2, 3)),
      (2L, "jpeg", Array[Byte](9, 9))
    ).toDF("doc_id", "format", "payload").repartition(2)

    val out = Multimodal.decodeWith(media, Multimodal.FakeCodec)
    assert(out.columns.toSeq ==
      Seq("doc_id", "format", "width", "height", "channels", "pixels"))

    val rows = out.collect().map(d => (d.doc_id, d.format, d.width, d.height, d.channels))
    assert(rows.toSet == Set((1L, "png", 7, 4, 3), (2L, "jpeg", 19, 3, 3)))
    // pixels round-trip untouched by the fake codec
    assert(out.filter(col("doc_id") === 1).collect().head.pixels.toSeq == Seq[Byte](1, 2, 3))
  }

  test("decode stage is deterministic across repeated runs") {
    val session = spark
    import session.implicits._
    val media = (1L to 20L).map(i => (i, "png", Array.fill((i % 5).toInt + 1)(i.toByte)))
      .toDF("doc_id", "format", "payload")
    val a = Multimodal.decodeWith(media, Multimodal.FakeCodec)
      .collect().map(d => (d.doc_id, d.width, d.height)).sortBy(_._1).toSeq
    val b = Multimodal.decodeWith(media.repartition(5), Multimodal.FakeCodec)
      .collect().map(d => (d.doc_id, d.width, d.height)).sortBy(_._1).toSeq
    assert(a == b, "partitioning must not change decode output")
  }
}
