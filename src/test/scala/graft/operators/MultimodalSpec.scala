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

  test("ImageIOCodec decodes real PNG bytes: true dimensions, channels, and pixel values") {
    val session = spark
    import session.implicits._

    // tiny REAL PNGs generated in-JVM: known dims + a known corner pixel
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer missing")
      bos.toByteArray
    }

    val media = Seq(
      (1L, "png", png(5, 3, 0xFF0000)),  // red
      (2L, "png", png(2, 7, 0x00FF00)),  // green
      (3L, "png", png(1, 1, 0x1080C0))
    ).toDF("doc_id", "format", "payload").repartition(2)

    val out = Multimodal.decodeWith(media, Multimodal.ImageIOCodec)
      .collect().map(d => d.doc_id -> d).toMap

    assert((out(1L).width, out(1L).height, out(1L).channels) == (5, 3, 3))
    assert((out(2L).width, out(2L).height, out(2L).channels) == (2, 7, 3))
    assert((out(3L).width, out(3L).height, out(3L).channels) == (1, 1, 3))
    // raster samples are RGB row-major: the 1x1 image is exactly one pixel
    assert(out(3L).pixels.toSeq == Seq(0x10.toByte, 0x80.toByte, 0xC0.toByte))
    assert(out(1L).pixels.length == 5 * 3 * 3)
    assert(out(1L).pixels.take(3).toSeq == Seq(0xFF.toByte, 0x00.toByte, 0x00.toByte))
  }

  test("ImageIOCodec rejects a non-image payload loudly") {
    val session = spark
    import session.implicits._
    val media = Seq((9L, "png", Array[Byte](1, 2, 3, 4))).toDF("doc_id", "format", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWith(media, Multimodal.ImageIOCodec).collect()
    }
    assert(e.getMessage != null)
  }

  test("WavCodec decodes real WAV bytes: rate, layout, frame count, PCM round-trip") {
    val session = spark
    import session.implicits._

    // REAL in-JVM WAV: 16-bit little-endian mono PCM sine, written through
    // the JDK's own RIFF encoder — the decode must recover rate/frames/bytes
    def wav(freq: Double, rate: Int, nFrames: Int): Array[Byte] = {
      val pcm = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) {
        val s = (math.sin(2 * math.Pi * freq * i / rate) * 32000).toInt.toShort
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    val media = Seq(
      (1L, wav(440.0, 8000, 800)),
      (2L, wav(220.0, 16000, 320))
    ).toDF("doc_id", "payload").repartition(2)

    val out = Multimodal.decodeAudioWith(media, Multimodal.WavCodec)
      .collect().map(d => d.doc_id -> d).toMap
    assert((out(1L).sample_rate, out(1L).channels, out(1L).bits, out(1L).n_frames) ==
      (8000, 1, 16, 800L))
    assert((out(2L).sample_rate, out(2L).n_frames) == (16000, 320L))
    assert(out(1L).pcm.length == 800 * 2, "decoded PCM must be every frame's bytes")
    // frame 0 of a sine is silence; a quarter period in is near peak
    assert(out(1L).pcm(0) == 0 && out(1L).pcm(1) == 0)
  }

  test("WavCodec rejects a non-audio payload loudly") {
    val session = spark
    import session.implicits._
    val media = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioWith(media, Multimodal.WavCodec).collect()
    }
    assert(e.getMessage != null)
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
