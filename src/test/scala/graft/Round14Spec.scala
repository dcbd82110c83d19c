package graft

import java.sql.Timestamp

import graft.multimodal.{Codecs, Multimodal}
import graft.streaming.EventStreams

/** Round-14 wave: the streaming media-decode admission gate over the real
  * codecs — payloads are genuinely decoded in-flight, corrupt ones drop
  * with a reason before landing. */
class Round14Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("mediaDecodeGateStream: decodes real containers in-flight, drops corrupt") {
    val bmp = Codecs.encodeBmp(Multimodal.textImage("a small test payload", 25, 16))
    val wav = Codecs.encodeWav(Codecs.Pcm(16000, 1, Array[Short](5, -5, 9)),
      junkChunk = true)
    val truncated = bmp.take(40) // dies in the header parse
    val rle = bmp.clone(); rle(30) = 1 // BI_RLE8: unsupported compression
    val gif = Codecs.encodeGif(3, 2, Array(0x000000, 0xFF0000),
      Array[Byte](0, 1, 0, 1, 0, 1), interlaced = true)
    val mulaw = Codecs.encodeWavMulaw(Array[Byte](0xFF.toByte, 0x80.toByte), 8000, 1)
    // A GIF header whose LZW stream never arrives: a REAL container now,
    // so it must drop as kind "gif" with the decoder's reason — not
    // "unknown" (round-15: GIF dispatch).
    val gifTrunc = "GIF89a-not-supported".getBytes("US-ASCII")
    val garbage = "????no-container-here".getBytes("US-ASCII")
    val jpeg = Codecs.encodeJpeg(Multimodal.blockGrayImage("jpeg gate payload"))
    // SOI then garbage: must drop AS a jpeg with the decoder's reason
    val jpegTrunc = Array[Byte](0xFF.toByte, 0xD8.toByte, 0x00, 0x01)

    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Array[Byte])](spark, 1)
    val q = EventStreams.mediaDecodeGateStream(
        memStream.toDS().toDF("doc_id", "ts", "media"), "doc_id", "media", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("media_gate_out").start()
    try {
      memStream.addData(
        (1L, ts(0), bmp), (2L, ts(1), wav), (3L, ts(2), truncated),
        (4L, ts(3), rle), (5L, ts(4), gifTrunc), (6L, ts(5), gif),
        (7L, ts(6), mulaw), (8L, ts(7), garbage),
        (9L, ts(8), jpeg), (10L, ts(9), jpegTrunc),
        (11L, ts(10), Codecs.encodeGifAnimated(3, 2,
          Array(0x000000, 0xFF0000),
          Seq((Array[Byte](0, 1, 0, 1, 0, 1), false, 5),
            (Array[Byte](1, 0, 1, 0, 1, 0), true, 5)), loops = 0)))
      q.processAllAvailable()
      val got = spark.table("media_gate_out")
        .select($"new_id", $"kind", $"meta_a", $"meta_b", $"admit", $"reason")
        .as[(Long, String, Long, Long, Boolean, String)]
        .collect().map(r => r._1 -> r).toMap
      assert(got(1L) == ((1L, "bmp", 25L, 16L, true, "")),
        s"valid BMP must admit with decoded dims: ${got(1L)}")
      assert(got(2L) == ((2L, "wav", 16000L, 3L, true, "")),
        s"valid WAV must admit with decoded rate/samples: ${got(2L)}")
      assert(!got(3L)._5 && got(3L)._6.contains("truncated"),
        s"truncated BMP must drop naming the failure: ${got(3L)}")
      assert(!got(4L)._5 && got(4L)._6.contains("compression"),
        s"RLE BMP must drop naming the unsupported feature: ${got(4L)}")
      assert(got(5L)._2 == "gif" && !got(5L)._5,
        s"a GIF header without an image must drop AS a gif: ${got(5L)}")
      assert(got(6L) == ((6L, "gif", 3L, 2L, true, "")),
        s"valid interlaced GIF must admit with decoded dims: ${got(6L)}")
      assert(got(7L) == ((7L, "wav", 8000L, 2L, true, "")),
        s"valid mu-law WAV must admit with decoded rate/samples: ${got(7L)}")
      assert(got(8L)._2 == "unknown" && !got(8L)._5,
        s"unrecognized magic must drop as unknown: ${got(8L)}")
      assert(got(9L) == ((9L, "jpeg", 64L, 64L, true, "")),
        s"valid baseline JPEG must admit with decoded dims: ${got(9L)}")
      assert(got(10L)._2 == "jpeg" && !got(10L)._5,
        s"an SOI without a stream must drop AS a jpeg: ${got(10L)}")
      assert(got(11L) == ((11L, "gif", 3L, 2L, true, "")),
        s"an ANIMATED GIF must admit (first frame's dims): ${got(11L)}")
    } finally q.stop()
  }

  test("media gate verdicts equal the batch decode on the same payloads") {
    val docsDf = Seq((10L, "first body of text"), (11L, "second body of text"))
      .toDF("doc_id", "text")
    val media = Multimodal.renderBmpTable(docsDf, 25, 16)
    val batch = Multimodal.decodedImageMeta(media)
      .collect().map(m => m.doc_id -> ((m.width, m.height))).toMap

    val rows = media.collect().map(r => (r.doc_id, ts(r.doc_id), r.media)).toSeq
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Array[Byte])](spark, 1)
    val q = EventStreams.mediaDecodeGateStream(
        memStream.toDS().toDF("doc_id", "ts", "media"), "doc_id", "media", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("media_gate_eq").start()
    try {
      memStream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("media_gate_eq")
        .select($"new_id", $"meta_a", $"meta_b", $"admit")
        .as[(Long, Long, Long, Boolean)].collect()
      assert(got.length == 2 && got.forall(_._4))
      got.foreach { case (id, w, h, _) =>
        assert(batch(id) == ((w, h)), s"stream/batch dims drift for $id")
      }
    } finally q.stop()
  }
}
