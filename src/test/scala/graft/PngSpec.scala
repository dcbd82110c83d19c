package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.multimodal.{Codecs, Multimodal}
import graft.streaming.EventStreams

/** The PNG codec (round 15): golden FILTERED-scanline fixtures hand-computed
  * from the public PNG specification (filter types 0–4 incl. the Paeth
  * predictor), assembled into real chunked+CRC'd+deflated files — so a
  * symmetric encoder+decoder deviation from the spec'd filter arithmetic
  * cannot hide behind a round-trip test. Then scope-honesty errors,
  * cross-codec pixel identity vs BMP, and the streaming-gate drive. */
class PngSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- test-side chunk assembly (layout per the public spec) ---------------

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream
    val tmp = new Array[Byte](4096)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def ihdr(w: Int, h: Int, colorType: Int, bitDepth: Int = 8,
                   interlace: Int = 0): Array[Byte] =
    ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h).put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()

  private val signature = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def assemble(parts: Array[Byte]*): Array[Byte] =
    signature ++ parts.flatten

  // ---- golden filtered bytes -------------------------------------------------
  //
  // A 2x6 RGB image: six rows so the encoder's row-cycling rule
  // (filter = row mod 5) exercises None/Sub/Up/Average/Paeth and wraps.
  // Raw scanlines (R,G,B per pixel):
  private val goldenRaw: Array[Byte] = Array[Int](
    10, 20, 30, 40, 50, 60, // row 0
    15, 25, 35, 45, 55, 65, // row 1
    20, 30, 40, 50, 60, 70, // row 2
    100, 0, 200, 50, 60, 70, // row 3
    110, 10, 210, 60, 70, 80, // row 4
    0, 0, 0, 255, 255, 255 // row 5
  ).map(_.toByte)

  // Filtered by hand per the spec: each row prefixed by its filter type.
  //  row 0 None:    bytes unchanged
  //  row 1 Sub:     x >= 3 subtracts the byte one PIXEL left
  //  row 2 Up:      subtracts the reconstructed prior row
  //  row 3 Average: subtracts floor((left + up) / 2), left = 0 for x < 3
  //  row 4 Paeth:   subtracts the Paeth predictor (ties break left, up, upleft)
  //  row 5 None:    the cycle wraps (5 mod 5 = 0)
  private val goldenFiltered: Array[Byte] = Array[Int](
    0, 10, 20, 30, 40, 50, 60,
    1, 15, 25, 35, 30, 30, 30,
    2, 5, 5, 5, 5, 5, 5,
    3, 90, 241, 180, 231, 30, 191,
    4, 10, 10, 10, 10, 10, 10,
    0, 0, 0, 0, 255, 255, 255
  ).map(_.toByte)

  test("hand-filtered golden scanlines decode to the raw pixels (all 5 filters)") {
    val png = assemble(chunk("IHDR", ihdr(2, 6, 2)),
      chunk("IDAT", deflate(goldenFiltered)), chunk("IEND", Array.empty))
    val out = Codecs.decodePng(png)
    assert(out.colorType === 2)
    assert(out.image.width === 2 && out.image.height === 6)
    assert(out.image.rgb.toSeq === goldenRaw.toSeq,
      "unfiltering must reproduce the hand-derived raw bytes")
  }

  test("the encoder's filtered stream equals the hand-computed golden bytes") {
    val img = Codecs.Image(2, 6, goldenRaw.clone())
    val png = Codecs.encodePng(img)
    // Walk the encoder's chunks test-side, concatenate IDATs, inflate.
    val buf = ByteBuffer.wrap(png).order(ByteOrder.BIG_ENDIAN)
    var off = 8
    val idat = new java.io.ByteArrayOutputStream
    var idatChunks = 0
    while (off < png.length) {
      val len = buf.getInt(off)
      val typ = new String(png, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") { idat.write(png, off + 8, len); idatChunks += 1 }
      off += 12 + len
    }
    assert(idatChunks === 2, "the encoder must split IDAT (concatenation is spec'd)")
    val inf = new java.util.zip.Inflater
    inf.setInput(idat.toByteArray)
    val filtered = new Array[Byte](goldenFiltered.length)
    var got = 0
    while (got < filtered.length && !inf.finished())
      got += inf.inflate(filtered, got, filtered.length - got)
    inf.end()
    assert(got === goldenFiltered.length)
    assert(filtered.toSeq === goldenFiltered.toSeq,
      "the encoder's filter arithmetic must match the hand-derived bytes")
  }

  test("RGB and RGBA round-trip; RGBA carries a data-bearing alpha through filters") {
    val img = Multimodal.textImage("pixels for the png round trip claim", 25, 16)
    val rgb = Codecs.decodePng(Codecs.encodePng(img))
    assert(rgb.colorType === 2 && rgb.image.rgb.toSeq === img.rgb.toSeq)
    val rgba = Codecs.decodePng(Codecs.encodePng(img, rgba = true))
    assert(rgba.colorType === 6 && rgba.image.rgb.toSeq === img.rgb.toSeq)
    assert(!java.util.Arrays.equals(
      Codecs.encodePng(img), Codecs.encodePng(img, rgba = true)))
  }

  test("golden GRAYSCALE stream (color type 0): 1-byte-pixel filters, replication") {
    // 2×6 gray values, hand-filtered with the row-cycling rule at bpp=1
    // (left = previous BYTE — arithmetic a truecolor file never hits):
    //   r0 None: 10,200 | r1 Sub: 20,10 | r2 Up: 10,10
    //   r3 Average: 100−(0+30)/2=85, 90−(100+40)/2=20
    //   r4 Paeth: 7−100=163 (up wins), 250−7=243 (left wins) | r5 None: 0,255
    val grays = Array(10, 200, 20, 30, 30, 40, 100, 90, 7, 250, 0, 255)
    val goldenGrayFiltered = Array[Int](
      0, 10, 200, 1, 20, 10, 2, 10, 10, 3, 85, 20, 4, 163, 243, 0, 0, 255)
      .map(_.toByte)
    val file = assemble(chunk("IHDR", ihdr(2, 6, 0)),
      chunk("IDAT", deflate(goldenGrayFiltered)), chunk("IEND", Array.empty))
    val dec = Codecs.decodePng(file)
    assert(dec.colorType === 0)
    for (i <- grays.indices; ch <- 0 until 3)
      assert((dec.image.rgb(i * 3 + ch) & 0xFF) === grays(i), s"pixel $i ch $ch")
    // encoder round trip: same pixels, and the encoder produces the
    // same filtered bytes (shared row-cycling discipline)
    val img = Codecs.Image(2, 6,
      grays.flatMap(v => Array(v.toByte, v.toByte, v.toByte)))
    val rt = Codecs.decodePng(Codecs.encodePngGray(img))
    assert(rt.colorType === 0 && rt.image.rgb.toSeq === img.rgb.toSeq)
    // non-gray input is rejected, not averaged
    val colored = img.rgb.clone(); colored(1) = 99.toByte
    assert(intercept[IllegalArgumentException](
      Codecs.encodePngGray(Codecs.Image(2, 6, colored)))
      .getMessage.contains("R=G=B"))
  }

  test("golden PALETTE stream (color type 3): PLTE lookup, index validation") {
    // 3×2 indices into a 4-entry palette; r0 None: 0,1,2;
    // r1 Sub: 3−0=3, 3−3=0, 0−3=253
    val palette = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x123456)
    val plteBytes = palette.flatMap(c =>
      Array(((c >> 16) & 0xFF).toByte, ((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte))
    val goldenIdxFiltered = Array[Int](0, 0, 1, 2, 1, 3, 0, 253).map(_.toByte)
    val file = assemble(chunk("IHDR", ihdr(3, 2, 3)), chunk("PLTE", plteBytes),
      chunk("IDAT", deflate(goldenIdxFiltered)), chunk("IEND", Array.empty))
    val dec = Codecs.decodePng(file)
    assert(dec.colorType === 3 && dec.image.width === 3 && dec.image.height === 2)
    val wantIdx = Array(0, 1, 2, 3, 3, 0)
    for (i <- wantIdx.indices) {
      val c = palette(wantIdx(i))
      assert((dec.image.rgb(i * 3) & 0xFF) === ((c >> 16) & 0xFF), s"R of $i")
      assert((dec.image.rgb(i * 3 + 1) & 0xFF) === ((c >> 8) & 0xFF), s"G of $i")
      assert((dec.image.rgb(i * 3 + 2) & 0xFF) === (c & 0xFF), s"B of $i")
    }
    // encoder round trip through encodePngPalette
    val indices = wantIdx.map(_.toByte)
    val rt = Codecs.decodePng(Codecs.encodePngPalette(3, 2, palette, indices))
    assert(rt.colorType === 3 && rt.image.rgb.toSeq === dec.image.rgb.toSeq)
    // an index past the FILE's PLTE is rejected by the decoder
    val shortPlte = plteBytes.take(9) // 3 entries, index 3 now invalid
    val bad = assemble(chunk("IHDR", ihdr(3, 2, 3)), chunk("PLTE", shortPlte),
      chunk("IDAT", deflate(goldenIdxFiltered)), chunk("IEND", Array.empty))
    assert(intercept[IllegalArgumentException](Codecs.decodePng(bad))
      .getMessage.contains("outside"))
    // PLTE after IDAT violates the spec's chunk ordering
    val misordered = assemble(chunk("IHDR", ihdr(3, 2, 3)),
      chunk("IDAT", deflate(goldenIdxFiltered)), chunk("PLTE", plteBytes),
      chunk("IEND", Array.empty))
    assert(intercept[IllegalArgumentException](Codecs.decodePng(misordered))
      .getMessage.contains("PLTE"))
    // encoder validates indices against ITS palette up front
    assert(intercept[IllegalArgumentException](
      Codecs.encodePngPalette(3, 2, palette.take(3), indices))
      .getMessage.contains("out of range"))
  }

  test("golden Adam7 stream (4×4 gray): pass geometry and scatter order") {
    // w=h=4 leaves five non-empty passes — 1:(0,0); 4:(2,0); 5:(0,2),
    // (2,2); 6:(1,0),(3,0),(1,2),(3,2); 7: rows 1 and 3 — each pass its
    // own None-filtered scanlines. Pixel value = y·16 + x, so a single
    // misplaced pass or swapped scatter stride is visible.
    def v(y: Int, x: Int): Int = y * 16 + x
    val stream = Array[Int](
      0, v(0, 0), // pass 1
      0, v(0, 2), // pass 4
      0, v(2, 0), v(2, 2), // pass 5
      0, v(0, 1), v(0, 3), // pass 6 row 0
      0, v(2, 1), v(2, 3), // pass 6 row 1
      0, v(1, 0), v(1, 1), v(1, 2), v(1, 3), // pass 7 row 0
      0, v(3, 0), v(3, 1), v(3, 2), v(3, 3) // pass 7 row 1
    ).map(_.toByte)
    val ihdrA = {
      val b = ihdr(4, 4, 0)
      b(12) = 1 // interlace: Adam7
      b
    }
    val file = assemble(chunk("IHDR", ihdrA),
      chunk("IDAT", deflate(stream)), chunk("IEND", Array.empty))
    val dec = Codecs.decodePng(file)
    assert(dec.interlaced && dec.colorType === 0)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((dec.image.rgb((y * 4 + x) * 3) & 0xFF) === v(y, x), s"($y,$x)")
  }

  test("Adam7 round trip per color type: pixel-identical, byte-different") {
    // 16×16 so pass 7 has 8 rows — the row-cycling filters wrap inside
    // one pass, and filters must never cross a pass boundary
    val img = Multimodal.textImage("adam7 interlace payload here", 16, 16)
    for ((label, seq, adam) <- Seq[(String, Array[Byte], Array[Byte])](
      ("rgb", Codecs.encodePng(img), Codecs.encodePng(img, interlaced = true)),
      ("rgba", Codecs.encodePng(img, rgba = true),
        Codecs.encodePng(img, rgba = true, interlaced = true)))) {
      assert(!java.util.Arrays.equals(seq, adam), label)
      val ds = Codecs.decodePng(seq); val da = Codecs.decodePng(adam)
      assert(da.interlaced && !ds.interlaced, label)
      assert(java.util.Arrays.equals(da.image.rgb, ds.image.rgb), label)
    }
    // gray + palette variants through their own encoders
    val grayImg = {
      val tb = "gray adam7".getBytes("US-ASCII")
      Codecs.Image(16, 16, Array.tabulate(16 * 16 * 3)(p => tb((p / 3) % tb.length)))
    }
    val dg = Codecs.decodePng(Codecs.encodePngGray(grayImg, interlaced = true))
    assert(dg.interlaced && dg.image.rgb.toSeq ===
      Codecs.decodePng(Codecs.encodePngGray(grayImg)).image.rgb.toSeq)
    val idx = Array.tabulate(16 * 16)(i => (i % 100).toByte)
    val pal = Array.tabulate(100)(k => k << 8 | (255 - k))
    val dp = Codecs.decodePng(Codecs.encodePngPalette(16, 16, pal, idx, interlaced = true))
    assert(dp.interlaced && dp.image.rgb.toSeq ===
      Codecs.decodePng(Codecs.encodePngPalette(16, 16, pal, idx)).image.rgb.toSeq)
    // tiny image where several passes are EMPTY (1×1: only pass 1)
    val one = Codecs.Image(1, 1, Array[Byte](5, 5, 5))
    val d1 = Codecs.decodePng(Codecs.encodePngGray(one, interlaced = true))
    assert(d1.image.rgb.toSeq === Seq[Byte](5, 5, 5))
  }

  test("per-chunk CRC is verified, not decorative") {
    val png = Codecs.encodePng(Codecs.Image(2, 6, goldenRaw.clone()))
    val bad = png.clone()
    // Flip one bit inside the first IDAT's data (offset: 8 sig + 25 IHDR + 8).
    bad(8 + 25 + 8) = (bad(8 + 25 + 8) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](Codecs.decodePng(bad))
    assert(e.getMessage.contains("CRC"), s"got: ${e.getMessage}")
  }

  test("PNG decode names unsupported features instead of emitting garbage") {
    def png(header: Array[Byte]): Array[Byte] =
      assemble(chunk("IHDR", header),
        chunk("IDAT", deflate(goldenFiltered)), chunk("IEND", Array.empty))
    // gray+alpha (4) stays out of scope; palette (3) without its PLTE
    // names the missing chunk, not a garbage decode
    assert(intercept[IllegalArgumentException](
      Codecs.decodePng(png(ihdr(2, 6, 4)))).getMessage.contains("color type"))
    assert(intercept[IllegalArgumentException](
      Codecs.decodePng(png(ihdr(2, 6, 3)))).getMessage.contains("PLTE"))
    assert(intercept[IllegalArgumentException](
      Codecs.decodePng(png(ihdr(2, 6, 2, bitDepth = 16))))
      .getMessage.contains("bit depth"))
    // Adam7 (1) is supported since round 16; method 2 is not a thing
    assert(intercept[IllegalArgumentException](
      Codecs.decodePng(png(ihdr(2, 6, 2, interlace = 2))))
      .getMessage.contains("interlace"))
    assert(intercept[IllegalArgumentException](
      Codecs.decodePng("not a png at all".getBytes))
      .getMessage.contains("signature"))
  }

  test("pixel-stream size must match IHDR exactly — no silent crop or pad") {
    // Same 6-row stream, but the header claims 5 rows: the inflate probe
    // must reject the surplus instead of cropping.
    val lying = assemble(chunk("IHDR", ihdr(2, 5, 2)),
      chunk("IDAT", deflate(goldenFiltered)), chunk("IEND", Array.empty))
    assert(intercept[IllegalArgumentException](Codecs.decodePng(lying))
      .getMessage.contains("expected"))
    // And a truncated stream (header claims 7 rows) must also fail.
    val short = assemble(chunk("IHDR", ihdr(2, 7, 2)),
      chunk("IDAT", deflate(goldenFiltered)), chunk("IEND", Array.empty))
    assert(intercept[IllegalArgumentException](Codecs.decodePng(short))
      .getMessage.contains("expected"))
  }

  test("an invalid filter type is rejected by row") {
    val bad = goldenFiltered.clone(); bad(0) = 5
    val png = assemble(chunk("IHDR", ihdr(2, 6, 2)),
      chunk("IDAT", deflate(bad)), chunk("IEND", Array.empty))
    assert(intercept[IllegalArgumentException](Codecs.decodePng(png))
      .getMessage.contains("filter type"))
  }

  test("ancillary chunks are walked over (CRC-checked) without affecting pixels") {
    val text = ("Software\u0000graft").getBytes("ISO-8859-1")
    val png = assemble(chunk("IHDR", ihdr(2, 6, 2)), chunk("tEXt", text),
      chunk("IDAT", deflate(goldenFiltered)), chunk("IEND", Array.empty))
    assert(Codecs.decodePng(png).image.rgb.toSeq === goldenRaw.toSeq)
  }

  test("cross-codec: BMP and PNG of the same pixels decode to the same grid") {
    val img = Multimodal.textImage("the same pixels in two containers", 25, 16)
    val viaBmp = Codecs.decodeImage(Codecs.encodeBmp(img))
    val viaPng = Codecs.decodeImage(Codecs.encodePng(img, rgba = true))
    assert(viaBmp.rgb.toSeq === viaPng.rgb.toSeq)
    assert(intercept[IllegalArgumentException](
      Codecs.decodeImage("JFIF....".getBytes)).getMessage.contains("magic"))
  }

  // ---- round-15 hardening guards (ADVICE items) -----------------------------

  test("BMP pixel offset below the header end is rejected, not decoded as pixels") {
    val bytes = Codecs.encodeBmp(Codecs.Image(3, 1, new Array[Byte](9)))
    val bad = bytes.clone(); bad(10) = 20 // points inside BITMAPINFOHEADER
    assert(intercept[IllegalArgumentException](Codecs.decodeBmp(bad))
      .getMessage.contains("inside the headers"))
  }

  test("WAV chunk size near Int.MaxValue fails the bound check (Long arithmetic)") {
    val wav = Codecs.encodeWav(Codecs.Pcm(8000, 1, Array[Short](1, -2)))
    val bad = wav.clone()
    // fmt chunk size field at offset 16: 0x7FFFFFF0 would overflow an Int sum.
    bad(16) = 0xF0.toByte; bad(17) = 0xFF.toByte
    bad(18) = 0xFF.toByte; bad(19) = 0x7F.toByte
    val e = intercept[IllegalArgumentException](Codecs.decodeWav(bad))
    assert(e.getMessage.contains("truncated"), s"got: ${e.getMessage}")
  }

  test("the media gate admits PNG payloads and drops corrupt ones with a reason") {
    val img = Multimodal.textImage("gate payload for the png branch", 25, 16)
    val png = Codecs.encodePng(img)
    val corrupt = png.clone()
    corrupt(8 + 25 + 8) = (corrupt(8 + 25 + 8) ^ 0x01).toByte // IDAT bit flip
    def ts(i: Long) = new Timestamp(1700000000000L + i * 1000)
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Array[Byte])](spark, 1)
    val q = EventStreams.mediaDecodeGateStream(
        memStream.toDS().toDF("doc_id", "ts", "media"), "doc_id", "media", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("png_gate_out").start()
    try {
      memStream.addData((1L, ts(0), png), (2L, ts(1), corrupt))
      q.processAllAvailable()
      val got = spark.table("png_gate_out")
        .select($"new_id", $"kind", $"meta_a", $"meta_b", $"admit", $"reason")
        .as[(Long, String, Long, Long, Boolean, String)]
        .collect().map(r => r._1 -> r).toMap
      assert(got(1L) == ((1L, "png", 25L, 16L, true, "")),
        s"valid PNG must admit with decoded dims: ${got(1L)}")
      assert(got(2L)._2 == "png" && !got(2L)._5 && got(2L)._6.contains("CRC"),
        s"corrupt PNG must drop naming the CRC failure: ${got(2L)}")
    } finally q.stop()
  }

  test("decodedPngMeta reads channels from the IHDR and features from pixels") {
    val d = Seq((2L, "even id gets the rgba encoding"),
      (3L, "odd id gets plain truecolor")).toDF("doc_id", "text")
    val metas = Multimodal.decodedPngMeta(Multimodal.renderPngTable(d, 25, 16))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(2L).channels === 4L && metas(3L).channels === 3L)
    assert(metas(2L).width === 25 && metas(2L).height === 16)
    assert(metas(2L).blue_sum > 0 && metas(2L).dhash != 0L)
    // The dHash must agree with the BMP-side dHash of the same pixels —
    // the cross-codec fingerprint claim.
    val bmpHash = Multimodal.decodedDHash(Multimodal.renderBmpTable(d, 25, 16))
      .select($"doc_id", $"dhash").as[(Long, Long)].collect().toMap
    assert(metas(2L).dhash === bmpHash(2L) && metas(3L).dhash === bmpHash(3L))
  }

  test("codepoint-domain render: non-ASCII text folds, ASCII is identity") {
    // The round-16 convention replacing the hard printable-ASCII reject:
    // codepoints fold into 32..126 via 32 + floorMod(cp − 32, 95), the
    // identity on printable ASCII and total on any corpus. 'é' is U+00E9
    // (233): 32 + (233 − 32) % 95 = 32 + 11 = 43. A tab (9) folds to
    // 32 + floorMod(−23, 95) = 32 + 72 = 104.
    val ascii = Multimodal.textImage("cafe", 25, 16)
    val folded = Multimodal.textImage("café", 25, 16)
    // pixel 3's blue channel reads codepoint 4 of the payload
    assert((folded.rgb(3 * 3 + 2) & 0xFF) === 43)
    // the ASCII prefix renders identically under both regimes
    assert((0 until 3).forall(i => folded.rgb(i * 3 + 2) === ascii.rgb(i * 3 + 2)))
    val pcm = Multimodal.textPcm(1L, "tab\there")
    // sample 3 reads the tab -> folded 104 -> (104 − 96)·512 + 3
    assert(pcm.samples(3) === ((104 - 96) * 512 + 3).toShort)
    // surrogate-pair codepoints count ONCE (matching DuckDB's len/substr):
    // "a😀b" is 3 codepoints — a, U+1F600, b
    val emoji = Multimodal.textImage("a😀b", 25, 16)
    // U+1F600 = 128512: 32 + (128512 − 32) % 95 = 32 + (128480 % 95)
    val want = 32 + ((128512 - 32) % 95)
    assert((emoji.rgb(1 * 3 + 2) & 0xFF) === want)
    assert((emoji.rgb(2 * 3 + 2) & 0xFF) === 'b'.toInt)
    // still non-empty-only
    assert(intercept[IllegalArgumentException](
      Multimodal.textImage("", 2, 2)).getMessage.contains("non-empty"))
  }

  test("a non-ASCII corpus renders and decodes through the real containers") {
    import spark.implicits._
    val docs = Seq((0L, "naïve café ☕ résumé"), (1L, "日本語のテキスト"),
      (2L, "mixed ascii and 😀")).toDF("doc_id", "text")
    // every render family must produce decodable files, not throw
    val png = Multimodal.renderPngTableMixed(docs, 25, 16).collect()
    png.foreach(r => Codecs.decodePng(r.media))
    val gif = Multimodal.renderGifTable(docs, 25, 16).collect()
    gif.foreach(r => Codecs.decodeGif(r.media))
    val jpg = Multimodal.renderJpegTable(docs).collect()
    jpg.foreach(r => Codecs.decodeJpeg(r.media))
    val wav = Multimodal.renderWavTable(docs).collect()
    wav.foreach(r => Codecs.decodeWav(r.media))
  }
}
