package graft

import graft.multimodal.{Codecs, Multimodal}

/** The baseline-JPEG codec (round 15): golden BYTE fixtures hand-assembled
  * from ITU-T T.81 — marker structure, canonical Huffman reconstruction,
  * EXTEND, zigzag, dequantization, and the fixed-point IDCT are each pinned
  * by streams this test packs bit-by-bit (with its OWN literal copies of
  * the zigzag and Annex K tables, so a transcription slip in the codec's
  * constants fails loudly instead of hiding symmetrically). Then the
  * closed-form lossy round trip the m19/m20 oracles lean on, exhaustively;
  * restart markers; byte stuffing; and named scope rejections. */
class JpegSpec extends SparkSpecBase {

  // Independent literal copies (T.81 Figure 5 / Annex K.1) — NOT the
  // codec's constants.
  private val zig = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
  private val qLum = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** A minimal single-block grayscale baseline JPEG: Annex K luminance
    * DQT, Annex K DC-luminance DHT, a two-entry CUSTOM AC DHT (legal —
    * tables live in the file: EOB='0', (run 0, size 2)='10'), and the
    * given hand-packed entropy byte(s). */
  private def goldenGrayJpeg(entropy: Array[Int]): Array[Byte] = {
    val b = collection.mutable.ArrayBuffer[Int]()
    b ++= Seq(0xFF, 0xD8) // SOI
    b ++= Seq(0xFF, 0xDB, 0, 67, 0x00) // DQT, 8-bit, id 0
    b ++= (0 until 64).map(k => qLum(zig(k)))
    b ++= Seq(0xFF, 0xC0, 0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0) // SOF0 8x8 gray
    b ++= Seq(0xFF, 0xC4, 0, 31, 0x00) // DHT class 0 id 0: Annex K DC lum
    b ++= Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    b ++= (0 to 11)
    b ++= Seq(0xFF, 0xC4, 0, 21, 0x10) // DHT class 1 id 0: custom 2-code AC
    b ++= Seq(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    b ++= Seq(0x00, 0x02) // EOB, (run 0, size 2)
    b ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 63, 0) // SOS
    b ++= entropy
    b ++= Seq(0xFF, 0xD9) // EOI
    b.map(_.toByte).toArray
  }

  test("golden DC-only stream decodes to the hand-computed flat block") {
    // '101' (DC cat 4) + '1011' (diff 11) + '0' (EOB) = 0xB6 exactly.
    // Sq=11, R = 11*16 = 176, pixel = 128 + ((176*2896^2 + 2^25) >> 26) = 150.
    val img = Codecs.decodeJpeg(goldenGrayJpeg(Array(0xB6)))
    assert(img.components === 1 && img.restartInterval === 0)
    assert(img.image.width === 8 && img.image.height === 8)
    assert(img.image.rgb.forall(b => (b & 0xFF) == 150))
  }

  test("golden AC stream decodes through zigzag + dequant + IDCT exactly") {
    // '00' (DC cat 0) + '10' ((0,2)) + '10' (+2) + '0' (EOB), padded with
    // one 1-bit = 0x29. Coefficient lands at zigzag position 1 = natural
    // (v=0,u=1), dequantized 2*11 = 22. Expected pixels (python-mirrored
    // integer IDCT, constant down each column):
    val expect = Array(132, 131, 130, 129, 127, 126, 125, 124)
    val img = Codecs.decodeJpeg(goldenGrayJpeg(Array(0x29))).image
    for (y <- 0 until 8; x <- 0 until 8)
      assert((img.rgb((y * 8 + x) * 3) & 0xFF) === expect(x),
        s"pixel ($y,$x)")
  }

  test("flat-block lossy round trip matches the closed form, all 256 levels, both scales") {
    // The m19/m20 oracle arithmetic: qscale 1 -> 2*((v+1)//2) (capped),
    // qscale 2 -> 4*((v+2)//4), via the exact-DC quantizer and the
    // fixed-point IDCT. Exercised through BOTH the grayscale and the
    // YCbCr 4:4:4 paths (R=G=B makes chroma exactly 128 end-to-end).
    for (v <- 0 until 256) {
      val flat = Codecs.Image(8, 8, Array.fill(64 * 3)(v.toByte))
      val g1 = math.min(255, 2 * ((v + 1) / 2))
      val g2 = math.min(255, 4 * ((v + 2) / 4))
      for ((scale, want) <- Seq((1, g1), (2, g2)); gray <- Seq(true, false)) {
        val dec = Codecs.decodeJpeg(Codecs.encodeJpeg(flat, qscale = scale, gray = gray))
        assert(dec.components === (if (gray) 1 else 3))
        assert(dec.image.rgb.forall(b => (b & 0xFF) == want),
          s"v=$v scale=$scale gray=$gray: got ${dec.image.rgb(0) & 0xFF}, want $want")
      }
    }
  }

  test("flat-block FDCT fast path equals the brute-force K-table computation") {
    // The encoder skips the AC loop on flat blocks because the K rows for
    // u >= 1 sum to zero exactly. Pin that equivalence against this
    // test's OWN brute-force mirror of the quantized FDCT, flat and
    // non-flat inputs alike.
    val K = Array(
      Array(2896L, 2896L, 2896L, 2896L, 2896L, 2896L, 2896L, 2896L),
      Array(4017L, 3406L, 2276L, 799L, -799L, -2276L, -3406L, -4017L),
      Array(3784L, 1567L, -1567L, -3784L, -3784L, -1567L, 1567L, 3784L),
      Array(3406L, -799L, -4017L, -2276L, 2276L, 4017L, 799L, -3406L),
      Array(2896L, -2896L, -2896L, 2896L, 2896L, -2896L, -2896L, 2896L),
      Array(2276L, -4017L, 799L, 3406L, -3406L, -799L, 4017L, -2276L),
      Array(1567L, -3784L, 3784L, -1567L, -1567L, 3784L, -3784L, 1567L),
      Array(799L, -2276L, 3406L, -4017L, 4017L, -3406L, 2276L, -799L))
    def brute(s: Array[Int], q: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      out(0) = Math.floorDiv(s.sum + 4 * q(0), 8 * q(0))
      for (v <- 0 until 8; u <- 0 until 8; if u != 0 || v != 0) {
        var num = 0L
        for (y <- 0 until 8; x <- 0 until 8) num += s(y * 8 + x) * K(u)(x) * K(v)(y)
        val qq = q(v * 8 + u).toLong
        out(v * 8 + u) = Math.floorDiv(2 * num + (qq << 26), qq << 27).toInt
      }
      out
    }
    val flat = Array.fill(64)(37)
    val busy = Array.tabulate(64)(i => ((i * 53) % 251) - 128)
    for (s <- Seq(flat, busy)) {
      assert(Codecs.fdctQuant(s, qLum).toSeq === brute(s, qLum).toSeq)
    }
    // and the flat block's AC really is all-zero
    assert(Codecs.fdctQuant(flat, qLum).drop(1).forall(_ == 0))
  }

  test("restart markers: emitted, cycling, predictor-reset, and verified on decode") {
    val img = Multimodal.textImage("restart interval exercise payload", 32, 32)
    val withRst = Codecs.encodeJpeg(img, restartInterval = 2)
    val without = Codecs.encodeJpeg(img)
    assert(!java.util.Arrays.equals(withRst, without))
    // RST0..RST7 cycle: 16 MCUs / 2 = 7 restarts
    val hex = withRst.map(b => f"${b & 0xFF}%02x").mkString
    assert((0 to 6).forall(m => hex.contains(f"ffd$m%x")))
    val a = Codecs.decodeJpeg(withRst)
    val b = Codecs.decodeJpeg(without)
    assert(a.restartInterval === 2 && b.restartInterval === 0)
    assert(java.util.Arrays.equals(a.image.rgb, b.image.rgb),
      "restart segmentation must not change the pixels")
    // corrupt one RST index: the decoder names the desync
    val i = { val s = indexOfMarker(withRst, 0xD1); assert(s > 0); s }
    val bad = withRst.clone(); bad(i) = 0xD5.toByte
    val e = intercept[IllegalArgumentException](Codecs.decodeJpeg(bad))
    assert(e.getMessage.contains("RST") || e.getMessage.contains("marker"))
  }

  private def indexOfMarker(bytes: Array[Byte], m: Int): Int = {
    var i = 2
    while (i < bytes.length - 1) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == m) return i + 1
      i += 1
    }
    -1
  }

  test("byte stuffing: 0xFF in entropy data is stuffed and decodes exactly") {
    // A busy image reliably produces 0xFF bytes in the entropy segment;
    // assert at least one stuffed pair exists AND the stream decodes.
    val img = Multimodal.textImage("the quick brown fox jumps over the lazy dog", 64, 64)
    val enc = Codecs.encodeJpeg(img, qscale = 1)
    val sos = indexOfMarker(enc, 0xDA)
    assert(sos > 0)
    var stuffed = 0
    var i = sos
    while (i < enc.length - 1) {
      if ((enc(i) & 0xFF) == 0xFF && (enc(i + 1) & 0xFF) == 0x00) stuffed += 1
      i += 1
    }
    assert(stuffed > 0, "test image produced no 0xFF entropy bytes — pick a busier payload")
    val dec = Codecs.decodeJpeg(enc)
    assert(dec.image.width === 64 && dec.image.height === 64)
  }

  private def roundTripError(img: Codecs.Image): (Double, Int) = {
    val dec = Codecs.decodeJpeg(Codecs.encodeJpeg(img)).image
    var sumAbs = 0L
    var maxAbs = 0
    for (i <- img.rgb.indices) {
      val d = math.abs((img.rgb(i) & 0xFF) - (dec.rgb(i) & 0xFF))
      sumAbs += d
      maxAbs = math.max(maxAbs, d)
    }
    (sumAbs.toDouble / img.rgb.length, maxAbs)
  }

  test("lossy color round trip stays within the quantization envelope") {
    // textImage is ADVERSARIALLY high-frequency (mod-251 sawtooth red and
    // green) — near-noise for a DCT codec, so the envelope is wide but
    // bounded; a smooth gradient must come back nearly exact.
    val (busyMean, busyMax) =
      roundTripError(Multimodal.textImage("a lossy but bounded reconstruction", 32, 32))
    assert(busyMean < 25.0, s"busy mean abs error $busyMean")
    assert(busyMax < 160, s"busy max abs error $busyMax")
    val smooth = Codecs.Image(32, 32, Array.tabulate(32 * 32 * 3) { p =>
      val i = p / 3
      (64 + (i % 32) * 2 + (i / 32)).toByte // gentle diagonal ramp, R=G=B-ish
    })
    val (smoothMean, smoothMax) = roundTripError(smooth)
    assert(smoothMean < 4.0, s"smooth mean abs error $smoothMean")
    assert(smoothMax < 24, s"smooth max abs error $smoothMax")
  }

  test("non-multiple-of-8 dims: edge-replicated on encode, cropped on decode") {
    val img = Multimodal.textImage("odd dimensions exercise the mcu crop", 13, 9)
    val dec = Codecs.decodeJpeg(Codecs.encodeJpeg(img, gray = true)).image
    assert(dec.width === 13 && dec.height === 9)
  }

  test("golden 4:2:0 MCU: 6-unit interleave, block placement, upsampling") {
    // Hand-packed 16×16 YCbCr 4:2:0 stream: ONE MCU of 6 data units in
    // §A.2.3 order (Y00 Y01 Y10 Y11 Cb Cr), every block flat, all
    // components on quant id 0 (Annex K lum) / DC id 0 (Annex K lum) /
    // the 2-code custom AC table (EOB='0'). Luma DCs quantize to
    // 1,3,5,7 (diffs 1,2,2,2 → '010'+'1', then '011'+'10' ×3), chroma
    // is neutral (cat 0 = '00'); each unit ends with EOB '0':
    //   01010 011100 011100 011100 000 000 + '111' pad
    //   = 0x53 0x8E 0x38 0x07
    // Decoded quadrants (DC·16 through the fixed-point IDCT): 130 top-
    // left, 134 top-right, 138 bottom-left, 142 bottom-right — WHERE a
    // block lands proves the raster unit order; R=G=B proves the 2×2
    // chroma upsample stayed neutral.
    val b = collection.mutable.ArrayBuffer[Int]()
    b ++= Seq(0xFF, 0xD8) // SOI
    b ++= Seq(0xFF, 0xDB, 0, 67, 0x00) // DQT id 0
    b ++= (0 until 64).map(k => qLum(zig(k)))
    b ++= Seq(0xFF, 0xC0, 0, 17, 8, 0, 16, 0, 16, 3, // SOF0 16×16, 3 comp
      1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0) // luma 2×2, chroma 1×1
    b ++= Seq(0xFF, 0xC4, 0, 31, 0x00) // DHT class 0 id 0: Annex K DC lum
    b ++= Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    b ++= (0 to 11)
    b ++= Seq(0xFF, 0xC4, 0, 21, 0x10) // DHT class 1 id 0: 2-code AC
    b ++= Seq(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    b ++= Seq(0x00, 0x02)
    b ++= Seq(0xFF, 0xDA, 0, 12, 3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0) // SOS
    b ++= Seq(0x53, 0x8E, 0x38, 0x07)
    b ++= Seq(0xFF, 0xD9) // EOI
    val dec = Codecs.decodeJpeg(b.map(_.toByte).toArray)
    assert(dec.components === 3 && dec.lumaH === 2 && dec.lumaV === 2)
    assert(dec.image.width === 16 && dec.image.height === 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = (if (y < 8) 130 else 138) + (if (x < 8) 0 else 4)
      val p = (y * 16 + x) * 3
      assert((dec.image.rgb(p) & 0xFF) === want, s"pixel ($y,$x)")
      assert(dec.image.rgb(p + 1) === dec.image.rgb(p) &&
        dec.image.rgb(p + 2) === dec.image.rgb(p), s"chroma at ($y,$x)")
    }
  }

  test("subsampled re-encode of flat blocks decodes pixel-identical to 4:4:4") {
    // blockGrayImage is flat per 8×8 block with neutral chroma, so the
    // chroma box-average is exact and every decoded pixel matches the
    // 4:4:4 encode bit-for-bit — the closed form m25 builds on. The
    // files themselves must differ (different SOF + MCU structure).
    val img = Multimodal.blockGrayImage("subsample closed form", blocks = 4)
    val ref = Codecs.decodeJpeg(Codecs.encodeJpeg(img))
    for ((lh, lv) <- Seq((2, 2), (2, 1), (1, 2))) {
      val enc = Codecs.encodeJpeg(img, lumaH = lh, lumaV = lv)
      assert(!java.util.Arrays.equals(enc, Codecs.encodeJpeg(img)))
      val dec = Codecs.decodeJpeg(enc)
      assert(dec.lumaH === lh && dec.lumaV === lv && dec.components === 3)
      assert(java.util.Arrays.equals(dec.image.rgb, ref.image.rgb),
        s"${lh}x$lv decoded pixels diverged from 4:4:4")
    }
    // 4:4:4 via explicit factors is byte-identical to the default form
    assert(java.util.Arrays.equals(
      Codecs.encodeJpeg(img, lumaH = 1, lumaV = 1), Codecs.encodeJpeg(img)))
    // restart markers segment the 4:2:0 MCU walk too (per-MCU counting,
    // 2×2-grid RSTn placement) without changing the pixels
    val rst = Codecs.decodeJpeg(
      Codecs.encodeJpeg(img, restartInterval = 2, lumaH = 2, lumaV = 2))
    assert(rst.restartInterval === 2 && rst.lumaH === 2)
    assert(java.util.Arrays.equals(rst.image.rgb, ref.image.rgb))
  }

  test("4:2:0 color round trip: flat color exact, busy color bounded") {
    // flat non-gray color: chroma is flat non-neutral, box-average is
    // identity on it, every block DC-only — 4:2:0 must equal 4:4:4
    val flat = Codecs.Image(16, 16, Array.tabulate(16 * 16 * 3)(p =>
      (p % 3 match { case 0 => 200; case 1 => 90; case _ => 40 }).toByte))
    assert(java.util.Arrays.equals(
      Codecs.decodeJpeg(Codecs.encodeJpeg(flat, lumaH = 2, lumaV = 2)).image.rgb,
      Codecs.decodeJpeg(Codecs.encodeJpeg(flat)).image.rgb))
    // busy color: chroma detail is genuinely lost — bounded, not exact
    val busy = Multimodal.textImage("chroma subsampling drops detail", 32, 32)
    val dec = Codecs.decodeJpeg(
      Codecs.encodeJpeg(busy, lumaH = 2, lumaV = 2)).image
    var sumAbs = 0L
    for (i <- busy.rgb.indices)
      sumAbs += math.abs((busy.rgb(i) & 0xFF) - (dec.rgb(i) & 0xFF))
    val mean = sumAbs.toDouble / busy.rgb.length
    assert(mean < 40.0, s"4:2:0 busy mean abs error $mean")
    // dims that are not MCU multiples (20×12 vs 16-px 4:2:0 MCUs) crop back
    val odd = Multimodal.textImage("odd against the 16px mcu grid", 20, 12)
    val oddDec = Codecs.decodeJpeg(Codecs.encodeJpeg(odd, lumaH = 2, lumaV = 2)).image
    assert(oddDec.width === 20 && oddDec.height === 12)
  }

  // ---- progressive (SOF2) goldens ------------------------------------------

  /** A 4-code custom AC DHT legal for both golden families: EOB0 = '0',
    * (0,2) = '10', (0,1) = '110', EOB-run r=1 = '1110'. */
  private val progAcDht: Seq[Int] =
    Seq(0xFF, 0xC4, 0, 23, 0x10,
      1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0x00, 0x02, 0x01, 0x10)

  private val annexKDcDht: Seq[Int] =
    Seq(0xFF, 0xC4, 0, 31, 0x00,
      0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0) ++ (0 to 11)

  private def dqtK: Seq[Int] =
    Seq(0xFF, 0xDB, 0, 67, 0x00) ++ (0 until 64).map(k => qLum(zig(k)))

  test("golden successive-approximation progression decodes exactly") {
    // 8×8 gray, four scans: DC first at Al=1 (5 = 11>>1: '100'+'101'),
    // DC refine (bit 1), AC first at Al=1 (zigzag-1 = 2>>1 = 1:
    // '110'+'1', EOB '0'), AC refine (newly-born zigzag-2 = +1:
    // '110'+sign'1'+correction'0' for the zigzag-1 history, EOB '0').
    // Final coefficients: DC 11, zig1 = 2, zig2 = 1 — the baseline
    // reference stream below codes the same values in one scan, so the
    // two files MUST decode to identical pixels.
    val prog = collection.mutable.ArrayBuffer[Int]()
    prog ++= Seq(0xFF, 0xD8)
    prog ++= dqtK
    prog ++= Seq(0xFF, 0xC2, 0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0) // SOF2 8×8
    prog ++= annexKDcDht
    prog ++= progAcDht
    prog ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 0, 0x01) // DC first Al=1
    prog ++= Seq(0x97) // '100'+'101' + pad
    prog ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 0, 0x10) // DC refine
    prog ++= Seq(0xFF, 0x00) // bit '1' + all-ones pad = 0xFF, stuffed
    prog ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 1, 63, 0x01) // AC first Al=1
    prog ++= Seq(0xD7) // '110'+'1' then EOB '0' + pad
    prog ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 1, 63, 0x10) // AC refine
    prog ++= Seq(0xD3) // '110'+'1'+corr'0' then EOB '0' + pad
    prog ++= Seq(0xFF, 0xD9)
    val base = collection.mutable.ArrayBuffer[Int]()
    base ++= Seq(0xFF, 0xD8)
    base ++= dqtK
    base ++= Seq(0xFF, 0xC0, 0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0)
    base ++= annexKDcDht
    base ++= progAcDht
    base ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 63, 0)
    base ++= Seq(0xB7, 0x5A) // '101'+'1011' | '10'+'10' | '110'+'1' | EOB
    base ++= Seq(0xFF, 0xD9)
    val dp = Codecs.decodeJpeg(prog.map(_.toByte).toArray)
    val db = Codecs.decodeJpeg(base.map(_.toByte).toArray)
    assert(dp.progressive && !db.progressive)
    assert(dp.image.rgb.toSeq === db.image.rgb.toSeq,
      "successive approximation must land on the sequential pixels")
  }

  test("golden EOB-run spans blocks in a progressive AC scan") {
    // 16×8 gray, two blocks, both flat DC=11; AC scan codes zigzag-1=+2
    // in block 1 then an EOB-RUN of 2 ('1110' + extension '0') ending
    // BOTH blocks — the baseline file codes per-block EOBs instead.
    val prog = collection.mutable.ArrayBuffer[Int]()
    prog ++= Seq(0xFF, 0xD8)
    prog ++= dqtK
    prog ++= Seq(0xFF, 0xC2, 0, 11, 8, 0, 8, 0, 16, 1, 1, 0x11, 0) // 16×8
    prog ++= annexKDcDht
    prog ++= progAcDht
    prog ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 0, 0x00) // DC, Al=0
    prog ++= Seq(0xB6, 0x7F) // '101'+'1011' then diff-0 '00' + pad
    prog ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 1, 63, 0x00) // AC
    prog ++= Seq(0xAE, 0x7F) // '10'+'10' then EOBRUN2 '1110'+'0' + pad
    prog ++= Seq(0xFF, 0xD9)
    val base = collection.mutable.ArrayBuffer[Int]()
    base ++= Seq(0xFF, 0xD8)
    base ++= dqtK
    base ++= Seq(0xFF, 0xC0, 0, 11, 8, 0, 8, 0, 16, 1, 1, 0x11, 0)
    base ++= annexKDcDht
    base ++= progAcDht
    base ++= Seq(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 63, 0)
    base ++= Seq(0xB7, 0x41)
    base ++= Seq(0xFF, 0xD9)
    val dp = Codecs.decodeJpeg(prog.map(_.toByte).toArray)
    val db = Codecs.decodeJpeg(base.map(_.toByte).toArray)
    assert(dp.image.width === 16 && dp.progressive)
    assert(dp.image.rgb.toSeq === db.image.rgb.toSeq)
  }

  test("progressive encoder: spectral selection decodes bit-identical to baseline") {
    // the full matrix: gray/color × 4:4:4/4:2:0/4:2:2 × qscales × odd dims
    val img = Multimodal.blockGrayImage("progressive spectral payload")
    val busy = Multimodal.textImage("progressive busy color payload", 25, 16)
    val odd = Multimodal.textImage("odd dims payload", 20, 12)
    for ((label, b, p) <- Seq(
      ("flat gray 4:4:4", Codecs.encodeJpeg(img),
        Codecs.encodeJpegProgressive(img)),
      ("flat gray 1-comp q2", Codecs.encodeJpeg(img, qscale = 2, gray = true),
        Codecs.encodeJpegProgressive(img, qscale = 2, gray = true)),
      ("busy color 4:4:4", Codecs.encodeJpeg(busy),
        Codecs.encodeJpegProgressive(busy)),
      ("busy color 4:2:0", Codecs.encodeJpeg(busy, lumaH = 2, lumaV = 2),
        Codecs.encodeJpegProgressive(busy, lumaH = 2, lumaV = 2)),
      ("busy color 4:2:2", Codecs.encodeJpeg(busy, lumaH = 2, lumaV = 1),
        Codecs.encodeJpegProgressive(busy, lumaH = 2, lumaV = 1)),
      ("odd dims 4:2:0", Codecs.encodeJpeg(odd, lumaH = 2, lumaV = 2),
        Codecs.encodeJpegProgressive(odd, lumaH = 2, lumaV = 2)))) {
      val db = Codecs.decodeJpeg(b); val dp = Codecs.decodeJpeg(p)
      assert(dp.progressive && !db.progressive, label)
      assert(java.util.Arrays.equals(dp.image.rgb, db.image.rgb), label)
    }
  }

  test("truncated progression decodes the scans it has (partial render)") {
    // drop the final AC scan: DC-only progressive renders the flat
    // block means (AC 0), which for a flat-block payload IS the full
    // image — the partial-render property progressive exists for
    val img = Multimodal.blockGrayImage("partial render payload")
    val full = Codecs.encodeJpegProgressive(img, gray = true)
    // find the second SOS (the AC scan) and cut the file there + EOI
    var sos2 = -1; var seen = 0; var i = 2
    while (sos2 < 0 && i < full.length - 1) {
      if ((full(i) & 0xFF) == 0xFF && (full(i + 1) & 0xFF) == 0xDA) {
        seen += 1
        if (seen == 2) sos2 = i
      }
      i += 1
    }
    assert(sos2 > 0)
    val cut = full.take(sos2) ++ Array(0xFF.toByte, 0xD9.toByte)
    val dp = Codecs.decodeJpeg(cut)
    assert(java.util.Arrays.equals(dp.image.rgb,
      Codecs.decodeJpeg(full).image.rgb),
      "a flat-block payload is fully determined by its DC scan")
  }

  test("progressive scan-sequence violations are NAMED") {
    val img = Multimodal.blockGrayImage("sequence guard payload")
    val good = Codecs.encodeJpegProgressive(img, gray = true)
    // SOF2 with a BASELINE-structured scan (Ss=0, Se=63): invalid
    val hybrid = Codecs.encodeJpeg(img, gray = true)
    hybrid(indexOfMarker(hybrid, 0xC0)) = 0xC2.toByte
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(hybrid))
      .getMessage.contains("DC-only"))
    // an AC scan whose component never had its DC-first scan: cut the
    // DC scan out (splice from SOF end to the second SOS)
    var sos1 = indexOfMarker(good, 0xDA) - 1
    var sos2 = -1; var seen = 0; var i = 2
    while (sos2 < 0 && i < good.length - 1) {
      if ((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA) {
        seen += 1
        if (seen == 2) sos2 = i
      }
      i += 1
    }
    val noDc = good.take(sos1) ++ good.drop(sos2)
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(noDc))
      .getMessage.contains("DC-first scan missing"))
  }

  test("scope rejections are NAMED, never mis-decoded") {
    val good = goldenGrayJpeg(Array(0xB6))
    // progressive: flip SOF0 -> SOF2
    val prog = good.clone(); prog(indexOfMarker(good, 0xC0)) = 0xC2.toByte
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(prog))
      .getMessage.contains("progressive"))
    // 16-bit quant table: Pq=1
    val deep = good.clone()
    val dqtAt = indexOfMarker(good, 0xDB)
    deep(dqtAt + 3) = 0x10.toByte
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(deep))
      .getMessage.contains("16-bit"))
    // single-component scans are non-interleaved (§A.2.2): declared
    // sampling factors are inert, so a 2×2-factor grayscale must decode
    // to the SAME pixels as the 1×1 original, not reject
    val sub = good.clone()
    val sofAt = indexOfMarker(good, 0xC0)
    sub(sofAt + 10) = 0x22.toByte
    assert(Codecs.decodeJpeg(sub).image.rgb.toSeq ===
      Codecs.decodeJpeg(good).image.rgb.toSeq)
    // out-of-range sampling factor (H=5): named rejection
    val h5 = good.clone(); h5(sofAt + 10) = 0x51.toByte
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(h5))
      .getMessage.contains("[1,4]"))
    // 3-component SOF whose factors sum past the spec's 10-units-per-MCU
    // bound (§B.2.3): 4×4 luma + 1×1 + 1×1 = 18 units
    val tooMany = collection.mutable.ArrayBuffer[Int]()
    tooMany ++= Seq(0xFF, 0xD8, 0xFF, 0xC0, 0, 17, 8, 0, 8, 0, 8, 3,
      1, 0x44, 0, 2, 0x11, 1, 3, 0x11, 1)
    assert(intercept[IllegalArgumentException](
      Codecs.decodeJpeg(tooMany.map(_.toByte).toArray))
      .getMessage.contains("data units per MCU"))
    // dimension-overflow guard: 65535×65535 would wrap the plane
    // allocation arithmetic — must reject on the pixel cap, not allocate
    val huge = good.clone()
    huge(sofAt + 4) = 0xFF.toByte; huge(sofAt + 5) = 0xFF.toByte
    huge(sofAt + 6) = 0xFF.toByte; huge(sofAt + 7) = 0xFF.toByte
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(huge))
      .getMessage.contains("decode cap"))
    // truncated entropy stream
    val cut = good.dropRight(3)
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(cut))
      .getMessage.toLowerCase.contains("truncat"))
    // not a JPEG at all
    assert(intercept[IllegalArgumentException](Codecs.decodeJpeg(Array[Byte](1, 2, 3)))
      .getMessage.contains("SOI"))
  }

  test("decodeImage dispatches JPEG by its SOI magic") {
    val img = Multimodal.textImage("magic dispatch", 16, 16)
    val viaMagic = Codecs.decodeImage(Codecs.encodeJpeg(img, gray = true))
    assert(viaMagic.width === 16 && viaMagic.height === 16)
  }

  // ---- round 17: EXIF APP1 orientation ----

  test("golden APP1 Exif segment: exact bytes on the wire, tag read back") {
    val img = Multimodal.blockGrayImage("exif golden")
    val b = Codecs.encodeJpeg(img, orientation = 6)
    // SOI(2) + APP0(2+16) = offset 20 for APP1
    val app1 = b.slice(20, 20 + 2 + 34)
    val want = Array[Int](
      0xFF, 0xE1, 0x00, 0x22,                    // marker, length 34
      'E', 'x', 'i', 'f', 0, 0,                  // identifier
      0x49, 0x49, 42, 0, 8, 0, 0, 0,             // II, 42, IFD0 at 8
      1, 0,                                      // one entry
      0x12, 0x01, 3, 0, 1, 0, 0, 0,              // tag 274, SHORT, count 1
      6, 0, 0, 0,                                // value 6, left-justified
      0, 0, 0, 0)                                // no next IFD
      .map(_.toByte)
    assert(app1.toSeq === want.toSeq, "APP1 byte layout drifted")
    assert(Codecs.decodeJpeg(b).orientation === 6)
    // orientation 1 writes NO APP1 (byte-stable with pre-round-17 output)
    assert((Codecs.encodeJpeg(img)(21) & 0xFF) !== 0xE1)
    assert(Codecs.decodeJpeg(Codecs.encodeJpeg(img)).orientation === 1)
  }

  test("big-endian (MM) EXIF parses identically") {
    val img = Multimodal.blockGrayImage("exif mm")
    val b = Codecs.encodeJpeg(img, orientation = 7)
    // rewrite the little-endian TIFF body as its big-endian equivalent
    val t = 20 + 2 + 2 + 6 // APP1 marker+len+Exif\0\0 → TIFF origin at 30
    def put(off: Int, v: Seq[Int]): Unit =
      v.zipWithIndex.foreach { case (x, i) => b(t + off + i) = x.toByte }
    put(0, Seq(0x4D, 0x4D, 0, 42, 0, 0, 0, 8)) // MM, 42, IFD0 at 8
    put(8, Seq(0, 1))                          // one entry
    put(10, Seq(0x01, 0x12, 0, 3, 0, 0, 0, 1)) // tag, SHORT, count 1
    put(18, Seq(0, 7, 0, 0))                   // value 7
    put(22, Seq(0, 0, 0, 0))
    assert(Codecs.decodeJpeg(b).orientation === 7)
  }

  test("all 8 orientations: inverse round trip and decode-normalize equality") {
    // an asymmetric image: every pixel distinct, so any transform slip
    // (axis swap, off-by-one mirror) changes pixels
    val base = Multimodal.blockGrayImage("asymmetric orientation payload!")
    val decodedBase = Codecs.decodeJpeg(Codecs.encodeJpeg(base)).image
    for (o <- 1 to 8) {
      val inv = Codecs.inverseOrientation(o)
      val stored = Codecs.applyOrientation(base, inv)
      // pure-transform inverse property
      val back = Codecs.applyOrientation(stored, o)
      assert(back.width === base.width && back.height === base.height)
      assert(java.util.Arrays.equals(back.rgb, base.rgb),
        s"applyOrientation($o) does not invert applyOrientation($inv)")
      // the m29 construction at unit level: encode the pre-transformed
      // pixels with the tag, decode, normalize — EXACTLY the base decode
      // (flat blocks: the lossy round trip commutes with the transform)
      val jpg = Codecs.decodeJpeg(Codecs.encodeJpeg(stored, orientation = o))
      assert(jpg.orientation === o)
      val normalized = Codecs.applyOrientation(jpg.image, jpg.orientation)
      assert(java.util.Arrays.equals(normalized.rgb, decodedBase.rgb),
        s"orientation $o: normalized decode != base decode")
    }
  }

  test("orientation transforms on a NON-square image swap dims correctly") {
    val img = Multimodal.textImage("wide not square", 25, 16)
    for (o <- 5 to 8) {
      val t = Codecs.applyOrientation(img, o)
      assert(t.width === 16 && t.height === 25, s"orientation $o dims")
      assert(java.util.Arrays.equals(
        Codecs.applyOrientation(t, Codecs.inverseOrientation(o)).rgb, img.rgb),
        s"orientation $o non-square inverse")
    }
    for (o <- 2 to 4)
      assert(Codecs.applyOrientation(img, o).width === 25)
  }

  test("decodeImage returns the DISPLAY image: orientation applied at dispatch") {
    // a NON-square flat-block image (24×16, 3×2 blocks of 8): flat blocks
    // make the lossy round trip commute with the rotation, non-square
    // dims make a missed dim-swap loud
    val rgb = new Array[Byte](24 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 24) {
      val v = (40 + 20 * ((y / 8) * 3 + x / 8)).toByte
      val p = (y * 24 + x) * 3
      rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
    }
    val base = Codecs.Image(24, 16, rgb)
    val stored = Codecs.applyOrientation(base, Codecs.inverseOrientation(6))
    val viaDispatch = Codecs.decodeImage(Codecs.encodeJpeg(stored, orientation = 6))
    // dims un-swap back to the display geometry…
    assert(viaDispatch.width === 24 && viaDispatch.height === 16)
    // …and the pixels equal the plain decode of the UNROTATED encode
    val plain = Codecs.decodeImage(Codecs.encodeJpeg(base))
    assert(java.util.Arrays.equals(viaDispatch.rgb, plain.rgb),
      "dispatch must normalize orientation so generic consumers see display pixels")
  }

  test("malformed EXIF is rejected by NAME, never silently garbled") {
    val img = Multimodal.blockGrayImage("exif malformed")
    val good = Codecs.encodeJpeg(img, orientation = 3)
    val t = 30 // TIFF origin (see the MM test)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    def msgOf(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Codecs.decodeJpeg(b)).getMessage
    assert(msgOf(mutated(b => b(t) = 'X')).contains("byte-order"))
    assert(msgOf(mutated(b => b(t + 2) = 43)).contains("magic"))
    // IFD0 offset pointing past the segment
    assert(msgOf(mutated(b => b(t + 4) = 0x7F)).contains("IFD0 offset"))
    // entry count larger than the segment can hold
    assert(msgOf(mutated(b => b(t + 8) = 0x40)).contains("runs past"))
    // orientation value 9
    assert(msgOf(mutated(b => b(t + 18) = 9)).contains("[1,8]"))
    // orientation typed LONG instead of SHORT
    assert(msgOf(mutated(b => b(t + 12) = 4)).contains("single SHORT"))
    // a non-Exif APP1 (XMP-style) is OPAQUE: garbage inside is skipped
    val xmp = mutated { b =>
      b(24) = 'X'; b(25) = 'M'; b(26) = 'P'; b(27) = 0; b(28) = 0x7F.toByte
    }
    assert(Codecs.decodeJpeg(xmp).orientation === 1)
  }
}
