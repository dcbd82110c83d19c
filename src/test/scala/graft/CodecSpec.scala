package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Codecs, Multimodal}

/** The real-codec layer (round 14): golden BYTE fixtures hand-assembled
  * from the public BMP and RIFF/WAVE specifications — these pin the file
  * layouts independently of the encoder, so a symmetric encode+decode
  * deviation (e.g. both sides agreeing on top-down rows, or RGB instead
  * of BGR) cannot hide behind a round-trip test. Then round-trips,
  * scope-honesty errors, and the decoded-domain pipeline drives. */
class CodecSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- BMP golden bytes -----------------------------------------------------
  //
  // A 2x2 24-bit bottom-up BMP, byte-by-byte per the published layout:
  // 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER + two 8-byte rows
  // (6 pixel bytes padded to 8). Image rows (top-down, RGB):
  //   (0,0) red   (0,1) green
  //   (1,0) blue  (1,1) white
  // File stores the BOTTOM row first, each pixel as B,G,R.
  private val goldenBmp: Array[Byte] = Array[Int](
    'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
    40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0, // info: 2x2, 1 plane, 24bpp
    0, 0, 0, 0, 16, 0, 0, 0, // BI_RGB, 16 pixel bytes
    0x13, 0x0B, 0, 0, 0x13, 0x0B, 0, 0, // 2835 px/m (72 dpi) x and y
    0, 0, 0, 0, 0, 0, 0, 0, // no palette
    // row 1 of the image (bottom, stored first): blue, white, pad
    255, 0, 0, 255, 255, 255, 0, 0,
    // row 0 of the image (top, stored last): red, green, pad
    0, 0, 255, 0, 255, 0, 0, 0
  ).map(_.toByte)

  test("golden BMP bytes decode to the spec'd pixels (bottom-up, BGR, padded)") {
    val img = Codecs.decodeBmp(goldenBmp)
    assert(img.width === 2 && img.height === 2)
    def px(r: Int, c: Int) = {
      val p = (r * 2 + c) * 3
      (img.rgb(p) & 0xFF, img.rgb(p + 1) & 0xFF, img.rgb(p + 2) & 0xFF)
    }
    assert(px(0, 0) === ((255, 0, 0)), "top-left must be red")
    assert(px(0, 1) === ((0, 255, 0)), "top-right must be green")
    assert(px(1, 0) === ((0, 0, 255)), "bottom-left must be blue")
    assert(px(1, 1) === ((255, 255, 255)), "bottom-right must be white")
  }

  test("the encoder reproduces the golden bytes exactly") {
    val img = Codecs.Image(2, 2, Array[Int](
      255, 0, 0, 0, 255, 0, // row 0: red, green
      0, 0, 255, 255, 255, 255 // row 1: blue, white
    ).map(_.toByte))
    assert(java.util.Arrays.equals(Codecs.encodeBmp(img), goldenBmp))
  }

  test("top-down and bottom-up encodings differ in bytes, agree in pixels") {
    val img = Multimodal.textImage("the quick brown fox jumps over it", 25, 16)
    val up = Codecs.encodeBmp(img)
    val down = Codecs.encodeBmp(img, topDown = true)
    assert(!java.util.Arrays.equals(up, down))
    assert(Codecs.decodeBmp(up).rgb.toSeq === Codecs.decodeBmp(down).rgb.toSeq)
    assert(Codecs.decodeBmp(up).rgb.toSeq === img.rgb.toSeq)
  }

  test("BMP decode names unsupported features instead of emitting garbage") {
    val img = Codecs.Image(3, 1, new Array[Byte](9))
    val bytes = Codecs.encodeBmp(img)
    val bad4bpp = bytes.clone(); bad4bpp(28) = 4
    assert(intercept[IllegalArgumentException](Codecs.decodeBmp(bad4bpp))
      .getMessage.contains("bit depth"))
    val badRle = bytes.clone(); badRle(30) = 1
    assert(intercept[IllegalArgumentException](Codecs.decodeBmp(badRle))
      .getMessage.contains("compression"))
    assert(intercept[IllegalArgumentException](
      Codecs.decodeBmp(bytes.take(60))).getMessage.contains("truncated"))
    assert(intercept[IllegalArgumentException](
      Codecs.decodeBmp("PNGish".getBytes)).getMessage.contains("magic"))
  }

  test("8-bit palette BMP decodes through the palette (BGRA quads, bottom-up)") {
    // 3x2 indexed image over a 3-color palette; indices row-major top-down.
    val palette = Array(0xFF0000, 0x00FF00, 0x0000FF) // red, green, blue
    val indices = Array[Byte](0, 1, 2, 2, 1, 0)
    val bytes = Codecs.encodeBmpIndexed(3, 2, palette, indices)
    // Spot-pin the layout: pixelOffset = 54 + 3*4 = 66; stride = 4.
    assert(bytes.length === 66 + 4 * 2)
    assert((bytes(10) & 0xFF) === 66, "pixel offset must account for the palette")
    // Palette quad 0 is B,G,R,0 for red: 00 00 FF 00 at offset 54.
    assert((bytes(54) & 0xFF, bytes(55) & 0xFF, bytes(56) & 0xFF) === ((0, 0, 255)))
    val img = Codecs.decodeBmp(bytes)
    assert(img.width === 3 && img.height === 2)
    def px(r: Int, c: Int) = {
      val p = (r * 3 + c) * 3
      ((img.rgb(p) & 0xFF) << 16) | ((img.rgb(p + 1) & 0xFF) << 8) | (img.rgb(p + 2) & 0xFF)
    }
    assert(px(0, 0) === 0xFF0000 && px(0, 1) === 0x00FF00 && px(0, 2) === 0x0000FF)
    assert(px(1, 0) === 0x0000FF && px(1, 1) === 0x00FF00 && px(1, 2) === 0xFF0000)
  }

  test("8-bit BMP with an out-of-palette index names the defect") {
    val bytes = Codecs.encodeBmpIndexed(2, 1, Array(0x101010, 0x202020),
      Array[Byte](0, 1))
    val bad = bytes.clone(); bad(bad.length - 3) = 9 // index 9 of a 2-entry palette
    assert(intercept[IllegalArgumentException](Codecs.decodeBmp(bad))
      .getMessage.contains("palette"))
  }

  // ---- WAV golden bytes -----------------------------------------------------
  //
  // The canonical 44-byte header + two samples (+1, -2), 8000 Hz mono,
  // every field from the published RIFF/WAVE PCM layout.
  private val goldenWav: Array[Byte] = Array[Int](
    'R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 16, 0, 0, 0,
    1, 0, // PCM
    1, 0, // mono
    0x40, 0x1F, 0, 0, // 8000 Hz
    0x80, 0x3E, 0, 0, // byte rate 16000
    2, 0, // block align
    16, 0, // bits
    'd', 'a', 't', 'a', 4, 0, 0, 0,
    1, 0, // sample +1 (LE)
    0xFE, 0xFF // sample -2 (LE)
  ).map(_.toByte)

  test("golden WAV bytes decode to the spec'd samples and rate") {
    val pcm = Codecs.decodeWav(goldenWav)
    assert(pcm.sampleRate === 8000 && pcm.channels === 1)
    assert(pcm.samples.toSeq === Seq[Short](1, -2))
  }

  test("the WAV encoder reproduces the golden bytes exactly") {
    assert(java.util.Arrays.equals(
      Codecs.encodeWav(Codecs.Pcm(8000, 1, Array[Short](1, -2))), goldenWav))
  }

  test("the chunk walk skips an odd-sized JUNK chunk via the pad byte") {
    val pcm = Codecs.Pcm(44100, 1, Array[Short](7, -7, 0, 12345))
    val withJunk = Codecs.encodeWav(pcm, junkChunk = true)
    assert(withJunk.length > Codecs.encodeWav(pcm).length)
    val back = Codecs.decodeWav(withJunk)
    assert(back.sampleRate === 44100 && back.samples.toSeq === pcm.samples.toSeq)
  }

  test("stereo WAV round-trips with interleaved samples intact") {
    val interleaved = Array[Short](100, -100, 200, -200, 300, -300) // L,R x3
    val bytes = Codecs.encodeWav(Codecs.Pcm(48000, 2, interleaved))
    // block align (offset 32) must be channels * 2 = 4
    assert((bytes(32) & 0xFF) === 4)
    val back = Codecs.decodeWav(bytes)
    assert(back.channels === 2 && back.sampleRate === 48000)
    assert(back.samples.toSeq === interleaved.toSeq)
  }

  test("WAV decode names unsupported features") {
    val adpcm = Codecs.encodeWav(Codecs.Pcm(8000, 1, Array[Short](1)))
    adpcm(20) = 2 // MS ADPCM format tag: out of scope
    assert(intercept[IllegalArgumentException](Codecs.decodeWav(adpcm))
      .getMessage.contains("format tag"))
    // float tag with a 16-bit depth is a malformed hybrid, not decodable
    val f16 = Codecs.encodeWav(Codecs.Pcm(8000, 1, Array[Short](1)))
    f16(20) = 3
    assert(intercept[IllegalArgumentException](Codecs.decodeWav(f16))
      .getMessage.contains("bit depth"))
    assert(intercept[IllegalArgumentException](
      Codecs.decodeWav("OggS....".getBytes)).getMessage.contains("RIFF"))
  }

  // ---- WAV format-3 (IEEE float) and 8-bit PCM golden bytes -----------------

  // 18-byte fmt (tag 3, cbSize 0) + fact + data; samples +1 and −2 as the
  // exact dyadics 2⁻¹⁵ (0x38000000) and −2⁻¹⁴ (0xB8800000), LE on the wire.
  private val goldenFloatWav: Array[Byte] = Array[Int](
    'R', 'I', 'F', 'F', 58, 0, 0, 0, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 18, 0, 0, 0,
    3, 0, // IEEE float
    1, 0, // mono
    0x40, 0x1F, 0, 0, // 8000 Hz
    0x00, 0x7D, 0, 0, // byte rate 32000
    4, 0, // block align
    32, 0, // bits
    0, 0, // cbSize
    'f', 'a', 'c', 't', 4, 0, 0, 0, 2, 0, 0, 0,
    'd', 'a', 't', 'a', 8, 0, 0, 0,
    0, 0, 0, 0x38, // +1/32768 = 2^-15
    0, 0, 0x80, 0xB8 // -2/32768 = -2^-14
  ).map(_.toByte)

  // 16-byte PCM fmt with bits=8; codes 0x00 and 0xFF widen to the
  // unsigned-centered extremes −32768 and +32512.
  private val goldenPcm8Wav: Array[Byte] = Array[Int](
    'R', 'I', 'F', 'F', 38, 0, 0, 0, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 16, 0, 0, 0,
    1, 0, // PCM
    1, 0, // mono
    0x40, 0x1F, 0, 0, // 8000 Hz
    0x40, 0x1F, 0, 0, // byte rate 8000 (1 byte/sample)
    1, 0, // block align
    8, 0, // bits
    'd', 'a', 't', 'a', 2, 0, 0, 0,
    0x00, 0xFF
  ).map(_.toByte)

  test("golden float WAV bytes decode through format tag 3 to linear PCM") {
    val pcm = Codecs.decodeWav(goldenFloatWav)
    assert(pcm.sampleRate === 8000 && pcm.channels === 1)
    assert(pcm.samples.toSeq === Seq[Short](1, -2))
  }

  test("the float WAV encoder reproduces the golden bytes exactly") {
    assert(java.util.Arrays.equals(
      Codecs.encodeWavFloat(Codecs.Pcm(8000, 1, Array[Short](1, -2))),
      goldenFloatWav))
  }

  test("golden 8-bit PCM WAV bytes decode to the unsigned-centered samples") {
    val pcm = Codecs.decodeWav(goldenPcm8Wav)
    assert(pcm.sampleRate === 8000 && pcm.channels === 1)
    assert(pcm.samples.toSeq === Seq[Short](-32768, 32512))
  }

  test("the 8-bit PCM encoder reproduces the golden bytes exactly") {
    assert(java.util.Arrays.equals(
      Codecs.encodeWavPcm8(Array[Byte](0x00, 0xFF.toByte), 8000, 1),
      goldenPcm8Wav))
  }

  test("float WAV round trip is LOSSLESS over all 65536 sample values") {
    // s/32768 is an exact dyadic and ·32768 an exact power-of-two
    // rescale — the whole point of the encoding convention.
    val all = Array.tabulate[Short](65536)(i => (i - 32768).toShort)
    val back = Codecs.decodeWav(Codecs.encodeWavFloat(Codecs.Pcm(8000, 1, all)))
    assert(back.samples.toSeq === all.toSeq)
  }

  test("8-bit PCM quantization is the exact top-byte closed form, all values") {
    var s = -32768
    while (s <= 32767) {
      val code = Codecs.pcm8Compress(s.toShort)
      val widened = (((code & 0xFF) - 128) << 8).toShort
      assert(widened === ((s >> 8) << 8).toShort, s"sample $s")
      s += 1
    }
  }

  test("crafted non-finite floats saturate instead of wrapping") {
    val f = Codecs.encodeWavFloat(Codecs.Pcm(8000, 1, Array[Short](0, 0, 0)))
    val dataAt = f.length - 12
    val buf = java.nio.ByteBuffer.wrap(f).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putFloat(dataAt, Float.PositiveInfinity)
    buf.putFloat(dataAt + 4, Float.NegativeInfinity)
    buf.putFloat(dataAt + 8, Float.NaN)
    assert(Codecs.decodeWav(f).samples.toSeq === Seq[Short](32767, -32768, 0))
  }

  // ---- G.711 mu-law ---------------------------------------------------------

  test("mu-law companding golden codes (G.711 published values)") {
    // Classic G.711 landmarks: positive zero 0xFF, negative zero 0x7F,
    // positive max 0x80 (decoding to 32124), negative max 0x00.
    assert((Codecs.mulawCompress(0) & 0xFF) === 0xFF)
    assert((Codecs.mulawCompress(-1) & 0xFF) === 0x7F)
    assert((Codecs.mulawCompress(32767) & 0xFF) === 0x80)
    assert((Codecs.mulawCompress(-32768) & 0xFF) === 0x00)
    assert(Codecs.mulawExpand(0x80.toByte) === 32124)
    assert(Codecs.mulawExpand(0x00.toByte) === -32124)
    assert(Codecs.mulawExpand(0xFF.toByte) === 0)
    assert(Codecs.mulawExpand(0x7F.toByte) === 0)
    // Hand-derived mid-range value: 1000 + 132 = 1132 -> segment 3,
    // mantissa (1132 >> 6) & 15 = 1 -> ~0x31 = 0xCE; expands to
    // ((1*8 + 132) << 3) - 132 = 988.
    assert((Codecs.mulawCompress(1000) & 0xFF) === 0xCE)
    assert(Codecs.mulawExpand(0xCE.toByte) === 988)
  }

  test("mu-law round trip: sign-preserving, monotone, segment-bounded error") {
    var prev = Int.MinValue
    var s = -32768
    while (s <= 32767) {
      val y = Codecs.mulawExpand(Codecs.mulawCompress(s.toShort)).toInt
      assert(y >= prev, s"expand(compress) must be monotone at $s")
      prev = y
      if (s == 0) assert(y === 0)
      if (s > 0) assert(y >= 0) // small magnitudes may quantize to zero
      if (s < 0) assert(y <= 0)
      // Segment step bound: error < 1 << (segment + 4) everywhere, and
      // the clip region tops out at 32635 -> 32124.
      val mag = math.min(math.abs(s), 32635) + 132
      var seg = 7
      while (seg > 0 && (mag & (1 << (seg + 7))) == 0) seg -= 1
      assert(math.abs(y - (if (math.abs(s) > 32635) (if (s < 0) -32635 else 32635) else s))
        <= (1 << (seg + 4)), s"quantization error out of segment bound at $s -> $y")
      s += 1
    }
  }

  private val goldenMulawWav: Array[Byte] = Array(
    'R', 'I', 'F', 'F', 56, 0, 0, 0, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 18, 0, 0, 0, // 18-byte fmt: the non-PCM layout
    7, 0, // WAVE_FORMAT_MULAW
    1, 0, // mono
    0x40, 0x1F, 0, 0, // 8000 Hz
    0x40, 0x1F, 0, 0, // byte rate = 8000 (one byte per sample)
    1, 0, // block align
    8, 0, // bits per sample
    0, 0, // cbSize = 0
    'f', 'a', 'c', 't', 4, 0, 0, 0, 5, 0, 0, 0, // 5 samples per channel
    'd', 'a', 't', 'a', 5, 0, 0, 0,
    0xFF, 0x7F, 0x80, 0x00, 0xCE, // +0, -0, +max, -max, 988
    0 // RIFF pad: odd-sized data chunk
  ).map(_.toByte)

  test("golden mu-law WAV bytes decode through format tag 7 to linear PCM") {
    val pcm = Codecs.decodeWav(goldenMulawWav)
    assert(pcm.sampleRate === 8000 && pcm.channels === 1)
    assert(pcm.samples.toSeq === Seq[Short](0, 0, 32124, -32124, 988))
  }

  test("the mu-law encoder reproduces the golden bytes exactly") {
    assert(java.util.Arrays.equals(
      Codecs.encodeWavMulaw(
        Array(0xFF, 0x7F, 0x80, 0x00, 0xCE).map(_.toByte), 8000, 1),
      goldenMulawWav))
  }

  test("mu-law WAV decode rejects a non-8-bit depth, names the defect") {
    val bad = goldenMulawWav.clone()
    bad(34) = 16 // bits per sample
    assert(intercept[IllegalArgumentException](Codecs.decodeWav(bad))
      .getMessage.contains("bit depth"))
  }

  // ---- G.711 A-law ----------------------------------------------------------

  test("A-law companding golden codes (G.711 published values)") {
    // Landmarks: silence 0xD5 (expanding to +8 — A-law has no true
    // zero), negative zero 0x55 (-8), positive max 0xAA (32256),
    // negative max 0x2A (-32256).
    assert((Codecs.alawCompress(0) & 0xFF) === 0xD5)
    assert((Codecs.alawCompress(-1) & 0xFF) === 0x55)
    assert((Codecs.alawCompress(32767) & 0xFF) === 0xAA)
    assert((Codecs.alawCompress(-32768) & 0xFF) === 0x2A)
    assert(Codecs.alawExpand(0xD5.toByte) === 8)
    assert(Codecs.alawExpand(0x55.toByte) === -8)
    assert(Codecs.alawExpand(0xAA.toByte) === 32256)
    assert(Codecs.alawExpand(0x2A.toByte) === -32256)
    // Hand-derived mid-range: 1000 >> 3 = 125 -> segment 2, mantissa
    // (125 >> 2) & 15 = 15 -> 0x2F ^ 0xD5 = 0xFA; expands to
    // ((15 << 4) + 0x108) << 1 = 1008.
    assert((Codecs.alawCompress(1000) & 0xFF) === 0xFA)
    assert(Codecs.alawExpand(0xFA.toByte) === 1008)
  }

  test("A-law round trip: sign-preserving, monotone, segment-bounded error") {
    var prev = Int.MinValue
    var s = -32768
    while (s <= 32767) {
      val y = Codecs.alawExpand(Codecs.alawCompress(s.toShort)).toInt
      assert(y >= prev, s"expand(compress) must be monotone at $s")
      prev = y
      // A-law has no zero code: signs are strict.
      if (s >= 0) assert(y > 0, s"positive input must expand positive at $s")
      if (s < 0) assert(y < 0, s"negative input must expand negative at $s")
      val x13 = s >> 3
      val m = if (x13 >= 0) x13 else -x13 - 1
      val seg =
        if (m <= 0x1F) 0 else if (m <= 0x3F) 1 else if (m <= 0x7F) 2
        else if (m <= 0xFF) 3 else if (m <= 0x1FF) 4 else if (m <= 0x3FF) 5
        else if (m <= 0x7FF) 6 else 7
      assert(math.abs(y - s) <= (1 << (seg + 2)) + 16,
        s"quantization error out of segment bound at $s -> $y (seg $seg)")
      s += 1
    }
  }

  private val goldenAlawWav: Array[Byte] = Array(
    'R', 'I', 'F', 'F', 56, 0, 0, 0, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 18, 0, 0, 0,
    6, 0, // WAVE_FORMAT_ALAW
    1, 0,
    0x40, 0x1F, 0, 0, // 8000 Hz
    0x40, 0x1F, 0, 0,
    1, 0,
    8, 0,
    0, 0,
    'f', 'a', 'c', 't', 4, 0, 0, 0, 5, 0, 0, 0,
    'd', 'a', 't', 'a', 5, 0, 0, 0,
    0xD5, 0x55, 0xAA, 0x2A, 0xFA, // +8, -8, +max, -max, 1008
    0
  ).map(_.toByte)

  test("golden A-law WAV bytes decode through format tag 6 to linear PCM") {
    val pcm = Codecs.decodeWav(goldenAlawWav)
    assert(pcm.sampleRate === 8000 && pcm.channels === 1)
    assert(pcm.samples.toSeq === Seq[Short](8, -8, 32256, -32256, 1008))
  }

  test("the A-law encoder reproduces the golden bytes exactly") {
    assert(java.util.Arrays.equals(
      Codecs.encodeWavAlaw(
        Array(0xD5, 0x55, 0xAA, 0x2A, 0xFA).map(_.toByte), 8000, 1),
      goldenAlawWav))
  }

  test("the two companding laws quantize the same signal DIFFERENTLY") {
    // Same PCM through both laws must not collapse to identical decoded
    // streams (the m16-vs-m24 oracle distinction rests on this).
    val pcm = Multimodal.textPcm(3L, "companding laws differ")
    val mu = pcm.samples.map(s => Codecs.mulawExpand(Codecs.mulawCompress(s)))
    val al = pcm.samples.map(s => Codecs.alawExpand(Codecs.alawCompress(s)))
    assert(mu.toSeq !== al.toSeq)
  }

  // ---- decoded-domain pipeline drives ---------------------------------------

  test("decoded row fingerprints pair a top-down re-encode with its original") {
    val docsDf = Seq(
      (1L, "a document long enough to fill several pixel rows with text"),
      (2L, "another entirely different body of text for the second image")
    ).toDF("doc_id", "text")
    val orig = Multimodal.renderBmpTable(docsDf, 25, 16)
    val variants = Multimodal.renderBmpTable(docsDf, 25, 16,
      topDown = true, idOffset = 100L)
    val frames = Multimodal.decodedRowFingerprints(orig.unionByName(variants))
    val pairs = Multimodal.frameOverlap(frames, "doc_id", "row_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 101L)), "variant must pair with its original")
    assert(pairs.contains((2L, 102L)))
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((1L, 102L)),
      "unrelated images must not pair")
  }

  test("the frame-energy gate over genuinely decoded PCM drops digital silence") {
    // Half the payload is real speech-shaped samples, half is exact
    // digital silence; window the DECODED samples and gate on energy.
    val samples = Array.tabulate[Short](512)(i =>
      if (i < 256) (((i * 37) % 199 - 99) * 80).toShort else 0)
    val wav = Codecs.encodeWav(Codecs.Pcm(16000, 1, samples), junkChunk = true)
    val decoded = Codecs.decodeWav(wav)
    assert(decoded.samples.toSeq === samples.toSeq)
    val windows = decoded.samples.grouped(64).zipWithIndex.map { case (w, idx) =>
      val bytes = new Array[Byte](w.length * 2)
      var i = 0
      while (i < w.length) {
        bytes(2 * i) = (w(i) & 0xFF).toByte
        bytes(2 * i + 1) = ((w(i) >> 8) & 0xFF).toByte
        i += 1
      }
      (9L, idx, bytes)
    }.toSeq.toDF("doc_id", "frame_idx", "frame")
    val live = Multimodal.frameEnergyFilter(windows, "frame", minVariance = 4L)
      .select("frame_idx").as[Int].collect().toSet
    assert(live === (0 until 4).toSet,
      "exactly the four content windows survive; the four silent ones drop")
  }

  test("2-D dHash: encoding-invariant, pixel-flip-sensitive") {
    val text = "a body of text with enough variation to light up gradients"
    val docsDf = Seq((7L, text)).toDF("doc_id", "text")
    val up = Multimodal.decodedDHash(Multimodal.renderBmpTable(docsDf, 25, 16))
      .select($"dhash").as[Long].head()
    val down = Multimodal.decodedDHash(
        Multimodal.renderBmpTable(docsDf, 25, 16, topDown = true))
      .select($"dhash").as[Long].head()
    assert(up === down, "two valid encodings of the same pixels must hash equal")
    assert(up != 0L, "a varied image must light some gradient bits")
    // A decoder that silently ignored row order would hand back this image:
    // the hash must CHANGE, or the 2-D claim is hollow.
    val img = Multimodal.textImage(text, 25, 16)
    val flipped = Codecs.Image(25, 16,
      (0 until 16).reverse.flatMap { r =>
        img.rgb.slice(r * 25 * 3, (r + 1) * 25 * 3)
      }.toArray)
    val spark2 = spark
    import spark2.implicits._
    val flippedHash = Multimodal.decodedDHash(
        Seq(graft.multimodal.Multimodal.MediaRow(7L,
          Codecs.encodeBmp(flipped), "image/bmp")).toDS())
      .select($"dhash").as[Long].head()
    assert(flippedHash != up, "vertical pixel flip must change the 2-D hash")
  }

  test("decoded metadata matches the generative rules on a local frame") {
    val d = Seq((3L, "zero crossings come from spaces between words"))
      .toDF("doc_id", "text")
    val audio = Multimodal.decodedAudioMeta(Multimodal.renderWavTable(d))
      .collect().head
    assert(audio.sample_rate === 8000 + (3 % 5) * 1000)
    assert(audio.n_samples === 256 && audio.n_channels === 1)
    assert(audio.zero_cross > 0, "spaces vs letters must cross zero")
    val image = Multimodal.decodedImageMeta(
      Multimodal.renderBmpTable(d, 25, 16)).collect().head
    assert(image.width === 25 && image.height === 16)
    assert(image.file_bytes === 1270, "54 + 16 rows x 76 padded bytes")
    assert(image.blue_sum > 0 && image.fp != 0L)
  }
}
