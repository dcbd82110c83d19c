package graft

import graft.multimodal.{Codecs, Multimodal}

/** GIF89a codec spec — golden bytes pin the container layout AND the LZW
  * bit stream to the public spec (GIF89a + its appendix F compression),
  * not merely to this encoder's own output: the golden file's LZW data
  * bytes are HAND-PACKED below, code by code, including the code-width
  * growth boundary, so a symmetric encoder+decoder drift in the packing
  * or the width rule cannot hide.
  */
class GifSpec extends SparkSpecBase {
  import spark.implicits._

  // 3x2 image over a 4-entry palette, indices (row-major): 1,2,1 / 0,3,0.
  //
  // LZW hand-trace (minCodeSize 2, clear=4, EOI=5, first free entry 6,
  // initial width 3):
  //   emit 4 (clear) @3
  //   b=1: prefix=1
  //   b=2: (1,2) new -> emit 1 @3, add #6, next=7
  //   b=1: (2,1) new -> emit 2 @3, add #7, next=8
  //   b=0: (1,0) new -> emit 1 @3, add #8, next=9 = (1<<3)+1 -> width=4
  //   b=3: (0,3) new -> emit 0 @4, add #9
  //   b=0: (3,0) new -> emit 3 @4, add #10
  //   end: emit 0 @4, emit 5 (EOI) @4
  // LSB-first packing of [4@3, 1@3, 2@3, 1@3, 0@4, 3@4, 0@4, 5@4]:
  //   byte0 = 100 | 001<<3 | (10 of 010)<<6      = 0x8C
  //   byte1 = 0 | 001<<1 | 0000<<4               = 0x02
  //   byte2 = 0011 | 0000<<4                     = 0x03
  //   byte3 = 0101                               = 0x05
  private val goldenGif: Array[Byte] = Array[Int](
    'G', 'I', 'F', '8', '9', 'a',
    3, 0, 2, 0, // logical screen 3x2, LE
    0xF1, // packed: GCT present, color resolution 8, GCT size 2^(1+1)=4
    0, // background color index
    0, // pixel aspect ratio
    0x00, 0x00, 0x00, // palette 0: black
    0xFF, 0x00, 0x00, // palette 1: red
    0x00, 0xFF, 0x00, // palette 2: green
    0x00, 0x00, 0xFF, // palette 3: blue
    0x21, 0xF9, 4, 0, 0, 0, 0, 0, // Graphic Control Extension, empty
    0x2C, 0, 0, 0, 0, 3, 0, 2, 0, 0x00, // image descriptor, full screen
    2, // LZW minimum code size
    4, 0x8C, 0x02, 0x03, 0x05, // one 4-byte sub-block (hand-packed above)
    0, // block terminator
    0x3B // trailer
  ).map(_.toByte)

  private val goldenPalette = Array(0x000000, 0xFF0000, 0x00FF00, 0x0000FF)
  private val goldenIndices = Array[Byte](1, 2, 1, 0, 3, 0)

  test("golden GIF bytes decode to the spec'd pixels through the palette") {
    val gif = Codecs.decodeGif(goldenGif)
    assert(gif.image.width === 3 && gif.image.height === 2)
    assert(gif.paletteSize === 4 && !gif.interlaced)
    val px = gif.image.rgb.grouped(3).map(_.map(_ & 0xFF).toSeq).toSeq
    assert(px === Seq(
      Seq(255, 0, 0), Seq(0, 255, 0), Seq(255, 0, 0),
      Seq(0, 0, 0), Seq(0, 0, 255), Seq(0, 0, 0)))
  }

  test("the GIF encoder reproduces the golden bytes exactly") {
    assert(java.util.Arrays.equals(
      Codecs.encodeGif(3, 2, goldenPalette, goldenIndices), goldenGif))
  }

  test("interlaced encoding: byte-different file, identical decoded pixels") {
    // 3x5: interlace file-row order is [0, 4, 2, 1, 3] — a genuine
    // permutation the decoder must undo.
    val idx = Array.tabulate[Byte](15)(i => (i % 4).toByte)
    val seq = Codecs.encodeGif(3, 5, goldenPalette, idx)
    val ilaced = Codecs.encodeGif(3, 5, goldenPalette, idx, interlaced = true)
    assert(!java.util.Arrays.equals(seq, ilaced))
    val a = Codecs.decodeGif(seq)
    val b = Codecs.decodeGif(ilaced)
    assert(!a.interlaced && b.interlaced)
    assert(java.util.Arrays.equals(a.image.rgb, b.image.rgb))
  }

  test("KwKwK: a run of repeated indices round-trips (code == next free)") {
    // All-same indices force the decoder's code==nextFree special case on
    // the second data code.
    val idx = Array.fill[Byte](64)(2)
    val gif = Codecs.encodeGif(8, 8, goldenPalette, idx)
    val img = Codecs.decodeGif(gif).image
    assert(img.rgb.grouped(3).forall(p =>
      (p(0) & 0xFF) == 0 && (p(1) & 0xFF) == 255 && (p(2) & 0xFF) == 0))
  }

  test("code-width growth to 12 bits and table-full clear+reset round-trip") {
    // A long non-repeating-enough index stream over a 128-entry palette
    // pushes the LZW table past 4096 entries, forcing the encoder's
    // mid-stream clear code and every width from 8 to 12.
    val palette = Multimodal.gifPalette
    val n = 120 * 120
    val idx = Array.tabulate[Byte](n) { i =>
      (((i * 37) ^ (i >> 3) ^ (i * i % 113)) % 128).toByte
    }
    val gif = Codecs.encodeGif(120, 120, palette, idx)
    val img = Codecs.decodeGif(gif).image
    var i = 0
    while (i < n) {
      val k = idx(i) & 0xFF
      assert((img.rgb(i * 3 + 2) & 0xFF) === k, s"blue != index at pixel $i")
      assert((img.rgb(i * 3) & 0xFF) === 255 - k)
      i += 1
    }
  }

  test("GIF decode names unsupported features instead of emitting garbage") {
    // Local color table flag on the image block
    val lct = goldenGif.clone()
    lct(42) = 0x80.toByte // image-descriptor packed byte
    assert(intercept[IllegalArgumentException](Codecs.decodeGif(lct))
      .getMessage.contains("local color table"))
    // Animation: a second image block instead of the trailer
    val anim = goldenGif.dropRight(1) ++ Array[Byte](0x2C)
    assert(intercept[IllegalArgumentException](Codecs.decodeGif(anim))
      .getMessage.contains("multiple image blocks"))
    // No global color table
    val nogct = goldenGif.clone()
    nogct(10) = 0x71 // GCT flag off
    assert(intercept[IllegalArgumentException](Codecs.decodeGif(nogct))
      .getMessage.contains("global color table"))
    // Truncated LZW data (EOI never arrives)
    val trunc = goldenGif.take(goldenGif.length - 4) // cut into the sub-block
    assert(intercept[IllegalArgumentException](Codecs.decodeGif(trunc))
      .getMessage.toLowerCase.contains("truncated"))
    // Wrong magic
    assert(intercept[IllegalArgumentException](
      Codecs.decodeGif("BMP???".getBytes)).getMessage.contains("magic"))
  }

  test("animated GIF: frames, per-frame delays/interlace, NETSCAPE loops round-trip") {
    val pal = Array.tabulate(4)(k => (k << 16) | (k << 8) | k)
    val f0 = Array[Byte](0, 1, 2, 3, 0, 1) // 3x2
    val f1 = Array[Byte](3, 2, 1, 0, 3, 2)
    val f2 = Array[Byte](1, 1, 2, 2, 3, 3)
    val bytes = Codecs.encodeGifAnimated(3, 2, pal,
      Seq((f0, false, 5), (f1, true, 10), (f2, false, 0)), loops = 7)
    // The NETSCAPE2.0 application extension sits right after the 12-byte
    // GCT (13 + 12 = offset 25): 0x21 0xFF 11 "NETSCAPE2.0" 3 1 <loops LE> 0.
    assert((bytes(25) & 0xFF) === 0x21 && (bytes(26) & 0xFF) === 0xFF)
    assert(new String(bytes, 28, 11, "US-ASCII") === "NETSCAPE2.0")
    assert((bytes(41) & 0xFF) === 7 && (bytes(42) & 0xFF) === 0)
    val anim = Codecs.decodeGifFrames(bytes)
    assert(anim.frames.size === 3 && anim.loops === 7 && anim.paletteSize === 4)
    assert(anim.frames.map(_.delayCs) === Vector(5, 10, 0))
    assert(anim.frames.map(_.interlaced) === Vector(false, true, false))
    // frame pixels: palette entry k is gray k on all channels
    def blues(i: Int) = anim.frames(i).image.rgb.grouped(3).map(_(2) & 0xFF).toSeq
    assert(blues(0) === f0.map(_.toInt).toSeq)
    assert(blues(1) === f1.map(_.toInt).toSeq)
    assert(blues(2) === f2.map(_.toInt).toSeq)
    // single-frame decode still rejects animations BY NAME
    assert(intercept[IllegalArgumentException](Codecs.decodeGif(bytes))
      .getMessage.contains("multiple image blocks"))
    // and decodeGifFrames agrees with decodeGif on a single-frame file
    val single = Codecs.decodeGifFrames(goldenGif)
    assert(single.frames.size === 1 && single.loops === -1)
  }

  test("sampleGifFrames keeps every stride-th frame with decoded facts") {
    val docsDf = Seq((4L, "animated frame sampling over a rotating rule"))
      .toDF("doc_id", "text")
    // doc 4: F = 3 + 4%3 = 4 frames, sampled {0, 2}; delays 4+f;
    // interlaced iff (4+f) even.
    val rows = Multimodal.sampleGifFrames(
      Multimodal.renderGifAnimTable(docsDf, 25, 16), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(rows.length === 2)
    assert(rows.map(_.frame_idx).toSeq === Seq(0L, 2L))
    assert(rows.forall(r => r.n_frames == 4L && r.loops == 0L))
    assert(rows.map(_.delay_cs).toSeq === Seq(4L, 6L))
    assert(rows.map(_.interlaced).toSeq === Seq(1L, 1L))
    // frame 2's blue rule is the frame-0 rule rotated by 14 bytes
    val text = "animated frame sampling over a rotating rule"
    def blueSum(rot: Int) = (0 until 400)
      .map(i => text((i + rot) % text.length).toInt).sum
    assert(rows(0).blue_sum === blueSum(0))
    assert(rows(1).blue_sum === blueSum(14))
  }

  test("decodeImage dispatches GIF by magic; tri-codec pixels agree on blue") {
    val docsDf = Seq(
      (2L, "a document long enough to fill several pixel rows with text"),
      (3L, "another entirely different body of text for the second image")
    ).toDF("doc_id", "text")
    val bmp = Multimodal.renderBmpTable(docsDf, 25, 16)
    val gif = Multimodal.renderGifTable(docsDf, 25, 16, idOffset = 100L)
    val both = bmp.unionByName(gif).collect()
    val byId = both.map(r => r.doc_id -> Codecs.decodeImage(r.media)).toMap
    for (id <- Seq(2L, 3L)) {
      val a = byId(id); val b = byId(id + 100L)
      assert(a.width === b.width && a.height === b.height)
      var i = 0
      while (i < a.width * a.height) {
        assert((a.rgb(i * 3 + 2) & 0xFF) === (b.rgb(i * 3 + 2) & 0xFF),
          s"blue channel diverges at pixel $i of doc $id")
        i += 1
      }
    }
  }
}
