package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL (not stubbed) codecs for the two public uncompressed media
  * containers a zero-dependency JVM can decode from their published
  * specifications alone:
  *
  *  - **BMP** — Windows Bitmap, 24-bit uncompressed `BI_RGB` with the
  *    40-byte `BITMAPINFOHEADER` (the format every imaging tool writes by
  *    default for uncompressed interchange). Both row orders are handled:
  *    positive height = bottom-up (the common case), negative height =
  *    top-down — two byte-DIFFERENT valid encodings of the same pixels,
  *    which is exactly what makes decoded-domain dedup (m11) a real claim.
  *  - **WAV** — RIFF/WAVE, PCM 16-bit little-endian. The decoder WALKS the
  *    chunk list (skipping unknown chunks such as `LIST`/`JUNK`, honoring
  *    RIFF's odd-size pad byte) instead of assuming the canonical 44-byte
  *    layout, because real encoders emit metadata chunks between `fmt `
  *    and `data`.
  *
  * These close the round-6..13 "decode is a declared stub" gap: the
  * multimodal pipeline stages (m09/m10/m11) now run over genuinely decoded
  * pixels/samples, with golden-byte fixtures in CodecSpec pinning the
  * layouts to the public specs (not merely to this encoder's own output).
  *
  * The reference scope note: floorist itself has no media path
  * (`/root/reference/src/floorist/floorist.py` is tabular-only); this
  * family is part of the training-data-pipeline surface the engine adds.
  */
object Codecs {

  /** A decoded image: row-major top-down, 3 bytes per pixel, R,G,B order
    * (the container-neutral layout — BMP's bottom-up BGR is a file-layout
    * detail the codec absorbs). */
  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != $width x $height x 3")
  }

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---- BMP ----------------------------------------------------------------

  private def bmpStride(width: Int): Int = ((width * 3) + 3) & ~3
  private def bmpStride8(width: Int): Int = (width + 3) & ~3

  /** Encode as 24-bit `BI_RGB`. `topDown = true` writes the negative-height
    * variant — same pixels, different (equally valid) file bytes. */
  def encodeBmp(img: Image, topDown: Boolean = false): Array[Byte] = {
    val stride = bmpStride(img.width)
    val dataSize = stride * img.height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER (14 bytes)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putShort(0).putShort(0) // reserved
    buf.putInt(54) // pixel data offset
    // BITMAPINFOHEADER (40 bytes)
    buf.putInt(40)
    buf.putInt(img.width)
    buf.putInt(if (topDown) -img.height else img.height)
    buf.putShort(1) // planes
    buf.putShort(24) // bits per pixel
    buf.putInt(0) // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi in pixels/metre
    buf.putInt(0).putInt(0) // palette: unused at 24bpp
    // Pixel rows: bottom-up unless topDown; B,G,R per pixel; rows padded
    // to a 4-byte boundary.
    var fileRow = 0
    while (fileRow < img.height) {
      val imgRow = if (topDown) fileRow else img.height - 1 - fileRow
      var c = 0
      while (c < img.width) {
        val p = (imgRow * img.width + c) * 3
        buf.put(img.rgb(p + 2)).put(img.rgb(p + 1)).put(img.rgb(p))
        c += 1
      }
      var pad = stride - img.width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** Encode 8-bit indexed (palette) BMP — the other uncompressed variant
    * real tools emit (grayscale exports, screenshots). `palette` entries
    * are 0xRRGGBB; `indices` is row-major top-down, one byte per pixel. */
  def encodeBmpIndexed(width: Int, height: Int, palette: Array[Int],
                       indices: Array[Byte]): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256,
      s"palette must have 1..256 entries, got ${palette.length}")
    require(indices.length == width * height,
      s"index buffer ${indices.length} != $width x $height")
    val stride = bmpStride8(width)
    val dataSize = stride * height
    val paletteBytes = palette.length * 4
    val pixelOffset = 54 + paletteBytes
    val buf = ByteBuffer.allocate(pixelOffset + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(pixelOffset + dataSize)
    buf.putShort(0).putShort(0)
    buf.putInt(pixelOffset)
    buf.putInt(40)
    buf.putInt(width).putInt(height)
    buf.putShort(1).putShort(8)
    buf.putInt(0) // BI_RGB
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835)
    buf.putInt(palette.length) // biClrUsed
    buf.putInt(0)
    palette.foreach { rgb => // palette quads are B,G,R,reserved
      buf.put((rgb & 0xFF).toByte).put(((rgb >> 8) & 0xFF).toByte)
        .put(((rgb >> 16) & 0xFF).toByte).put(0.toByte)
    }
    var fileRow = 0
    while (fileRow < height) {
      val imgRow = height - 1 - fileRow // bottom-up
      var c = 0
      while (c < width) { buf.put(indices(imgRow * width + c)); c += 1 }
      var pad = stride - width
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** Decode uncompressed BMP — 24-bit direct or 8-bit palette, positive OR
    * negative height. Throws `IllegalArgumentException` naming the
    * unsupported feature otherwise — honest scope, never silent garbage. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: missing 'BM' magic")
    require(bytes.length >= 54,
      s"truncated BMP: ${bytes.length} bytes is shorter than the 54-byte headers")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val headerSize = buf.getInt(14)
    require(headerSize >= 40,
      s"unsupported BMP header size $headerSize (need BITMAPINFOHEADER+)")
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(bpp == 24 || bpp == 8,
      s"unsupported BMP bit depth $bpp (24-bit direct or 8-bit palette only)")
    require(compression == 0, s"unsupported BMP compression $compression (BI_RGB only)")
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    require(width > 0 && height > 0, s"degenerate BMP dimensions ${width}x$heightRaw")
    val stride = if (bpp == 24) bmpStride(width) else bmpStride8(width)
    require(bytes.length >= pixelOffset + stride.toLong * height,
      s"truncated BMP: need ${pixelOffset + stride.toLong * height} bytes, have ${bytes.length}")
    // 8-bit: the BGRA palette sits right after the info header; biClrUsed
    // of 0 means the full 256 entries (the spec's default).
    val palette: Array[Byte] =
      if (bpp == 8) {
        val clrUsed = buf.getInt(46)
        val entries = if (clrUsed == 0) 256 else clrUsed
        require(entries >= 1 && entries <= 256 &&
          14 + headerSize + entries * 4 <= pixelOffset,
          s"palette of $entries entries does not fit before the pixel data " +
            s"(offset $pixelOffset, header $headerSize)")
        val p = new Array[Byte](entries * 4)
        System.arraycopy(bytes, 14 + headerSize, p, 0, entries * 4)
        p
      } else null
    val rgb = new Array[Byte](width * height * 3)
    var fileRow = 0
    while (fileRow < height) {
      val imgRow = if (topDown) fileRow else height - 1 - fileRow
      val base = pixelOffset + fileRow * stride
      var c = 0
      while (c < width) {
        val p = (imgRow * width + c) * 3
        if (bpp == 24) {
          rgb(p) = bytes(base + c * 3 + 2) // R
          rgb(p + 1) = bytes(base + c * 3 + 1) // G
          rgb(p + 2) = bytes(base + c * 3) // B
        } else {
          val idx = bytes(base + c) & 0xFF
          require(idx * 4 + 3 < palette.length,
            s"pixel index $idx outside the ${palette.length / 4}-entry palette")
          rgb(p) = palette(idx * 4 + 2) // R
          rgb(p + 1) = palette(idx * 4 + 1) // G
          rgb(p + 2) = palette(idx * 4) // B
        }
        c += 1
      }
      fileRow += 1
    }
    Image(width, height, rgb)
  }

  // ---- WAV ----------------------------------------------------------------

  /** Encode PCM 16-bit LE. `junkChunk = true` inserts a `JUNK` metadata
    * chunk between `fmt ` and `data` (with an ODD payload size, so the
    * RIFF pad byte is exercised) — decoders must walk chunks, not assume
    * the canonical 44-byte layout. */
  def encodeWav(pcm: Pcm, junkChunk: Boolean = false): Array[Byte] = {
    require(pcm.channels >= 1, "channels must be >= 1")
    val dataBytes = pcm.samples.length * 2
    val junkPayload = 5 // odd on purpose: exercises the pad byte
    val junkBytes = if (junkChunk) 8 + junkPayload + 1 else 0
    val riffSize = 4 + (8 + 16) + junkBytes + (8 + dataBytes)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(pcm.channels.toShort)
    buf.putInt(pcm.sampleRate)
    buf.putInt(pcm.sampleRate * pcm.channels * 2) // byte rate
    buf.putShort((pcm.channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    if (junkChunk) {
      buf.put("JUNK".getBytes("US-ASCII")).putInt(junkPayload)
      var i = 0
      while (i < junkPayload) { buf.put(0x6a.toByte); i += 1 }
      buf.put(0.toByte) // RIFF pad: chunks are word-aligned
    }
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < pcm.samples.length) { buf.putShort(pcm.samples(i)); i += 1 }
    buf.array()
  }

  /** Decode RIFF/WAVE PCM 16-bit by walking the chunk list. */
  def decodeWav(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 12, "not a WAV: too short for a RIFF header")
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      s"not a WAV: RIFF/WAVE magic missing (${fourcc(0)}/${fourcc(8)})")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var format = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
      val id = fourcc(off)
      val size = buf.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"truncated WAV chunk '$id' (size $size at offset $off)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size)")
          format = buf.getShort(off + 8).toInt
          channels = buf.getShort(off + 10).toInt
          sampleRate = buf.getInt(off + 12)
          bits = buf.getShort(off + 22).toInt
        case "data" =>
          dataOff = off + 8
          dataLen = size
        case _ => () // LIST/JUNK/fact/...: skip
      }
      off += 8 + size + (size & 1) // RIFF: odd-sized chunks carry a pad byte
    }
    require(sampleRate > 0 && dataOff >= 0, "WAV missing fmt or data chunk")
    require(format == 1, s"unsupported WAV format tag $format (PCM only)")
    require(bits == 16, s"unsupported WAV bit depth $bits (16-bit only)")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(dataOff + i * 2); i += 1 }
    Pcm(sampleRate, channels, samples)
  }
}
