package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Codecs, Multimodal}
import graft.operators.SimilaritySearch

/** Round 18, part 1 — the four behavioral ADVICE closures:
  * memoized-index ownership at compact (a shared artifact's cache must
  * survive an append chain's compaction cadence), the audio fingerprint's
  * 64-window gradient cap (no `1L << w` aliasing on long WAVs), the
  * admission gate's AVI frame/header geometry agreement, and the DIB
  * AVI's stride-correct biSizeImage header field. */
class Round18Spec extends SparkSpecBase {
  import spark.implicits._

  private def vec(i: Int): Seq[Float] = {
    val c = i % 4
    Seq.tabulate(8)(j =>
      if (j == 2 * c) 10f else if (j == 2 * c + 1) (i / 4).toFloat else 0f)
  }
  private def baseDf = (0 until 40).map(i => (i.toLong, vec(i)))
    .toDF("vec_id", "embedding")
  private def batchDf = (0 until 10).map(i => (100L + i, vec(i)))
    .toDF("vec_id", "embedding")

  test("an append chain's compact cannot unpersist a shared memoized IVF base") {
    val shared = SimilaritySearch.memoizedIvfIndex(baseDf, "vec_id",
      "embedding", nCells = 4, cacheKey = "r18#ivf-ownership")
    // the caller-facing copy is LEAF-STRIPPED: it owns nothing it didn't make
    assert(shared.cachedLeaves.isEmpty)
    assert(shared.assigned.storageLevel.useMemory,
      "the memoized artifact's base assignment is cached")
    // compactEvery = 1: the very first append crosses the compact cadence
    val chain = SimilaritySearch.appendIvfAndMaybeCompact(shared, batchDf,
      compactEvery = 1)
    assert(shared.assigned.storageLevel.useMemory,
      "compacting the append chain must not release the shared base cache")
    // ...and the chain's OWN per-batch leaf was released by that compact
    assert(chain.cachedLeaves.isEmpty)
    // the shared artifact still answers probes identically after the
    // chain's lifecycle ran (same object, cache intact)
    val again = SimilaritySearch.memoizedIvfIndex(baseDf, "vec_id",
      "embedding", nCells = 4, cacheKey = "r18#ivf-ownership")
    assert(again.assigned.storageLevel.useMemory)
  }

  test("an append chain's compact cannot unpersist a shared memoized PQ base") {
    val shared = SimilaritySearch.memoizedPqIndex(baseDf, "vec_id",
      "embedding", m = 4, k = 16, cacheKey = "r18#pq-ownership")
    assert(shared.cachedLeaves.isEmpty)
    assert(shared.codes.storageLevel.useMemory)
    val landed = baseDf.unionByName(batchDf)
    val chain = SimilaritySearch.appendPqAndMaybeCompact(shared, batchDf,
      "embedding", corpus = () => landed, compactEvery = 1)
    assert(shared.codes.storageLevel.useMemory,
      "compacting the append chain must not release the shared code table")
    assert(chain.cachedLeaves.isEmpty)
  }

  test("audio fingerprint caps gradient bits at 64 windows — no shift aliasing") {
    // 70 windows of 16 samples: windows 0..63 monotonically RISING energy
    // (no gradient bit in the representable range), then a sharp DROP at
    // window 64→65. Pre-fix, `1L << 64` wrapped to bit 0 and the drop
    // aliased into the low word; the capped kernel leaves fp = 0.
    val samples = Array.tabulate[Short](70 * 16) { i =>
      val w = i / 16
      val amp = if (w <= 64) (w + 1) * 4 else 1
      amp.toShort
    }
    val (fp, e) = Multimodal.audioFingerprintOf(samples, 16)
    assert(e.length === 70, "all windows still contribute energies")
    assert(e(64) > e(65), "the drop past the cap exists in the energy vector")
    assert(fp === 0L,
      "orderings past window 64 must not alias into the 64-bit fingerprint")
    // and a drop INSIDE the representable range still registers normally
    val samples2 = samples.clone()
    var i = 0
    while (i < 16) { samples2(3 * 16 + i) = 1000; i += 1 } // spike window 3
    val (fp2, _) = Multimodal.audioFingerprintOf(samples2, 16)
    assert((fp2 & (1L << 3)) !== 0L, "in-range gradient bits still set")
  }

  test("the admission gate drops a mixed-geometry AVI by reason") {
    import java.sql.Timestamp
    def jpeg(img: Codecs.Image): Array[Byte] = Codecs.encodeJpeg(img)
    val frame64 = jpeg(Multimodal.blockGrayImage("geometry test", shift = 0))
    // header says 64x64 but the second frame is a 16x16 JPEG: the
    // container walk alone admits it; the gate must decode-and-compare
    val small = {
      val rgb = Array.fill[Byte](16 * 16 * 3)(77)
      jpeg(Codecs.Image(16, 16, rgb))
    }
    val mixed = Codecs.encodeAvi(Seq(frame64, small), 64, 64)
    val ok = Codecs.encodeAvi(Seq(frame64), 64, 64)
    val media = Seq((1L, ok), (2L, mixed)).toDF("doc_id", "media")
      .withColumn("ts", lit(Timestamp.valueOf("2026-01-01 00:00:00")))
    val got = graft.streaming.EventStreams
      .mediaDecodeGateStream(media, "doc_id", "media", "ts")
      .select($"new_id", $"admit", $"reason")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === true)
    assert(got(2L)._2 === false)
    assert(got(2L)._3.contains("16x16 frame inside a 64x64 AVI"))
  }

  test("DIB AVI header's biSizeImage carries the stride-padded payload size") {
    def le32(b: Array[Byte], at: Int): Int =
      (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8) |
        ((b(at + 2) & 0xFF) << 16) | ((b(at + 3) & 0xFF) << 24)
    // width 25: 25*3 = 75 rounds to stride 76 — the field must say 76*16,
    // not 75*16 (external consumers honor biSizeImage even though our
    // decoder sizes from the chunk)
    val img = Multimodal.textImage("biSizeImage stride", 25, 16)
    val dib = Codecs.encodeAviDib(Seq(img), usPerFrame = 40000)
    assert(le32(dib, 192) === 76 * 16, "BI_RGB biSizeImage = stride*height")
    // MJPEG: the field matches dwSuggestedBufferSize (the max frame size)
    val f0 = Codecs.encodeJpeg(Multimodal.blockGrayImage("mjpeg field"))
    val mj = Codecs.encodeAvi(Seq(f0), 64, 64)
    assert(le32(mj, 192) === f0.length, "MJPG biSizeImage = max frame bytes")
    // both stay decodable end-to-end
    assert(Codecs.decodeAviFrames(dib).codec === "DIB")
    assert(Codecs.decodeAviFrames(mj).codec === "MJPG")
  }
}
