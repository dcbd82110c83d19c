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

  // ---- round 18 part 2: the index DELETE/tombstone lifecycle ------------
  // (tombstone-at-probe + drop-at-compact for IVF / PQ / MinHash / Gram —
  // the takedown verb; LineSetIndex stores doc-less distinct line hashes,
  // so per-doc deletion is structurally out of its scope)

  test("IVF delete: tombstoned ids vanish from probes, drop at compact and save") {
    val idx = SimilaritySearch.buildIvfIndex(baseDf, "vec_id", "embedding",
      nCells = 4)
    try {
      val gone = Set(1L, 2L, 13L)
      val del = idx.delete(gone.toSeq.toDF("vec_id"))
      // full cell coverage → the probe is exact: it must equal the exact
      // probe over an index BUILT without the deleted ids
      val got = SimilaritySearch.probeIvf(del, col("vec_id") < 6,
          k = 3, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      assert(got.nonEmpty)
      assert(got.forall { case (q, n, _, _) => !gone(q) && !gone(n) },
        "a tombstoned id surfaced as a query or neighbor")
      val rebuilt = SimilaritySearch.buildIvfIndex(
        baseDf.filter(!col("vec_id").isin(gone.toSeq: _*)),
        "vec_id", "embedding", nCells = 4, persist = false)
      val want = SimilaritySearch.probeIvf(rebuilt, col("vec_id") < 6,
          k = 3, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      assert(got.toSet === want.toSet,
        "tombstone-filtered probe must equal the probe of a physically-rebuilt index")
      // drop-at-compact: rows gone physically, tombstone set cleared
      val compacted = SimilaritySearch.compactIvfIndex(del)
      assert(compacted.tombstones.isEmpty)
      assert(compacted.assigned.count() === 40L - gone.size)
      // save writes the LIVE view — a loaded artifact never resurrects
      val dir = tmpDir("r18-ivf-del")
      val del2 = SimilaritySearch.buildIvfIndex(baseDf, "vec_id", "embedding",
        nCells = 4, persist = false).delete(Seq(7L).toDF("vec_id"))
      del2.save(dir)
      val loaded = SimilaritySearch.loadIvfIndex(spark, dir, "vec_id", "embedding")
      assert(loaded.assigned.filter(col("vec_id") === 7L).count() === 0L)
      assert(loaded.assigned.count() === 39L)
    } finally idx.unpersist()
  }

  test("PQ delete: tombstones filter the ADC scan, the IVF-PQ candidate " +
    "artifact, and the compact re-fit corpus") {
    val norm = baseDf.select(col("vec_id"),
      SimilaritySearch.l2normalizeCol(col("embedding")).as("__vn"))
    val ivf = SimilaritySearch.buildIvfIndex(norm, "vec_id", "__vn",
      nCells = 4, persist = false)
    val pq = SimilaritySearch.buildPqIndex(norm, "vec_id", "__vn",
      m = 4, k = 16, persist = false)
    val gone = Set(0L, 4L) // same-cell twins of queries 8/12 (vec() % 4)
    val delPq = pq.delete(gone.toSeq.toDF("vec_id"))
    // brute ADC scan: deleted ids must not score
    val adc = SimilaritySearch.pqTopK(delPq, baseDf.filter(col("vec_id") >= 8),
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(adc.nonEmpty && adc.forall { case (_, n) => !gone(n) })
    // the combined candidate artifact honors tombstones from EITHER half
    val qs = norm.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("q_id"), col("__vn").as("__qn"))
    val viaPq = SimilaritySearch.probeIvfPq(ivf, delPq, qs, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaPq.nonEmpty && viaPq.forall { case (_, n) => !gone(n) })
    val viaIvf = SimilaritySearch.probeIvfPq(
        ivf.delete(gone.toSeq.toDF("vec_id")), pq, qs, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaIvf.nonEmpty && viaIvf.forall { case (_, n) => !gone(n) })
    // drop-at-compact: the re-fit never sees the tombstoned rows even
    // though the caller's corpus frame still carries them
    val compacted = SimilaritySearch.compactPqIndex(delPq, norm, "__vn")
    assert(compacted.tombstones.isEmpty)
    assert(compacted.codes.count() === 38L)
    assert(compacted.codes.filter(col("vec_id").isin(gone.toSeq: _*))
      .count() === 0L)
  }

  test("MinHash delete: the tombstoned twin stops pairing; compact and " +
    "append preserve the tombstone discipline") {
    def sh(seed: String): Seq[String] = (1 to 24).map(i => s"${seed}_tok$i")
    val corpus = Seq((1L, sh("a")), (2L, sh("b"))).toDF("doc_id", "sh")
    val probe = Seq((101L, sh("a")), (102L, sh("b"))).toDF("doc_id", "sh")
    val idx = graft.operators.Dedup.buildMinHashIndex(corpus, "doc_id", "sh")
    try {
      def pairs(i: graft.operators.Dedup.MinHashIndex): Set[(Long, Long)] =
        graft.operators.Dedup.deltaNearDupsIndexed(probe, i, "doc_id", "sh",
          threshold = 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(idx) === Set((101L, 1L), (102L, 2L)))
      val del = idx.delete(Seq(1L).toDF("doc_id"))
      assert(pairs(del) === Set((102L, 2L)),
        "the deleted doc's twin must no longer retrieve it")
      // append carries the tombstone forward (an ingest fold between a
      // takedown and the next compact must not resurrect)
      val appended = del.append(Seq((3L, sh("c"))).toDF("doc_id", "sh"), "sh")
      assert(pairs(appended) === Set((102L, 2L)))
      // compact drops physically and clears the set
      val dir = tmpDir("r18-mh-del")
      val compacted = appended.compact(dir)
      assert(compacted.tombstones.isEmpty)
      assert(compacted.signatures.count() === 2L) // docs 2 and 3
      assert(compacted.signatures.filter(col("doc_id") === 1L).count() === 0L)
      assert(pairs(compacted) === Set((102L, 2L)))
      compacted.unpersist()
    } finally idx.unpersist()
  }

  test("Gram delete: a tombstoned corpus doc stops flagging quoters; " +
    "compact drops its gram rows") {
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$run ${(1 to 5).map(i => s"p$i").mkString(" ")}"),
      (2L, (1 to 15).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val delta = Seq((101L, s"intro $run")).toDF("doc_id", "text")
    val idx = graft.operators.Dedup.buildGramIndex(corpus, "doc_id", "text",
      k = 10, maxGramDocs = 4)
    try {
      def pairs(i: graft.operators.Dedup.GramIndex): Set[(Long, Long)] =
        graft.operators.Dedup.deltaExactSubstrPairs(delta, i, "text")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(idx) === Set((101L, 1L)))
      val del = idx.delete(Seq(1L).toDF("doc_id"))
      assert(pairs(del) === Set.empty[(Long, Long)],
        "a takedown must stop the doc flagging arriving quoters")
      val dir = tmpDir("r18-gram-del")
      val compacted = del.compact(dir)
      assert(compacted.tombstones.isEmpty)
      assert(compacted.grams.filter(col("doc_id") === 1L).count() === 0L)
      assert(pairs(compacted) === Set.empty[(Long, Long)])
      compacted.unpersist()
    } finally idx.unpersist()
  }

  test("LshVec delete: tombstoned vectors stop pairing; save drops " +
    "physically and a loaded artifact never resurrects") {
    val corpus = (0 until 20).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val idx = graft.operators.Dedup.buildLshVecIndex(corpus, "vec_id",
      "embedding", bits = 6, tables = 8)
    try {
      val delta = Seq((101L, vec(0))).toDF("vec_id", "embedding")
      def pairs(i: graft.operators.Dedup.LshVecIndex): Set[(Long, Long)] =
        graft.operators.Dedup.deltaEmbeddingNearDups(delta, i, 0.95)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val before = pairs(idx)
      assert(before.contains((101L, 0L)) && before.contains((101L, 4L)),
        s"the arriving twin must pair with its near-identical sources: $before")
      val del = idx.delete(Seq(0L, 4L).toDF("vec_id"))
      assert(pairs(del) === before.filterNot(p => p._2 == 0L || p._2 == 4L),
        "delete must remove exactly the tombstoned olds from the verdicts")
      // save writes the live view; the loaded artifact stays clean
      val dir = tmpDir("r18-lshvec-del")
      del.save(dir)
      val loaded = graft.operators.Dedup.loadLshVecIndex(spark, dir,
        "vec_id", "embedding")
      assert(loaded.vectors.filter(col("vec_id").isin(0L, 4L)).count() === 0L)
      assert(pairs(loaded) === before.filterNot(p => p._2 == 0L || p._2 == 4L))
      // append carries the tombstone set forward
      val appended = del.append(
        Seq((200L, vec(7))).toDF("vec_id", "embedding"))
      assert(pairs(appended) === before.filterNot(p => p._2 == 0L || p._2 == 4L))
      appended.unpersist()
    } finally idx.unpersist()
  }

  // ---- round 18 part 3: the composable admission pipeline ---------------

  test("AdmissionPipeline: composed == hand-sequenced stages; a doc failing " +
    "two gates is charged to the FIRST only") {
    import graft.streaming.AdmissionPipeline
    import graft.streaming.AdmissionPipeline.Stage
    val in = Seq(2L, 3L, 12L, 13L).toDF("doc_id")
    val stages = Seq(
      Stage.rowLocal("even", pmod(col("doc_id"), lit(2)) === 0,
        when(pmod(col("doc_id"), lit(2)) === 0, lit(""))
          .otherwise(lit("odd id"))),
      Stage.verdict("small", "doc_id") { df =>
        df.select(col("doc_id"), (col("doc_id") < 10).as("admit"),
          when(col("doc_id") < 10, lit("")).otherwise(lit("too big"))
            .as("reason"))
      })
    val disp = AdmissionPipeline.run(in, stages)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        r.getString(2), r.getString(3))).toSet
    // 13 fails BOTH gates but sequential semantics charge it to "even"
    // only — it never reaches (or pays for) the second stage
    assert(disp === Set(
      (2L, true, "", ""),
      (3L, false, "even", "odd id"),
      (12L, false, "small", "too big"),
      (13L, false, "even", "odd id")))
    // hand-sequenced equivalent: filter → filter, drops collected manually
    val evenOk = in.filter(pmod(col("doc_id"), lit(2)) === 0)
    val handAdmitted = evenOk.filter(col("doc_id") < 10)
      .collect().map(_.getLong(0)).toSet
    assert(disp.filter(_._2).map(_._1) === handAdmitted)
    // the report carries the m27 share arithmetic (4 docs → 2500 bp each)
    val rep = AdmissionPipeline.report(AdmissionPipeline.run(in, stages))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rep === Set(
      ("", true, "", 1L, 2500L),
      ("even", false, "odd id", 2L, 5000L),
      ("small", false, "too big", 1L, 2500L)))
    // contract guards: duplicate names and verdict-less stages refuse
    assertThrows[IllegalArgumentException] {
      AdmissionPipeline.run(in, stages :+ stages.head)
    }
    assertThrows[IllegalArgumentException] {
      AdmissionPipeline.run(in,
        Seq(Stage("bad", df => df.withColumn("admit", lit(true)))))
    }
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
