package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Round 17: lifecycle PARITY for the PQ index (the compact verb the IVF
  * side gained in round 16 — with the corpus frame supplied by the caller,
  * since codes never retain vectors), cache-release discipline at compact
  * (the superseded lineage's per-batch cached leaves must leave the
  * CacheManager), geometry retention through automatic compaction, and
  * the baseline-EOBn strictness fix in the JPEG scan decoder. Planted
  * construction shared with Round16Spec. */
class Round17Spec extends SparkSpecBase {
  import spark.implicits._

  private def baseVec(i: Int): Seq[Float] = {
    val c = i % 4
    Seq.tabulate(8)(j =>
      if (j == 2 * c) 10f
      else if (j == 2 * c + 1) (i / 4).toFloat
      else 0f)
  }
  private def twinVec(i: Int): Seq[Float] = baseVec(i).map(_ * 1.02f)

  private def baseDf = (0 until 40).map(i => (i.toLong, baseVec(i)))
    .toDF("vec_id", "embedding")
  private def batchAt(off: Long) = (0 until 10)
    .map(i => (off + i, twinVec(i))).toDF("vec_id", "embedding")

  private def unionDepth(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size

  test("appendPqAndMaybeCompact bounds the lineage and resets codebook drift") {
    val pq = SimilaritySearch.buildPqIndex(baseDf, "vec_id", "embedding",
      m = 4, k = 16)
    // the lake's landed vectors: base plus every batch appended so far
    var landed = baseDf
    var cur = pq
    for (w <- 1 to 2) {
      val b = batchAt(w * 1000L)
      landed = landed.unionByName(b)
      val frozenLake = landed
      cur = SimilaritySearch.appendPqAndMaybeCompact(cur, b, "embedding",
        corpus = () => frozenLake, compactEvery = 3)
      assert(cur.appendsSinceCompaction === w)
      assert(unionDepth(cur.codes) > 0)
      assert(cur.codebooks eq pq.codebooks, "appends must not re-fit")
    }
    val b3 = batchAt(3000L)
    landed = landed.unionByName(b3)
    val lake3 = landed
    cur = SimilaritySearch.appendPqAndMaybeCompact(cur, b3, "embedding",
      corpus = () => lake3, compactEvery = 3)
    assert(cur.appendsSinceCompaction === 0, "compaction resets the counter")
    assert(unionDepth(cur.codes) === 0, "compaction flattens the union lineage")
    assert(cur.codes.count() === 70) // 40 base + 3 × 10 batches
    assert(cur.m === 4 && cur.subDim === pq.subDim,
      "compaction keeps the index's own geometry")
    // drift reset: the re-fit equals a FRESH build over the same corpus
    // (deterministic k-means over the same bounded sample)
    val fresh = SimilaritySearch.buildPqIndex(lake3, "vec_id", "embedding",
      m = 4, k = 16, persist = false)
    assert(cur.codebooks.length === fresh.codebooks.length)
    cur.codebooks.zip(fresh.codebooks).foreach { case (a, b) =>
      assert(a.length === b.length)
      a.zip(b).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb), "re-fit != fresh build")
      }
    }
    // and the compacted index still answers: each 1000-batch twin's ADC
    // top-3 contains a collinear match (its base vector or a twin copy)
    val top = SimilaritySearch.pqTopK(cur, batchAt(1000L), "vec_id",
        "embedding", k = 3)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (i <- 0 until 10) {
      val ok = Set(i.toLong, 2000L + i, 3000L + i)
      assert(top(1000L + i).intersect(ok).nonEmpty,
        s"ADC top-3 of ${1000 + i} was ${top(1000L + i)}")
    }
  }

  test("compactIvfIndex releases the superseded cached lineage") {
    val idx = SimilaritySearch.buildIvfIndex(baseDf, "vec_id", "embedding",
      nCells = 4)
    var cur = SimilaritySearch.appendIvfIndex(idx, batchAt(1000L))
    cur = SimilaritySearch.appendIvfIndex(cur, batchAt(2000L))
    assert(cur.cachedLeaves.size === 3) // base assignment + two batches
    cur.assigned.count() // materialize so the caches are actually populated
    assert(cur.cachedLeaves.forall(_.storageLevel.useMemory),
      "append leaves should be cached before compaction")
    val old = cur.cachedLeaves
    val compacted = SimilaritySearch.compactIvfIndex(cur)
    assert(old.forall(!_.storageLevel.useMemory),
      "compaction must unpersist every superseded cached leaf")
    assert(compacted.cachedLeaves.isEmpty)
    assert(compacted.assigned.count() === 60)
  }

  test("compactPqIndex releases the superseded cached lineage") {
    val pq = SimilaritySearch.buildPqIndex(baseDf, "vec_id", "embedding",
      m = 4, k = 16)
    var cur = SimilaritySearch.appendPqIndex(pq, batchAt(1000L), "embedding")
    cur = SimilaritySearch.appendPqIndex(cur, batchAt(2000L), "embedding")
    assert(cur.cachedLeaves.size === 3)
    cur.codes.count()
    assert(cur.cachedLeaves.forall(_.storageLevel.useMemory))
    val old = cur.cachedLeaves
    val corpus = baseDf.unionByName(batchAt(1000L)).unionByName(batchAt(2000L))
    val compacted = SimilaritySearch.compactPqIndex(cur, corpus, "embedding")
    assert(old.forall(!_.storageLevel.useMemory),
      "compaction must unpersist every superseded cached leaf")
    assert(compacted.cachedLeaves.isEmpty)
    assert(compacted.codes.count() === 60)
  }

  test("automatic compaction keeps a non-default cell count") {
    val idx = SimilaritySearch.buildIvfIndex(baseDf, "vec_id", "embedding",
      nCells = 2)
    assert(idx.centroids.length === 2)
    // default nCells (<= 0) must re-fit at the index's OWN geometry, not
    // snap to a hardcoded constant
    val cur = SimilaritySearch.appendIvfAndMaybeCompact(idx, batchAt(1000L),
      compactEvery = 1)
    assert(cur.appendsSinceCompaction === 0, "window of 1 compacts at once")
    assert(cur.centroids.length === 2,
      s"compaction changed the quantizer geometry: ${cur.centroids.length} cells")
  }

  test("m32 audio fingerprint: planted mu-law recall >= 0.8, deviations bounded") {
    import graft.multimodal.Multimodal
    val base = graft.sources.Sources.table(spark, "/root/testdata/sf0.001",
      "documents").filter(length(col("text")) >= 1)
    val media = Multimodal.renderWavTable(base).unionByName(
      Multimodal.renderMulawWavTable(base.filter(col("doc_id") < 40),
        idOffset = 600000L))
    val h = Multimodal.decodedAudioFingerprints(media).localCheckpoint()
    val keep = h.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, 16)).select(col("fp"))
    val k = h.join(keep, Seq("fp"))
    val pairs = k.as("a").join(k.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        expr("array_max(zip_with(a.energies, b.energies, " +
          "(x, y) -> abs(x - y) * 10000L DIV greatest(x, y, 1L)))")
          .as("max_dev_bp"))
      .filter(col("max_dev_bp") <= 700)
      .select(col("a_id"), col("b_id"), col("max_dev_bp"))
      .as[(Long, Long, Long)].collect()
    val planted = pairs.filter(p => p._2 >= 600000L && p._1 == p._2 - 600000L)
    assert(planted.length >= 32, // 0.8 × 40: the DedupSpec-style floor
      s"planted mu-law recall ${planted.length}/40 below 0.8")
    // companding error is bounded: a genuine re-encode never reads as an
    // exact copy (dev > 0) nor drifts anywhere near the 700 bp gate
    assert(planted.forall(p => p._3 > 0 && p._3 < 500),
      s"planted deviations outside (0, 500) bp: ${planted.map(_._3).toSeq}")
    // natural exact-text duplicate pairs sit at deviation 0
    assert(pairs.exists(p => p._2 < 600000L && p._3 == 0L),
      "expected at least one natural exact-dup pair at deviation 0")
  }

  test("baseline scans reject EOBn codes (progressive-only per T.81)") {
    // Hand-built minimal baseline JPEG: 1 component, 8x8, custom DHT
    // whose AC table contains ONLY the EOB1 symbol (0x10) — Annex K
    // tables never carry EOBn, so this is necessarily a crafted stream.
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xDB); u16(2 + 65); b(0x00) // DQT id 0, 8-bit
    for (_ <- 0 until 64) b(16)
    // DHT: DC table 0 with the single symbol 0 (one 1-bit code)
    b(0xFF); b(0xC4); u16(2 + 17 + 1); b(0x00)
    b(1); for (_ <- 0 until 15) b(0); b(0x00)
    // DHT: AC table 0 with the single symbol 0x10 = EOB1
    b(0xFF); b(0xC4); u16(2 + 17 + 1); b(0x10)
    b(1); for (_ <- 0 until 15) b(0); b(0x10)
    // SOF0: precision 8, 8x8, 1 component (id 1, 1x1, quant 0)
    b(0xFF); b(0xC0); u16(2 + 6 + 3); b(8); u16(8); u16(8); b(1)
    b(1); b(0x11); b(0)
    // SOS: 1 component, tables 0/0, full spectrum
    b(0xFF); b(0xDA); u16(2 + 1 + 2 + 3); b(1); b(1); b(0x00)
    b(0); b(63); b(0)
    // entropy: DC code '0' (cat 0), AC code '0' (EOB1) + 1 run bit, pad 1s
    b(0x1F)
    b(0xFF); b(0xD9) // EOI
    val ex = intercept[IllegalArgumentException](
      graft.multimodal.Codecs.decodeJpeg(out.toByteArray))
    assert(ex.getMessage.contains("EOB1 run code in a baseline scan"),
      s"unexpected message: ${ex.getMessage}")
  }
}
