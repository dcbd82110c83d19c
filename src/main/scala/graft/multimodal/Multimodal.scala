package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and per-batch decode/feature
  * stages run as partition-local transforms (the Scala analogue of
  * `mapInPandas` batches: one iterator per partition, streaming, no
  * driver-side collection).
  *
  * The actual codecs (JPEG decode, audio resample, video demux) are NOT
  * available in this container, so [[decodeFeatures]] and [[sampleFrames]]
  * use a clearly-marked deterministic STUB in place of the codec call. The
  * Spark-side contract — schemas, binary transport, partition-local batch
  * shape, feature vector layout — is real and tested; swapping the stub for
  * a JNI/ImageIO call changes no plan shape.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)

  /** Extracted features: fixed-width embedding + decoded dimensions. */
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                                 n_bytes: Long, features: Array[Float])

  /** A sampled "frame" of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Wraps the documents table as a binary media table (payload = UTF-8
    * bytes standing in for an encoded image). */
  def asMediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("stub/raw").as("format"))
      .as[MediaRow]
  }

  /** Per-partition decode + feature extraction.
    *
    * STUB: a real implementation calls the image codec here (per batch, per
    * partition). The deterministic fake derives "dimensions" from the
    * payload length and a `dim`-bucket byte histogram (L1-normalised) as the
    * feature vector — stable across partitionings and runs.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // --- STUB decode: replace with codec call (e.g. ImageIO.read) ----
        val bytes = r.media
        val width = math.max(1, bytes.length % 1024)
        val height = math.max(1, bytes.length / 1024 + 1)
        val hist = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xFF) % dim) += 1f
          i += 1
        }
        val total = math.max(1, bytes.length).toFloat
        var j = 0
        while (j < dim) { hist(j) /= total; j += 1 }
        // -----------------------------------------------------------------
        MediaFeatures(r.doc_id, width, height, bytes.length.toLong, hist)
      }
    }
  }

  /** Partition-local "resize": re-encode each payload to at most
    * `maxBytes`. STUB: deterministic byte subsampling (every k-th byte)
    * stands in for the codec's decode→scale→re-encode; the contract — a
    * map-shaped stage that shrinks payloads in place, preserving ids and
    * never widening the row — is the real part. Payloads already within
    * budget pass through untouched (same object, no copy). */
  def resize(media: Dataset[MediaRow], maxBytes: Int = 1 << 16): Dataset[MediaRow] = {
    require(maxBytes > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.media.length <= maxBytes) r
        else {
          // --- STUB re-encode: replace with codec scale call --------------
          // Long arithmetic: length + maxBytes - 1 overflows Int for
          // payloads near 2 GB (or large caps).
          val k = ((r.media.length.toLong + maxBytes - 1) / maxBytes).toInt
          val out = new Array[Byte](((r.media.length.toLong + k - 1) / k).toInt)
          var i = 0
          while (i < out.length) { out(i) = r.media(i * k); i += 1 }
          // ----------------------------------------------------------------
          r.copy(media = out, format = r.format + ";resized")
        }
      }
    }
  }

  /** Partition-local "re-encode": shift every payload byte up by `shift`
    * (a monotone byte-value remap — the byte-level model of a
    * brightness/contrast adjustment during re-encoding). STUB: a real
    * implementation decodes and re-encodes through the codec; the
    * contract — a map-shaped stage producing a payload that is
    * byte-DIFFERENT (m04's md5 fingerprints all change) yet
    * perceptually identical (every [[graft.functions.DHash64]] gradient
    * sign is preserved, so m05 still matches it to the original) — is the
    * real part. Requires headroom: payload bytes must stay below
    * 256 - shift unsigned or the wrap breaks monotonicity (ASCII payloads
    * are <= 126, so the stub's domain always has it). `idOffset`
    * relabels the copy so planted originals and re-encodes coexist. */
  def reencodeStub(media: Dataset[MediaRow], shift: Int = 1,
                   idOffset: Long = 0L): Dataset[MediaRow] = {
    require(shift >= 1 && shift <= 128, s"shift out of (0, 128]: $shift")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // --- STUB re-encode: replace with codec decode->adjust->encode ---
        val out = new Array[Byte](r.media.length)
        var i = 0
        while (i < out.length) { out(i) = (r.media(i) + shift).toByte; i += 1 }
        // -----------------------------------------------------------------
        MediaRow(r.doc_id + idOffset, out, r.format + ";reencoded")
      }
    }
  }

  /** Partition-local LOSSY "re-encode": bump ONE byte per 64-byte frame
    * window (position 31, +2) — the byte-level model of a lossy codec
    * pass that perturbs a few pixels. STUB like [[reencodeStub]]; the
    * contract is the real part: the payload is byte-different AND
    * flips at most two [[graft.functions.DHash64]] gradient signs per
    * frame (comparisons (30,31) and (31,32)), so m05's EXACT fingerprint
    * match misses it while m08's Hamming-tolerant banding still pairs it
    * with the original. ASCII payloads stay in range only up to ≤ 125:
    * 126+2 = 128 overflows the signed byte and wraps negative, where the
    * m08 oracle's `chr(ascii+2)` diverges (chr(128) is multi-byte UTF-8,
    * shifting every later frame boundary). The synthetic corpus is
    * lowercase ASCII ≤ 122, inside the safe range; a real codec
    * replacement makes the question moot (the stub markers bound it). */
  def reencodeLossyStub(media: Dataset[MediaRow],
                        idOffset: Long = 0L): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // --- STUB lossy re-encode: replace with codec decode->encode ---
        val out = new Array[Byte](r.media.length)
        var i = 0
        while (i < out.length) {
          out(i) = if (i % 64 == 31) (r.media(i) + 2).toByte else r.media(i)
          i += 1
        }
        // ---------------------------------------------------------------
        MediaRow(r.doc_id + idOffset, out, r.format + ";lossy")
      }
    }
  }

  /** m08: perceptual NEAR-dup pairs — [[frameOverlap]] with Hamming
    * tolerance, the media twin of d05's SimHash banding: 64-bit frame
    * dHashes split into 4×16-bit bands (lossless for Hamming ≤ 3 by
    * pigeonhole — ≤ 3 flipped bits leave ≥ 1 band intact), candidates
    * from the band equi-join, verified by exact popcount of the XOR.
    * Catches what the exact matcher misses: a lossy re-encode that
    * flips a couple of gradient signs still shares a band with its
    * original and verifies within `maxHamming`.
    *
    * `maxBandDocs` is the [[frameOverlap]] skew guard at the band level:
    * a band key carried by too many frame postings is boilerplate
    * (flat gradients, test patterns) and is dropped before the
    * self-join, bounding per-key fan-out at C(N,2). Shuffles: band
    * aggregate + band equi-join + pair aggregate — no all-pairs stage;
    * the verify is a scan-side popcount, not a join.
    *
    * Input: (idCol, hashCol) frame fingerprint rows. Output:
    * (a_id, b_id, n_near) — distinct a-side fingerprints with ≥ 1
    * near-match in b. */
  def frameNearOverlap(frames: DataFrame, idCol: String, hashCol: String,
                       maxHamming: Int = 3,
                       maxBandDocs: Int = 16): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      "4x16-bit banding only covers Hamming distance <= 3")
    val perDoc = frames.select(col(idCol), col(hashCol).as("fp")).distinct()
    val bands = perDoc.select(col(idCol), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("bk"))): _*))
        .as("bs"))
      .select(col(idCol), col("fp"),
        col("bs.band").as("band"), col("bs.bk").as("bk"))
    val keep = bands.groupBy(col("band"), col("bk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBandDocs)
      .select(col("band"), col("bk"))
    // Materialized once (the justified-checkpoint pattern): both
    // self-join sides read this frame — without it the frame demux +
    // fingerprint scan and the cap aggregate would run twice.
    val kb = bands.join(keep, Seq("band", "bk"), "left_semi").localCheckpoint()
    kb.select(col("band"), col("bk"), col(idCol).as("a_id"), col("fp").as("a_fp"))
      .join(kb.select(col("band"), col("bk"), col(idCol).as("b_id"),
        col("fp").as("b_fp")), Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_fp"), col("b_fp"))
      .distinct()
      .filter(expr(s"bit_count(a_fp ^ b_fp) <= $maxHamming"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(countDistinct(col("a_fp")).as("n_near"))
  }

  /** Frame-energy gate — the "drop silence / black frames" preprocessing
    * step that runs BEFORE fingerprinting or feature extraction in any
    * real media pipeline (dead frames carry no signal, bloat every
    * downstream join, and — being identical across unrelated media — are
    * exactly the boilerplate m04/m05's frequency cap exists to fight;
    * cheaper to never emit them). Energy = the integer byte-variance
    * numerator n·Σx² − (Σx)² ([[graft.functions.ByteEnergy]], exact
    * integer arithmetic so the keep flag is engine-stable): a constant
    * payload scores exactly 0, content scores thousands. Map-only — the
    * gate runs scan-side in the same codegen stage as the demux, no
    * shuffle. `minVariance` is in whole variance units; the compare runs
    * entirely in integers (threshold = n²·minVariance), so the keep flag
    * can never dither on an FP boundary. */
  def frameEnergyFilter(frames: DataFrame, frameCol: String = "frame",
                        minVariance: Long = 4L): DataFrame =
    frames.filter(
      graft.functions.ByteEnergy.byteEnergy(col(frameCol)) >=
        length(col(frameCol)).cast("long") * length(col(frameCol)).cast("long")
          * lit(minVariance))

  /** Cross-media content-copy detection over sampled frames: every media
    * pair sharing at least one (distinct) frame fingerprint, with the
    * shared-frame count — who re-encoded whose content. Composes the
    * multimodal demux ([[sampleFrames]] → fingerprints) with the dedup
    * family's equi-join discipline: the join key is the frame hash, never
    * an all-pairs comparison.
    *
    * `maxFrameDocs` is the skew guard, same role as d03's bucket cap: a
    * frame appearing in more than N media is BOILERPLATE (intros, test
    * patterns, silence), contributes C(n,2) pairs per hash, and says
    * nothing about copying — it is dropped before the self-join, so the
    * within-hash pair fan-out is bounded at C(N,2) by construction.
    * Input: (idCol, hashCol) frame fingerprint rows (duplicates per media
    * collapse first). Output: (a_id, b_id, n_shared). */
  def frameOverlap(frames: DataFrame, idCol: String, hashCol: String,
                   maxFrameDocs: Int = 16): DataFrame = {
    val perDoc = frames.select(col(idCol), col(hashCol)).distinct()
    val keepHashes = perDoc.groupBy(col(hashCol))
      .agg(count(lit(1)).as("nf"))
      .filter(col("nf") >= 2 && col("nf") <= maxFrameDocs)
      .select(col(hashCol))
    val kept = perDoc.join(keepHashes, Seq(hashCol), "left_semi")
    val a = kept.select(col(hashCol), col(idCol).as("a_id"))
    val b = kept.select(col(hashCol), col(idCol).as("b_id"))
    a.join(b, Seq(hashCol))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** m07: perceptual media dedup APPLY — close the loop m05 opens: from
    * the pair stream ([[frameOverlap]] over [[graft.functions.DHash64]]
    * fingerprints — re-encodes match their originals because the dHash
    * survives monotone byte remaps), cluster with the dedup family's
    * pointer-jumping [[graft.operators.Dedup.connectedComponents]] and
    * keep ONE representative per cluster (the min id — the cluster
    * label, the d09 convention), dropping every other member. A
    * re-encoded copy is removed even though every byte differs; the
    * original survives.
    *
    * Plan shape: clustering runs over the PAIR population (bounded by
    * m05's maxFrameDocs cap, never corpus²); the apply is one LEFT ANTI
    * hash join of the media ids against the non-representative cluster
    * members (tiny in the expected regime — broadcast). The media
    * payloads never join. Output: the surviving rows of `media`. */
  def perceptualDedupApply(media: DataFrame, idCol: String,
                           pairs: DataFrame,
                           aCol: String = "a_id",
                           bCol: String = "b_id"): DataFrame =
    perceptualDedupApplyFromClusters(media, idCol,
      graft.operators.Dedup.connectedComponents(pairs, aCol, bCol))

  /** The apply half alone, for callers holding a standing (id, cluster)
    * artifact (the memoized detect-once/report-many shape): one LEFT
    * ANTI join against the non-representative members. */
  def perceptualDedupApplyFromClusters(media: DataFrame, idCol: String,
                                       clusters: DataFrame): DataFrame = {
    val drops = clusters
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    media.join(drops, Seq(idCol), "left_anti")
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * chunk. STUB chunking stands in for demux; the explode-shaped output
    * (one row per sampled frame) is the real contract. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = r.media.length / frameBytes
      (0 until n by stride).map { f =>
        Frame(r.doc_id, f, r.media.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }
}
