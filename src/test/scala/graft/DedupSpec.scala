package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch, TextAnalysis => TA}

/** Sketch operators validated against exact ground truth on the testdata —
  * the correctness check the DuckDB oracle can't express. */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Exact all-pairs jaccard >= threshold (brute force, 500 docs). */
  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    val base = docs
      .select($"doc_id", TA.shingles3(TA.words($"text")).as("sh"))
      .filter(size($"sh") > 0)
    val a = base.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = base.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    a.join(b, $"a_id" < $"b_id")
      .withColumn("j",
        size(array_intersect($"a_sh", $"b_sh")).cast("double") /
          size(array_union($"a_sh", $"b_sh")).cast("double"))
      .filter($"j" >= threshold)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
  }

  test("minhash-LSH finds every exact near-dup pair at jaccard >= 0.8 (recall=1 here)") {
    val truth = exactPairs(0.8)
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    val base = docs
      .select($"doc_id", TA.shingles3(TA.words($"text")).as("sh"))
      .filter(size($"sh") > 0)
    val got = Dedup.minhashNearDups(base, "doc_id", "sh", threshold = 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(got),
      s"missed pairs: ${truth -- got}") // verification stage bounds precision,
    // and every reported pair really has jaccard >= 0.8:
    assert(got.subsetOf(truth))
  }

  test("minhash candidates are a small fraction of all pairs (LSH prunes)") {
    val base = docs
      .select($"doc_id", TA.shingles3(TA.words($"text")).as("sh"))
      .filter(size($"sh") > 0)
    val nDocs = base.count()
    val candidates = Dedup.minhashCandidates(base, "doc_id", "sh").count()
    assert(candidates < nDocs * nDocs / 20,
      s"$candidates candidates for $nDocs docs — LSH not pruning")
  }

  test("simhash pairs at hamming<=3 overlap heavily with exact jaccard dups") {
    val truth = exactPairs(0.9)
    assert(truth.nonEmpty, "testdata should contain jaccard>=0.9 near-dups")
    val base = docs.select($"doc_id", TA.words($"text").as("toks"))
    val got = Dedup.simhashNearDups(base, "doc_id", "toks", maxHamming = 3)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    val hit = truth.count(got.contains)
    assert(hit >= truth.size / 2,
      s"simhash found $hit of ${truth.size} jaccard>=0.9 pairs")
  }

  test("IVF top-k achieves good recall vs exact top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = SimilaritySearch.bruteForceTopK(
      emb, "vec_id", "embedding", $"vec_id" < 20, k = 3)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivf = SimilaritySearch.ivfTopK(
      emb, "vec_id", "embedding", $"vec_id" < 20, k = 3, nCells = 16, nProbe = 4)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // probing 4/16 cells scans ~25% of the corpus; on near-orthogonal
    // random vectors the nearest neighbour only sometimes shares a cell —
    // demand clearly-better-than-scan-fraction-at-random performance.
    assert(recall > 0.25, s"IVF recall $recall")
  }

  test("ANN top-k achieves decent recall vs exact top-k on bucketed queries") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = SimilaritySearch.bruteForceTopK(
      emb, "vec_id", "embedding", $"vec_id" < 20, k = 3)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val approxRows = SimilaritySearch.annTopK(
      emb, "vec_id", "embedding", $"vec_id" < 20, k = 3, dim = 64)
      .select($"q_id", $"n_id", $"rnk").as[(Long, Long, Long)].collect()
    val approx = approxRows.map(r => (r._1, r._2)).toSet
    // Multi-table LSH (8 tables × 6 bits, union of candidates) on random
    // near-orthogonal vectors: recall is modest but must beat chance
    // (random pick of 3 of 500 ≈ 0.6%) by a wide margin.
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall > 0.05, s"ANN recall $recall vs exact")
    // Structural guarantees: ≤ k results per query, ranks distinct 1..k,
    // self-matches excluded.
    approxRows.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 3, s"query $q returned ${rows.length} rows")
      assert(rows.map(_._3).toSet == (1L to rows.length).toSet,
        s"query $q ranks: ${rows.map(_._3).toSeq}")
    }
    assert(approx.forall { case (q, n) => q < 20 && q != n })
  }
}

class MultimodalSpec extends SparkSpecBase {
  import graft.multimodal.Multimodal

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("binary payload table has the right schema") {
    val media = Multimodal.asMediaTable(docs.limit(10))
    assert(media.schema("media").dataType.typeName == "binary")
    assert(media.count() == 10)
  }

  test("stub decode yields normalized fixed-width features, deterministically") {
    val media = Multimodal.asMediaTable(docs.limit(50))
    val feats1 = Multimodal.decodeFeatures(media, dim = 16)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val feats2 = Multimodal.decodeFeatures(media.repartition(5), dim = 16)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(feats1 == feats2, "decode must not depend on partitioning")
    feats1.values.foreach { f =>
      assert(f.size == 16)
      assert(math.abs(f.sum - 1.0f) < 1e-3, s"histogram should be L1-normalised, got ${f.sum}")
    }
  }

  test("frame sampling emits every stride-th chunk with index") {
    val media = Multimodal.asMediaTable(docs.limit(5))
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length == 32))
    assert(frames.forall(_.frame_idx % 2 == 0))
  }
}
