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

  /** Embedding corpus with KNOWN near-neighbour structure: `nClusters`
    * deterministic pseudo-random 64-dim centers, `perCluster` members each
    * (center + small deterministic jitter → within-cluster cosine ≈ 0.99,
    * cross-cluster near-orthogonal). A broken bucketing change cannot pass a
    * recall bound on this set by luck. */
  private def plantedClusters(nClusters: Int = 20, perCluster: Int = 5) = {
    def unit(seed: Int): Array[Double] = {
      val v = Array.tabulate(64) { d =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, d))
        (h % 10000) / 10000.0
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      val center = unit(c)
      val jitter = unit(1000 + c * perCluster + m)
      val vec = center.zip(jitter).map { case (x, j) => (x + 0.07 * j).toFloat }
      ((c * perCluster + m).toLong, vec.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** Exact top-k pairs for one query per cluster (member 0). */
  private def exactTopK(emb: org.apache.spark.sql.DataFrame, k: Int) =
    SimilaritySearch.bruteForceTopK(
      emb, "vec_id", "embedding", $"vec_id" % 5 === 0, k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet

  test("IVF top-k recall >= 0.8 on planted neighbour clusters") {
    val emb = plantedClusters()
    val exact = exactTopK(emb, k = 3)
    assert(exact.nonEmpty)
    val index = SimilaritySearch.buildIvfIndex(emb, "vec_id", "embedding", nCells = 16)
    try {
      val ivf = SimilaritySearch.probeIvf(index, $"vec_id" % 5 === 0, k = 3, nProbe = 4)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      val recall = exact.count(ivf.contains).toDouble / exact.size
      assert(recall >= 0.8, s"IVF recall $recall on planted clusters")
    } finally index.unpersist()
  }

  test("IVF index round-trips through save/load; sampled fit assigns everything") {
    val emb = plantedClusters()
    val index = SimilaritySearch.buildIvfIndex(
      emb, "vec_id", "embedding", nCells = 8, sampleMod = 3)
    try {
      assert(index.assigned.count() == emb.count(),
        "every corpus vector must get a cell even when the fit is sampled")
      val dir = tmpDir("ivf")
      index.save(dir)
      val loaded = SimilaritySearch.loadIvfIndex(spark, dir, "vec_id", "embedding")
      val direct = SimilaritySearch.probeIvf(index, $"vec_id" % 5 === 0, k = 3)
        .collect().map(_.toSeq).toSet
      val viaDisk = SimilaritySearch.probeIvf(loaded, $"vec_id" % 5 === 0, k = 3)
        .collect().map(_.toSeq).toSet
      assert(direct == viaDisk)
    } finally index.unpersist()
  }

  test("LSH ANN top-k recall >= 0.8 on planted neighbour clusters") {
    val emb = plantedClusters()
    val exact = exactTopK(emb, k = 3)
    val approxRows = SimilaritySearch.annTopK(
      emb, "vec_id", "embedding", $"vec_id" % 5 === 0, k = 3)
      .select($"q_id", $"n_id", $"rnk").as[(Long, Long, Long)].collect()
    val approx = approxRows.map(r => (r._1, r._2)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall $recall on planted clusters")
    // Structural guarantees: ≤ k results per query, ranks distinct 1..k,
    // self-matches excluded.
    approxRows.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 3, s"query $q returned ${rows.length} rows")
      assert(rows.map(_._3).toSet == (1L to rows.length).toSet,
        s"query $q ranks: ${rows.map(_._3).toSeq}")
    }
    assert(approx.forall { case (q, n) => q % 5 == 0 && q != n })
  }

  test("embedding dedup: bucketed pipeline equals exact all-pairs, plan has no BNLJ") {
    // Same augmentation as the d06 query: perturbed copies are true
    // near-dups (cosine ≈ 0.9996); everything else stays below 0.62.
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val copies = base.filter($"vec_id" < 25).select(
      ($"vec_id" + 100000).as("vec_id"),
      transform($"v", (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 7) - lit(3)))).as("v"))
    val aug = base.unionAll(copies)

    val bucketed = Dedup.embeddingNearDups(aug, "vec_id", "v", threshold = 0.9)
    val exact = SimilaritySearch.thresholdPairs(aug, "vec_id", "v", threshold = 0.9)
      .select($"a_id", $"b_id", $"cos").collect().map(_.toSeq).toSet
    assert(exact.size == 25, s"expected the 25 planted pairs, got ${exact.size}")
    assert(bucketed.collect().map(_.toSeq).toSet == exact)

    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed dedup must not fall back to an all-pairs join:\n$plan")
  }

  test("ngram-jaccard bucket cap: capped result is a deterministic subset of exact") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "n_chars", 0.2)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "n_chars", 0.2,
      maxBucketSize = Some(5))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact), "cap may only drop pairs, never invent them")
    // A cap at least as large as every bucket is a no-op.
    val roomy = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "n_chars", 0.2,
      maxBucketSize = Some(1000000))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(roomy == exact)
    // Deterministic: same truncation on re-run and under different partitioning.
    val again = Dedup.ngramJaccardPairs(docs.repartition(7), "doc_id", "text", "n_chars", 0.2,
      maxBucketSize = Some(5))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(again == capped)
  }

  test("embedding dedup candidates are a small fraction of all pairs (LSH prunes)") {
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = base.count()
    val keyed = SimilaritySearch.lshKeyed(base, "vec_id", "embedding", bits = 8, tables = 12)
    val a = keyed.select($"vec_id".as("a_id"), $"t", $"bucket")
    val b = keyed.select($"vec_id".as("b_id"), $"t", $"bucket")
    val candidates = a.join(b, Seq("t", "bucket"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct().count()
    assert(candidates < n * n / 2 / 5,
      s"$candidates candidate pairs for $n vectors — LSH not pruning")
  }

  test("semantic dedup (s05) drops every planted near-dup to its original, keeps the rest") {
    // Drives the actual s05 query, whose round-11 output IS the drop set
    // (dup_id, keeper): d06-style planted copies (cosine ≈ 0.9996 to
    // their originals; every other pair stays below 0.62, far under the
    // 0.95 threshold), so the drop set must be exactly the planted
    // construction — the same claim the driver oracle now hash-checks.
    val dropped = graft.queries.PipelineQueries.queries("s05_semantic_dedup")(spark, dir)
      .select($"dup_id", $"keeper")
      .as[(Long, Long)].collect().toSet
    val planted = (0L until 25L).map(i => (i + 100000L, i)).toSet
    assert(dropped == planted,
      s"extra drops: ${dropped -- planted}; missed: ${planted -- dropped}")
  }

  test("semantic dedup path-compresses keeper chains to a kept root") {
    // Unit vectors at angles 0, θ, 2θ, 3θ with cos θ = 0.97: adjacent
    // pairs clear the 0.95 threshold, every skip pair falls below it
    // (cos 2θ ≈ 0.882, cos 3θ ≈ 0.741). Raw min-partner keepers form the
    // chain 1←2←3←4; without compression 3's keeper (2) and 4's keeper (3)
    // are themselves drops. The 4-link chain needs two jump rounds.
    val th = math.acos(0.97)
    val vecs = (0 until 4).map { k =>
      (k + 1L, Seq(math.cos(k * th), math.sin(k * th)))
    }
    val assigned = vecs.toDF("vec_id", "v").withColumn("cell", lit(0))
    val index = SimilaritySearch.IvfIndex(
      centroids = Array((0, Array(1f, 0f))),
      assigned = assigned, idCol = "vec_id", vecCol = "v")
    val rows = SimilaritySearch.semanticDedup(index, threshold = 0.95)
      .select($"vec_id", $"keep", $"keeper")
      .as[(Long, Boolean, Option[Long])].collect()
      .map { case (id, keep, keeper) => id -> ((keep, keeper)) }.toMap
    assert(rows(1L) == ((true, None)), "chain root must be kept")
    assert(rows(2L) == ((false, Some(1L))))
    assert(rows(3L) == ((false, Some(1L))), "keeper must compress past dropped 2")
    assert(rows(4L) == ((false, Some(1L))), "keeper must compress past dropped 3")
  }
}

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.Dedup

  test("clusters a chain, a triangle, and a pair; transitivity via min label") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12 with extra edge,
    // isolated pair 20-21. Node 2's min neighbor is 1 only transitively
    // for 4 — exercises multi-iteration propagation.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
                    (10L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a 200-node chain converges within the budget (pointer jumping, O(log d))") {
    // Diameter 199: plain one-hop min propagation needs 199 rounds and
    // would exhaust maxIter=25; the label-chase self-join halves label
    // depth per round, so this closes in ~8.
    val n = 200
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
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

  test("resize caps payloads, passes small ones untouched, keeps every row") {
    val media = Multimodal.asMediaTable(docs.limit(50))
    val before = media.collect().map(r => r.doc_id -> r.media.length).toMap
    val cap = 100
    val resized = Multimodal.resize(media, maxBytes = cap).collect()
    assert(resized.length == before.size, "resize must not drop or add rows")
    resized.foreach { r =>
      assert(r.media.length <= cap, s"doc ${r.doc_id}: ${r.media.length} > $cap")
      if (before(r.doc_id) <= cap) {
        assert(r.media.length == before(r.doc_id), "within-budget payload must be untouched")
        assert(!r.format.endsWith(";resized"))
      } else assert(r.format.endsWith(";resized"))
    }
    // Deterministic across partitionings, like decode.
    val again = Multimodal.resize(media.repartition(7), maxBytes = cap)
      .collect().map(r => r.doc_id -> r.media.toSeq).toMap
    assert(again == resized.map(r => r.doc_id -> r.media.toSeq).toMap)
  }
}
