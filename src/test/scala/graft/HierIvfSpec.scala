package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Hierarchical (two-level) IVF coarse quantizer — the fix for the one
  * superlinear build-side curve in the round-10 stress sweep (flat cell
  * assignment is n·nCells; two-level is n·2√nCells).
  *
  * Ground truth: the spec recomputes EVERY vector's assignment driver-side
  * in the exact arithmetic the plan runs — coarse group by nearest coarse
  * centroid, fine cell by argmin(‖c‖² − 2·v·c) over the group's cells in
  * cell-ascending order with a strict < (ties toward the lowest cell id) —
  * and requires bit-equality, not a recall bound.
  */
class HierIvfSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** 8 well-separated planted clusters in 16-d; deterministic LCG noise so
    * every distance margin is huge relative to FP accumulation order. */
  private def plantedVecs(n: Int): Seq[(Long, Array[Float])] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    (0L until n.toLong).map { i =>
      val c = (i % 8).toInt
      val v = Array.tabulate(16) { d =>
        (10.0 * ((c + d) % 8) + next()).toFloat
      }
      (i, v)
    }
  }

  private def sqDist(v: Array[Float], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < math.min(v.length, c.length)) {
      val dx = v(i).toDouble - c(i); s += dx * dx; i += 1
    }
    s
  }

  private def dotFold(v: Array[Float], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < math.min(v.length, c.length)) { s += v(i).toDouble * c(i); i += 1 }
    s
  }

  test("hier assignment == driver-side argmin over the two-level geometry, every vector") {
    val s = spark
    import s.implicits._
    val df = plantedVecs(320).toDF("vec_id", "embedding")
    val hb = SimilaritySearch.buildIvfIndexHierFull(
      df, "vec_id", "embedding", nCells = 16, persist = false)
    val cnorms = hb.fineCentroidsD.map(_.foldLeft(0.0)((a, x) => a + x * x))
    val assigned = hb.index.assigned
      .select(col("vec_id"), col("embedding"), col("cell"))
      .as[(Long, Array[Float], Int)].collect()
    assert(assigned.length === 320)
    val byId = plantedVecs(320).toMap
    val coarseNorms = hb.coarseCentroids.map(_.foldLeft(0.0)((a, x) => a + x * x))
    assigned.foreach { case (id, _, cell) =>
      val v = byId(id)
      // Level 1: the plan's coarse argmin HOF — ‖c‖² − 2·v·c, strict <,
      // index-ascending ties.
      var g = 0
      var gBest = Double.MaxValue
      hb.coarseCentroids.zipWithIndex.foreach { case (c, j) =>
        val d = coarseNorms(j) - 2.0 * dotFold(v, c)
        if (d < gBest) { gBest = d; g = j }
      }
      // Level 2: strict-< argmin of ‖c‖² − 2·v·c over the group's cells,
      // cell-ascending — exactly the plan's HOF.
      var expected = -1
      var best = Double.MaxValue
      hb.groupOfCell.indices.foreach { cellId =>
        if (hb.groupOfCell(cellId) == g) {
          val d = cnorms(cellId) - 2.0 * dotFold(v, hb.fineCentroidsD(cellId))
          if (d < best) { best = d; expected = cellId }
        }
      }
      assert(cell === expected, s"vec $id: assigned $cell, expected $expected")
    }
  }

  test("hier build yields exactly nCells fine cells on a sample-rich corpus") {
    val s = spark
    import s.implicits._
    val df = plantedVecs(320).toDF("vec_id", "embedding")
    val idx = SimilaritySearch.buildIvfIndexHier(
      df, "vec_id", "embedding", nCells = 16, persist = false)
    assert(idx.centroids.length === 16)
    assert(idx.centroids.map(_._1).sorted.sameElements(0 until 16))
  }

  test("hier assignment plan has no shuffle — scan + broadcast joins only") {
    val s = spark
    import s.implicits._
    val df = plantedVecs(320).toDF("vec_id", "embedding")
    val idx = SimilaritySearch.buildIvfIndexHier(
      df, "vec_id", "embedding", nCells = 16, persist = false)
    idx.assigned.queryExecution.toRdd.count()
    val plan = idx.assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in hier assignment plan:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"unexpected shuffle in hier assignment plan:\n$plan")
  }

  test("byte-identical twin vectors land in the same cell and probe top-1 each other") {
    val s = spark
    import s.implicits._
    val base = plantedVecs(320)
    val twins = base.filter(_._1 < 10).map { case (id, v) => (id + 100000L, v) }
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val idx = SimilaritySearch.buildIvfIndexHier(
      df, "vec_id", "embedding", nCells = 16, persist = false)
    val cells = idx.assigned.select(col("vec_id"), col("cell"))
      .as[(Long, Int)].collect().toMap
    (0L until 10L).foreach { id =>
      assert(cells(id) === cells(id + 100000L),
        s"twin of $id split across cells")
    }
    val top1 = SimilaritySearch
      .probeIvf(idx, isQuery = col("vec_id") < 10, k = 1, nProbe = 1)
      .select(col("q_id"), col("n_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(top1.length === 10)
    top1.foreach { case (q, n, c) =>
      assert(n === q + 100000L, s"query $q top-1 was $n, not its twin")
      assert(c === 1.0)
    }
  }

  test("save/load round-trip: probe results identical") {
    val s = spark
    import s.implicits._
    val df = plantedVecs(320).toDF("vec_id", "embedding")
    val idx = SimilaritySearch.buildIvfIndexHier(
      df, "vec_id", "embedding", nCells = 16, persist = false)
    val dir = tmpDir("hier-ivf")
    idx.save(dir)
    val loaded = SimilaritySearch.loadIvfIndex(spark, dir, "vec_id", "embedding")
    def run(i: SimilaritySearch.IvfIndex) = SimilaritySearch
      .probeIvf(i, isQuery = col("vec_id") < 10, k = 3, nProbe = 4)
      .select("q_id", "n_id", "cos", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getAs[Number](3).longValue))
      .sortBy(r => (r._1, r._4))
    assert(run(idx).sameElements(run(loaded)))
  }

  test("hier probe recall on the real embeddings corpus vs exact brute force") {
    val emb = graft.sources.Sources.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val exact = SimilaritySearch
      .bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch
      .ivfTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 3,
        nCells = 16, nProbe = 8, hier = true)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"hier IVF recall $recall below floor")
  }

  test("empty hash-sample falls back to a full fit — flat and hier (corpus never vanishes)") {
    val s = spark
    import s.implicits._
    val df = plantedVecs(3).toDF("vec_id", "embedding")
    Seq(
      SimilaritySearch.buildIvfIndex(df, "vec_id", "embedding",
        nCells = 4, sampleMod = 1000, persist = false),
      SimilaritySearch.buildIvfIndexHier(df, "vec_id", "embedding",
        nCells = 4, sampleMod = 1000, persist = false)
    ).foreach { idx =>
      assert(idx.centroids.nonEmpty)
      assert(idx.assigned.count() === 3)
    }
  }

  test("ivfPqTopK with hierarchical cells keeps the planted-twin top-1 signal") {
    val s = spark
    import s.implicits._
    // The real embeddings corpus (the s10 convention — the synthetic
    // planted clusters quantize to colliding PQ codes, which is a
    // property of that corpus, not of the cell assignment under test).
    val base = graft.sources.Sources.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val twins = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val top1 = SimilaritySearch
      .ivfPqTopK(base.unionByName(twins), "vec_id", "embedding",
        isQuery = col("vec_id") < 10,
        k = 1, nCells = 16, nProbe = 8, m = 8, kCodes = 64, hierCells = true)
      .select(col("q_id"), col("n_id"))
      .as[(Long, Long)].collect()
    assert(top1.length === 10)
    top1.foreach { case (q, n) =>
      assert(n === q + 100000L, s"query $q top-1 was $n, not its twin")
    }
  }

  test("empty corpus still yields an empty, probe-safe index") {
    val s = spark
    import s.implicits._
    val df = plantedVecs(0).toDF("vec_id", "embedding")
    val idx = SimilaritySearch.buildIvfIndexHier(
      df, "vec_id", "embedding", nCells = 4, persist = false)
    assert(idx.centroids.isEmpty)
    assert(SimilaritySearch.probeIvf(idx, col("vec_id") < 10, k = 3).count() === 0)
  }
}
