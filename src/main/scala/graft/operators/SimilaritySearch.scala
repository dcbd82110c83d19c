package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]] — the exact baseline: broadcast the (small) query
  *    set against the full corpus; one scan, no shuffle of the corpus side;
  *    per-query top-k via window rank. This is the right plan at any scale
  *    when |queries| is small: the corpus streams through executors once.
  *  - [[thresholdPairs]] — exact all-pairs above a cosine threshold (the
  *    oracle-checkable ground truth; O(N²), only for modest N).
  *  - [[annTopK]] — the scale path: random-hyperplane LSH bucketing turns
  *    all-pairs into per-bucket brute force. Hyperplanes are derived from a
  *    deterministic hash (no RNG state), so results are reproducible across
  *    runs and cluster layouts.
  */
object SimilaritySearch {

  /** Exact top-k neighbours for each query vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     isQuery: Column, k: Int): DataFrame = {
    val q = emb.filter(isQuery).select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val c = emb.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosineSim(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** All pairs (a_id < b_id) with cosine similarity above `threshold`. */
  def thresholdPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("a_id"), col(vecCol).as("av"))
    val b = emb.select(col(idCol).as("b_id"), col(vecCol).as("bv"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", cosineSim(col("av"), col("bv")))
      .filter(col("cos") > threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
  }

  /** Hyperplane sign bits per hash table (bucket space 2^bits) and number
    * of independent tables. Multi-table LSH: a pair is a candidate when it
    * collides in ANY table — recall compounds across tables
    * (1 − (1 − p^bits)^tables) while each table's join stays selective. */
  val HyperplaneBits = 6
  val HashTables = 8

  /** Deterministic pseudo-random hyperplane matrix (bits × dim) in [-1, 1],
    * seeded by (table, bit, dim) through MurmurHash3 — stable across JVMs. */
  def hyperplanes(dim: Int, bits: Int = HyperplaneBits,
                  table: Int = 0): Seq[Seq[Double]] =
    Seq.tabulate(bits, dim) { (j, d) =>
      val h = scala.util.hashing.MurmurHash3.productHash((table, j, d))
      (h % 10000) / 10000.0
    }

  /** LSH bucket id for a vector: sign bits of the hyperplane projections. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val proj = aggregate(
        zip_with(vec, typedlit(p), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (table, bucket) keys across all hash tables, as one array column. */
  def lshTableKeys(vec: Column, dim: Int, bits: Int = HyperplaneBits,
                   tables: Int = HashTables): Column =
    array((0 until tables).map { t =>
      struct(lit(t).as("t"), lshBucket(vec, hyperplanes(dim, bits, t)).as("bucket"))
    }: _*)

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes its
    * `nProbe` nearest cells and scores exactly within them. The scale
    * path when the corpus is huge and reusable: cell assignment is one
    * linear pass (broadcastable centroids), the search join shuffles on
    * cell id only, and recall/cost tunes via nProbe. Seeded — results are
    * reproducible. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              isQuery: Column, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = emb.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol)).as("fv"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCells).setSeed(42L).setMaxIter(10).setFeaturesCol("fv")
    val model = km.fit(vecs)
    val assigned = model.transform(vecs)
      .select(col(idCol), col(vecCol), col("prediction").as("cell"))

    // Queries probe their nProbe nearest centroids (centroid table is tiny
    // -> literal broadcast via crossJoin of a local array).
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq
    val centDf = emb.sparkSession.createDataFrame(centroids).toDF("cell", "cvec")
    val q = assigned.filter(isQuery).select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("cdist").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("cdist", cosineSim(col("qv"), col("cvec")))
      .withColumn("prnk", row_number().over(probeW))
      .filter(col("prnk") <= nProbe)
      .select(col("q_id"), col("qv"), col("cell"))

    val c = assigned.select(col(idCol).as("n_id"), col(vecCol).as("nv"), col("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    probes.join(c, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosineSim(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** Approximate top-k: exact scoring restricted to multi-table LSH bucket
    * mates. The N×M cross join becomes an equi-join on (table, bucket) —
    * shuffle keyed on the bucket id, candidate set ∪ over tables, then one
    * distinct + window per query. `dim` must match the embedding width. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              isQuery: Column, k: Int, dim: Int,
              bits: Int = HyperplaneBits, tables: Int = HashTables): DataFrame = {
    val keyed = emb.select(col(idCol), col(vecCol),
      explode(lshTableKeys(col(vecCol), dim, bits, tables)).as("tk"))
      .select(col(idCol), col(vecCol), col("tk.t").as("t"), col("tk.bucket").as("bucket"))
    val q = keyed.filter(isQuery)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"), col("t"), col("bucket"))
    val c = keyed.select(col(idCol).as("n_id"), col(vecCol).as("nv"), col("t"), col("bucket"))
    val candidates = q.join(c, Seq("t", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("qv"), col("n_id"), col("nv"))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    candidates
      .withColumn("cos", cosineSim(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }
}
