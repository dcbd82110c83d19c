package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch, TextAnalysis => TA}

/** One-off measurement harness for the round-11 banded-oracle conversion:
  * prints, per SF dir, the actual recall / separability numbers of every
  * approximate op against its exact twin, so the declared floors in the
  * driver-visible band checks are set from measurements, not hope. Run:
  * `sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.01"`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def docs = graft.sources.Sources.table(spark, dir, "documents")
    def emb = graft.sources.Sources.table(spark, dir, "embeddings")

    def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(col(a), col(b)).as[(Long, Long)].collect().toSet

    // ---- ANN cosine family ------------------------------------------------
    val exactCos = pairSet(SimilaritySearch.bruteForceTopK(
      emb, "vec_id", "embedding", isQuery = col("vec_id") < 10, k = 3), "q_id", "n_id")
    val s03 = pairSet(SimilaritySearch.annTopK(
      emb, "vec_id", "embedding", isQuery = col("vec_id") < 10, k = 3), "q_id", "n_id")
    println(s"RECALL s03_lsh: ${(exactCos & s03).size}/${exactCos.size}")
    val s04 = pairSet(SimilaritySearch.ivfTopK(
      emb, "vec_id", "embedding", isQuery = col("vec_id") < 10, k = 3), "q_id", "n_id")
    println(s"RECALL s04_ivf: ${(exactCos & s04).size}/${exactCos.size}")
    val exactAll = pairSet(SimilaritySearch.bruteForceTopK(
      emb, "vec_id", "embedding", isQuery = lit(true), k = 3), "q_id", "n_id")
    val s13 = pairSet(SimilaritySearch.annTopK(
      emb, "vec_id", "embedding", isQuery = lit(true), k = 3), "q_id", "n_id")
    println(s"RECALL s13_knn_graph: ${(exactAll & s13).size}/${exactAll.size}")
    val s11 = pairSet(SimilaritySearch.ivfTopK(
      emb, "vec_id", "embedding", isQuery = col("vec_id") < 10, k = 3,
      nProbe = 8, hier = true), "q_id", "n_id")
    println(s"RECALL s11_hier: ${(exactCos & s11).size}/${exactCos.size}")

    // ---- MIPS -------------------------------------------------------------
    val exactIp = pairSet(SimilaritySearch.mipsTopK(
      emb, "vec_id", "embedding", isQuery = col("vec_id") < 10, k = 3), "q_id", "n_id")
    val s09 = pairSet(SimilaritySearch.annMipsTopK(
      emb, "vec_id", "embedding", isQuery = col("vec_id") < 10, k = 3), "q_id", "n_id")
    println(s"RECALL s09_mips: ${(exactIp & s09).size}/${exactIp.size}")

    // ---- IVF-PQ twins -----------------------------------------------------
    val base = emb.select(col("vec_id"), col("embedding"))
    val twins = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val s10 = SimilaritySearch.ivfPqTopK(base.unionByName(twins), "vec_id",
        "embedding", isQuery = col("vec_id") < 10, k = 3,
        nCells = 16, nProbe = 8, m = 8, kCodes = 64)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val twinHits = (0L until 10L).count(q => s10.get(q).exists(_.contains(q + 100000L)))
    println(s"S10 twin-in-top3: $twinHits/10")

    // ---- s05 semantic dedup drop set --------------------------------------
    val baseV = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val aug = Dedup.withPlantedNearDups(baseV, "vec_id", "v",
      pred = col("vec_id") < 25, idOffset = 100000L)
    val idx5 = SimilaritySearch.buildIvfIndex(aug, "vec_id", "v", nCells = 16,
      persist = false)
    val drops = SimilaritySearch.semanticDedup(idx5, threshold = 0.95)
      .filter(!col("keep"))
      .select(col("vec_id"), col("keeper")).as[(Long, Long)].collect().toSet
    val planted = (0L until 25L).map(i => (i + 100000L, i)).toSet
    println(s"S05 drops==planted: ${drops == planted} " +
      s"(extra=${(drops -- planted).size}, missing=${(planted -- drops).size})")

    // ---- d04: minhash@0.5 vs exact-in-block@0.8 ---------------------------
    val exact08 = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      "n_chars", threshold = 0.8,
      maxBucketSize = Some(graft.queries.PipelineQueries.D03BucketCap)),
      "a_id", "b_id")
    val mh = {
      val b = Dedup.spreadToParallelism(docs)
        .select(col("doc_id"),
          graft.functions.WordShingles.wordShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      pairSet(Dedup.minhashNearDups(b, "doc_id", "sh", threshold = 0.5), "a_id", "b_id")
    }
    println(s"D04 exact08=${exact08.size} found=${(exact08 & mh).size} " +
      s"(mh total=${mh.size})")

    // ---- d05: simhash vs exact@0.9 ----------------------------------------
    val exact09 = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      "n_chars", threshold = 0.9,
      maxBucketSize = Some(graft.queries.PipelineQueries.D03BucketCap)),
      "a_id", "b_id")
    val sh05 = {
      val b = docs.select(col("doc_id"), TA.words(col("text")).as("toks"))
      pairSet(Dedup.simhashNearDups(b, "doc_id", "toks", maxHamming = 3), "a_id", "b_id")
    }
    println(s"D05 exact09=${exact09.size} found=${(exact09 & sh05).size} " +
      s"(simhash total=${sh05.size})")

    // ---- d14: delta-minhash recall vs exact@0.9 ---------------------------
    val all = docs
    val delta = all.filter(pmod(col("doc_id"), lit(10)) === 7)
    val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val exactD = Dedup.deltaJaccardPairs(delta, corpus, "doc_id", "text",
        "n_chars", threshold = 0.9, lengthBucketWidth = Int.MaxValue)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    val approxD = graft.SparkEntry.queries("d14_delta_minhash")(spark, dir)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    println(s"D14 exact09=${exactD.size} found=${(exactD & approxD).size}")

    // ---- t17: per-source mean quality separability ------------------------
    val clf = TA.trainQualityClassifier(docs, "doc_id", "text",
      isSeed = col("source") === "src0", buckets = 1024)
    val means = TA.scoreQualityClassifier(docs, "doc_id", "text", clf)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).agg(avg(col("quality")).as("m"), count(lit(1)).as("n"))
      .orderBy(col("source"))
      .as[(String, Double, Long)].collect()
    means.foreach { case (src, m, n) => println(f"T17 $src mean=$m%.4f n=$n") }

    // ---- t17 planted-seed construction ------------------------------------
    val marker = array(Seq("qalpha", "qbeta", "qgamma", "qdelta",
      "qepsilon", "qzeta").map(lit): _*)
    val plantedSeeds = docs.filter(col("doc_id") < 40).select(
      (col("doc_id") + 400000L).as("doc_id"),
      array_join(transform(sequence(lit(0), lit(11)),
        i => element_at(marker,
          (pmod(i + pmod(col("doc_id"), lit(6)), lit(6)) + 1).cast("int"))),
        " ").as("text"))
    val augDocs = docs.select(col("doc_id"), col("text")).unionByName(plantedSeeds)
    val clf2 = TA.trainQualityClassifier(augDocs, "doc_id", "text",
      isSeed = col("doc_id") >= 400000L, buckets = 1024)
    val scored = TA.scoreQualityClassifier(augDocs, "doc_id", "text", clf2)
      .select(col("doc_id"), col("quality")).as[(Long, Double)].collect()
    val seedScores = scored.filter(_._1 >= 400000L).map(_._2)
    val rawScores = scored.filter(_._1 < 400000L).map(_._2)
    println(f"T17P seeds: n=${seedScores.length} min=${seedScores.min}%.4f " +
      f"raw: n=${rawScores.length} max=${rawScores.max}%.4f")

    // balanced-fit variant: train on 40 planted + 40 raw, score everything
    val fitInput = docs.filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text")).unionByName(plantedSeeds)
    val clf3 = TA.trainQualityClassifier(fitInput, "doc_id", "text",
      isSeed = col("doc_id") >= 400000L, buckets = 1024)
    val scored3 = TA.scoreQualityClassifier(augDocs, "doc_id", "text", clf3)
      .select(col("doc_id"), col("quality")).as[(Long, Double)].collect()
    val s3 = scored3.filter(_._1 >= 400000L).map(_._2)
    val r3 = scored3.filter(_._1 < 400000L).map(_._2)
    println(f"T17B seeds: min=${s3.min}%.4f raw: max=${r3.max}%.4f")

    spark.stop()
  }
}
