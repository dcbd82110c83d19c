package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProduct.dotProduct
import graft.operators.{Sampling, Sessionize, SimilaritySearch, TextAnalysis}

/** Round-4 operators: sessionization, token-budget sampling, MIPS,
  * n-gram census, duplication report. */
class Round4Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- sessionization ------------------------------------------------

  test("sessionize: events are partitioned into gap-consistent sessions") {
    val events = Seq(
      // user 1: three events 10 min apart, then a 2 h gap, then one more
      (1L, 1L, "2024-01-01 00:00:00.25", 1.0),
      (1L, 2L, "2024-01-01 00:10:00.25", 2.0),
      (1L, 3L, "2024-01-01 00:20:00.25", 3.0),
      (1L, 4L, "2024-01-01 02:20:00.25", 4.0),
      // user 2: single event
      (2L, 5L, "2024-01-01 05:00:00", 7.5))
      .toDF("user_id", "event_id", "ts_s", "value")
      .select($"user_id", $"event_id", $"ts_s".cast("timestamp").as("ts"), $"value")
    val out = Sessionize.sessions(events, "user_id", "ts", "event_id", "value",
      maxGap = lit(3600L * 1000000L)) // 1 h
      .orderBy($"user_id", $"sess_idx")
      .select($"user_id", $"sess_idx", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1L, 3L, 6.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 7.5)))
  }

  test("sessionize: exactly one shuffle — lag, counter, and aggregate share it") {
    val q = SparkEntry.queries("q43_sessionize")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
    // Sessions partition the events: per-session counts sum to the total.
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    val sessTotal = q.agg(sum($"n_events")).as[Long].head()
    assert(sessTotal == total, s"$sessTotal events in sessions vs $total input")
  }

  test("sessionize: a sub-second gap straddling the cutoff splits correctly") {
    // gap = cutoff + 1 microsecond must start a new session; gap = cutoff
    // must not. Seconds-granularity arithmetic would merge both.
    val cutoffUs = 1000000L // 1 s
    val events = Seq(
      (1L, 1L, "2024-01-01 00:00:00.000000", 0.0),
      (1L, 2L, "2024-01-01 00:00:01.000000", 0.0), // exactly 1 s: same session
      (1L, 3L, "2024-01-01 00:00:02.000001", 0.0)) // 1 s + 1 us: new session
      .toDF("user_id", "event_id", "ts_s", "value")
      .select($"user_id", $"event_id", $"ts_s".cast("timestamp").as("ts"), $"value")
    val n = Sessionize.sessions(events, "user_id", "ts", "event_id", "value",
      maxGap = lit(cutoffUs)).count()
    assert(n == 2, s"expected 2 sessions, got $n")
  }

  // ---- token-budget sampling -------------------------------------------

  test("tokenBudgetPerGroup admits a budget-bounded deterministic prefix") {
    val df = spark.range(0, 300)
      .select($"id".as("doc_id"), ($"id" % 3).cast("string").as("lang"),
        ($"id" % 7 + 1).as("n_tokens"))
    val budget = 50L
    val out = Sampling.tokenBudgetPerGroup(df, "lang", "doc_id", "n_tokens", budget)
    // Every admitted doc started strictly inside the budget...
    assert(out.filter($"cum_before" >= budget).isEmpty)
    // ...and nothing admissible was left out: per group, the tokens before
    // the LAST admitted doc are < budget and adding it crosses or meets
    // the limit for everything that follows.
    val perGroup = out.groupBy($"lang")
      .agg(count(lit(1)).as("n"), max($"cum_before").as("last_before"))
      .as[(String, Long, Long)].collect()
    assert(perGroup.length == 3)
    perGroup.foreach { case (_, n, lastBefore) =>
      assert(n >= 1 && lastBefore < budget)
    }
    val again = Sampling.tokenBudgetPerGroup(df, "lang", "doc_id", "n_tokens", budget)
    assert(out.exceptAll(again).isEmpty, "selection must be deterministic")
  }

  // ---- MIPS ------------------------------------------------------------

  test("dot_product expression matches a reference fold, interpreted and codegen'd") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, -5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(dotProduct($"a", $"b")).as[Double].head()
    assert(math.abs(got - (4.0 - 10.0 + 18.0)) < 1e-12)
    graft.functions.GraftFunctions.registerAll(spark)
    df.createOrReplaceTempView("dp_t")
    val sqlGot = spark.sql("SELECT dot_product(a, b) FROM dp_t").as[Double].head()
    assert(sqlGot == got)
  }

  test("mipsTopK ranks by inner product, not cosine") {
    // n_id 11 has a HUGE norm but lower cosine to the query than n_id 12;
    // MIPS must prefer 11, cosine must prefer 12.
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),       // query
      (11L, Array(10.0f, 10.0f)),    // ip = 10, cos ~ 0.707
      (12L, Array(1.0f, 0.1f)),      // ip = 1,  cos ~ 0.995
      (13L, Array(-1.0f, 0.0f)))     // ip = -1
      .toDF("vec_id", "embedding")
    val mips = SimilaritySearch.mipsTopK(df, "vec_id", "embedding",
      isQuery = $"vec_id" === 1, k = 2)
      .orderBy($"rnk").select($"n_id").as[Long].collect()
    assert(mips.toSeq == Seq(11L, 12L))
    val cos = SimilaritySearch.bruteForceTopK(df, "vec_id", "embedding",
      isQuery = $"vec_id" === 1, k = 1)
      .select($"n_id").as[Long].head()
    assert(cos == 12L)
  }

  test("mipsAugment: cosine ranking over augmented vectors equals MIPS ranking") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val maxNorm = emb.select(
      sqrt(aggregate($"embedding", lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("n"))
      .agg(max($"n")).as[Double].head()
    val aug = emb.select($"vec_id",
      SimilaritySearch.mipsAugment($"embedding", maxNorm, isQuery = false).as("av"),
      SimilaritySearch.mipsAugment($"embedding", maxNorm, isQuery = true).as("qv"))
    // For every query, the argmax-by-cosine over augmented corpus vectors
    // must be the argmax-by-raw-inner-product over the originals.
    val viaCos = SimilaritySearch.bruteForceTopK(
      aug.select($"vec_id", when($"vec_id" < 5, $"qv").otherwise($"av").as("embedding")),
      "vec_id", "embedding", isQuery = $"vec_id" < 5, k = 1)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    val viaIp = SimilaritySearch.mipsTopK(emb, "vec_id", "embedding",
      isQuery = $"vec_id" < 5, k = 1)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    assert(viaCos == viaIp, s"augmented-cosine $viaCos vs mips $viaIp")
  }

  test("annMipsTopK finds planted high-inner-product neighbours (recall >= 0.8)") {
    // Planted neighbours: scaled copies of the query vectors — same
    // direction (so they land in the query's LSH buckets) and 3x the
    // norm (so they dominate every inner product). The true MIPS top-1
    // for each query is its own planted copy; the ANN path must find it.
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planted = base.filter($"vec_id" < 10)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"embedding", x => x * lit(3.0f)).as("embedding"))
    val corpus = base.unionByName(planted)
    val exact = SimilaritySearch.mipsTopK(corpus, "vec_id", "embedding",
      isQuery = $"vec_id" < 10, k = 1)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    exact.foreach { case (q, n) => assert(n == q + 100000, s"plant broken for $q") }
    val approx = SimilaritySearch.annMipsTopK(corpus, "vec_id", "embedding",
      isQuery = $"vec_id" < 10, k = 1)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    val recall = exact.count { case (q, n) => approx.get(q).contains(n) }.toDouble / exact.size
    assert(recall >= 0.8, s"ANN MIPS recall $recall")
  }

  // ---- n-gram census -----------------------------------------------------

  test("ngramTopK counts every bigram occurrence with deterministic ties") {
    val df = Seq("a b a b c", "a b").toDF("text")
    val top = TextAnalysis.ngramTopK(df, "text", n = 2, k = 2)
      .as[(String, Long)].collect().toSeq
    // bigrams: "a b" x3, "b a" x1, "b c" x1 — tie broken ascending.
    assert(top == Seq(("a b", 3L), ("b a", 1L)))
  }

  // ---- filtered vector search ---------------------------------------------

  test("filteredTopK: hash join on the metadata key, results label-consistent") {
    val q = SparkEntry.queries("s08_filtered_topk")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"metadata filter must be the hash-join key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"filtered search must not nested-loop:\n$plan")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    q.select($"q_id", $"n_id").as[(Long, Long)].collect().foreach {
      case (qid, nid) =>
        assert(emb(qid) == emb(nid), s"neighbour $nid label differs from query $qid")
    }
  }

  // ---- curriculum bins ------------------------------------------------------

  test("p08 bins are balanced quartiles ordered by quality within each lang") {
    val bins = SparkEntry.queries("p08_curriculum_bins")(spark, sf)
      .select($"lang", $"quality_bp", $"bin").as[(String, Long, Long)].collect()
    bins.groupBy(_._1).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._3).view.mapValues(_.size)
      assert(sizes.keySet == Set(1L, 2L, 3L, 4L), s"$lang bins: ${sizes.keySet}")
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang sizes: $sizes")
      // Quality must not increase across bin boundaries.
      val worstPerBin = rows.groupBy(_._3).view.mapValues(_.map(_._2).min)
      val bestPerBin = rows.groupBy(_._3).view.mapValues(_.map(_._2).max)
      (1L to 3L).foreach { b =>
        assert(worstPerBin(b) >= bestPerBin(b + 1),
          s"$lang bin $b quality below bin ${b + 1}")
      }
    }
  }

  // ---- duplication report -------------------------------------------------

  test("d10 dup rate is consistent with d07's cluster membership") {
    val byName = SparkEntry.queries
    val report = byName("d10_dup_rate")(spark, sf)
      .select($"source", $"n_docs", $"n_dups", $"dup_rate_bp")
      .as[(String, Long, Long, Long)].collect()
    assert(report.nonEmpty)
    report.foreach { case (src, nDocs, nDups, bp) =>
      assert(nDups <= nDocs, s"$src: $nDups dups > $nDocs docs")
      assert(bp == nDups * 10000 / nDocs, s"$src: bp mismatch")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(report.map(_._2).sum == docs.count(), "report must cover every doc")
  }
}
