package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** DSIR hashed-ngram importance scoring (p17): planted-signal ground
  * truth, multiset semantics, determinism under repartitioning, and the
  * plan ledger (bounded-key model shuffle + broadcast probe + one-row-
  * per-doc score aggregate).
  */
class DsirSpec extends SparkSpecBase {

  private def df(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("docs made of seed vocabulary outscore docs made of off-seed vocabulary") {
    val seed = (0L until 5L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta", "seed"))
    // Raw: 3 docs quoting seed vocabulary, 3 of disjoint vocabulary.
    val rawSeedish = (10L until 13L).map(i =>
      (i, "alpha beta gamma delta epsilon", "raw"))
    val rawOff = (20L until 23L).map(i =>
      (i, "omega psi chi phi upsilon", "raw"))
    val scored = Sampling
      .dsirScore(df(seed ++ rawSeedish ++ rawOff), "doc_id", "text",
        isTarget = col("source") === "seed", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored.keySet === (10L until 13L).toSet ++ (20L until 23L).toSet,
      "exactly the raw docs are scored")
    val worstSeedish = (10L until 13L).map(scored).min
    val bestOff = (20L until 23L).map(scored).max
    assert(worstSeedish > bestOff,
      s"seed-vocabulary docs ($worstSeedish) must outscore off-seed ($bestOff)")
  }

  test("gram counts are multisets: repeating a seed word raises the doc's sum") {
    val rows = Seq(
      (0L, "alpha beta alpha beta alpha", "seed"),
      (10L, "alpha alpha alpha", "raw"),
      (11L, "alpha nope nope", "raw"))
    val scored = Sampling
      .dsirScore(df(rows), "doc_id", "text",
        isTarget = col("source") === "seed", buckets = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    // doc 10: 3 unigram alpha + 2 bigram "alpha alpha" = 5 grams; doc 11:
    // 3 unigrams + 2 bigrams = 5 grams — occurrences, not distinct grams.
    assert(scored.map(_._2) === List(5L, 5L))
    val sum10 = scored(0)._3
    val sum11 = scored(1)._3
    assert(sum10 > sum11,
      s"all-seed-vocabulary doc ($sum10) must outsum the diluted one ($sum11)")
  }

  test("scores are invariant under repartitioning (pure content function)") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    def run(d: org.apache.spark.sql.DataFrame) = Sampling
      .dsirScore(d, "doc_id", "text", col("source") === "src0", buckets = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run(docs) === run(docs.repartition(13, col("lang"))))
  }

  test("empty target corpus degrades to a pure raw-rarity model without crashing") {
    val rows = Seq((10L, "alpha beta", "raw"), (11L, "gamma delta", "raw"))
    val scored = Sampling
      .dsirScore(df(rows), "doc_id", "text",
        isTarget = col("source") === "seed", buckets = 256)
      .collect()
    assert(scored.length === 2) // defined for every raw doc, no crash
  }

  test("dsirSelect keeps exactly n rows, ties broken toward the smaller id") {
    val seed = Seq((0L, "alpha beta", "seed"))
    // Identical raw docs → identical scores; the tie must resolve by id.
    val raws = (10L until 20L).map(i => (i, "alpha beta", "raw"))
    val picked = Sampling
      .dsirSelect(df(seed ++ raws), "doc_id", "text",
        isTarget = col("source") === "seed", n = 4, buckets = 256)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(picked.sameElements(Array(10L, 11L, 12L, 13L)))
  }

  test("model save/load round-trips the weights AND the bucket geometry") {
    val seed = (0L until 3L).map(i => (i, "alpha beta gamma", "seed"))
    val raws = (10L until 14L).map(i => (i, s"alpha omega$i psi", "raw"))
    val corpus = df(seed ++ raws)
    val built = Sampling.dsirModelTable(corpus, "text",
      col("source") === "seed", buckets = 256)
    val d = tmpDir("dsir-model")
    built.save(d)
    val loaded = Sampling.loadDsirModel(spark, d)
    assert(loaded.buckets === 256)
    def run(m: Sampling.DsirModel) = Sampling
      .dsirScoreAgainst(corpus.filter(col("source") === "raw"),
        "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run(built) === run(loaded))
  }

  test("dsirSelectFraction admits ~the top fraction with no global sort") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val scored = Sampling.dsirScore(docs, "doc_id", "text",
      col("source") === "src0", buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val picked = Sampling
      .dsirSelectFraction(docs, "doc_id", "text", col("source") === "src0",
        fractionBp = 2000, buckets = 1024) // top 20%
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // Size within sketch tolerance of the requested fraction.
    val want = scored.size * 0.20
    assert(math.abs(picked.length - want) <= math.max(3, want * 0.05),
      s"picked ${picked.length}, wanted ~$want of ${scored.size}")
    // Semantics: everything admitted outscores everything rejected
    // (modulo cutoff ties, which are admitted).
    val cut = picked.map(_._2).min
    val rejected = scored.filterNot { case (id, _) => picked.exists(_._1 == id) }
    assert(rejected.values.forall(_ <= cut),
      "a rejected doc outscored an admitted one")
    // Plan: no global sort anywhere (the exact top-n path has one).
    val plan = Sampling.dsirSelectFraction(docs, "doc_id", "text",
      col("source") === "src0", fractionBp = 2000, buckets = 1024)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort in the fraction path:\n$plan")
  }

  test("plan ledger: scoring is one row-local codegen span, ZERO shuffles") {
    // Round 12: the broadcast-join scoring topology was replaced by the
    // codegen'd BucketWeightSum expression with the dense weight vector
    // bound in — the score plan must now contain no join and no exchange
    // at all (the model BUILD still aggregates, but materializes driver-
    // side before the scoring query is even constructed).
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = Sampling.dsirScore(docs, "doc_id", "text",
      col("source") === "src0", buckets = 1024)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("bucket_weight_sum"), s"expression missing:\n$plan")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(plan.contains("*(1)"), s"fell out of codegen:\n$plan")
  }
}
