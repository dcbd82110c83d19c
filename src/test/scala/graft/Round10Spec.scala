package graft

import org.apache.spark.sql.functions._

/** Round 10: the targets-frame contract of targetMixture is self-enforcing
  * (absent groups and conflicting weights fail loudly, duplicates collapse),
  * and annTopK's auto branch uses the `<= 0` not-passed sentinel so explicit
  * arguments always survive.
  */
class Round10Spec extends SparkSpecBase {

  private def rootMessages(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("targetMixture: a targeted group absent from the corpus fails loudly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 10L))
      .toDF("doc_id", "grp", "n_tokens")
    val targets = Seq(("a", 5000L), ("ghost", 5000L)).toDF("grp", "weight_bp")
    val e = intercept[Exception] {
      graft.operators.Sampling
        .targetMixture(df, "grp", "doc_id", "n_tokens", targets).collect()
    }
    assert(rootMessages(e).contains("absent from corpus"), rootMessages(e))
  }

  test("targetMixture: conflicting weights for one group fail loudly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("doc_id", "grp", "n_tokens")
    val targets = Seq(("a", 5000L), ("a", 4000L), ("b", 5000L))
      .toDF("grp", "weight_bp")
    val e = intercept[Exception] {
      graft.operators.Sampling
        .targetMixture(df, "grp", "doc_id", "n_tokens", targets).collect()
    }
    assert(rootMessages(e).contains("conflicting weights"), rootMessages(e))
  }

  test("targetMixture: duplicate identical target rows collapse (no row multiplication)") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
      .toDF("doc_id", "grp", "n_tokens")
    val once = Seq(("a", 6000L), ("b", 4000L)).toDF("grp", "weight_bp")
    val dup = once.unionAll(once) // a caller-built frame with repeated rows
    val clean = graft.operators.Sampling
      .targetMixture(df, "grp", "doc_id", "n_tokens", once)
      .select("doc_id").as[Long].collect().sorted
    val dirty = graft.operators.Sampling
      .targetMixture(df, "grp", "doc_id", "n_tokens", dup)
      .select("doc_id").as[Long].collect().sorted
    assert(clean.sameElements(dirty))
    assert(clean.length === clean.distinct.length)
  }

  test("annTopK: explicit tables survives the auto-bits branch") {
    val emb = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    // At this corpus size autoLshParams lands on the (6, _) base point, so
    // bits=0 + tables=16 must equal the explicit (6, 16) call — the
    // argument must not be silently replaced by autoTables.
    val auto = graft.operators.SimilaritySearch
      .annTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 3,
        bits = 0, tables = 16)
      .collect().map(_.toSeq).toSet
    val explicit = graft.operators.SimilaritySearch
      .annTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 3,
        bits = 6, tables = 16)
      .collect().map(_.toSeq).toSet
    assert(auto === explicit)
  }

  test("embeddingNearDups: a precomputed corpusCount matches the counted auto path") {
    val s = spark
    import s.implicits._
    val base = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val n = base.count()
    val counted = graft.operators.Dedup
      .embeddingNearDups(base, "vec_id", "v", 0.9)
      .collect().map(_.toSeq).toSet
    val precomputed = graft.operators.Dedup
      .embeddingNearDups(base, "vec_id", "v", 0.9, corpusCount = Some(n))
      .collect().map(_.toSeq).toSet
    assert(counted === precomputed)
  }
}
