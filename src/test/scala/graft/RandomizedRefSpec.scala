package graft

import org.apache.spark.sql.functions._

/** Randomized differential tests: a seeded generator produces corpora with
  * the edge cases that bit previous rounds (blank tokens from double
  * spaces, sub-n documents, heavy repetition, unicode), and the engine's
  * distributed implementation is compared against a trivially-correct
  * sequential reference computed driver-side. One Spark job per property
  * (the whole corpus is a single DataFrame), so 200-case coverage costs
  * one action, not 200.
  */
class RandomizedRefSpec extends SparkSpecBase {

  private val rng = new scala.util.Random(0x9a5f7e21L)

  /** Texts with adversarial structure: empty, sub-n, exactly-n, repeated
    * tokens, double spaces (blank tokens), unicode, long docs. */
  private def randomTexts(count: Int): Seq[(Long, String)] = {
    val vocab = Vector("the", "a", "ein", "ße", "中文", "tok1", "tok2", "x",
      "longer_token_value", "Atypical")
    (1L to count.toLong).map { i =>
      val n = rng.nextInt(31) // 0..30 tokens
      val toks = Seq.fill(n)(vocab(rng.nextInt(vocab.length)))
      // Every 7th doc gets a double space (an empty token in a plain
      // split) and every 11th a leading space.
      val sep = if (i % 7 == 0) "  " else " "
      val body = toks.mkString(sep)
      (i, if (i % 11 == 0) " " + body else body)
    }
  }

  private def naiveNgrams(text: String, n: Int): Seq[String] = {
    val ws = text.split(" ", -1).toSeq.filter(_.nonEmpty)
    if (ws.length < n) Seq.empty
    else ws.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  test("wordNgrams equals the sequential reference on 200 adversarial docs (n = 2, 3, 13)") {
    val s = spark
    import s.implicits._
    val docs = randomTexts(200)
    val df = docs.toDF("doc_id", "text")
    for (n <- Seq(2, 3, 13)) {
      val got = df.select($"doc_id",
          graft.operators.Sampling.wordNgrams($"text", n).as("gs"))
        .as[(Long, Seq[String])].collect().toMap
      docs.foreach { case (id, text) =>
        val want = naiveNgrams(text, n)
        assert(got(id) === want,
          s"n=$n doc=$id text='$text': got ${got(id)} want $want")
      }
    }
  }

  test("packSequences equals the sequential prefix-sum reference and ignores row order") {
    val s = spark
    import s.implicits._
    val ctxLen = 128L
    val docs = (1L to 300L).map(i => (i, 1L + rng.nextInt(120).toLong))
    // Reference: concat in orderCol order; a doc belongs to the pack
    // holding its FIRST token.
    val expected = docs.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, toks)) =>
        (id, cum / ctxLen, cum + toks)
      }.drop(1).map { case (id, pack, _) => id -> pack }.toMap
    val shuffled = rng.shuffle(docs)
    val got = graft.operators.Packing
      .packSequences(shuffled.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
        ctxLen = ctxLen)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // Bucket-boundary stress: tiny buckets force many prefix-offset rows
    // through the two-pass scan; the assignment must not change.
    val small = graft.operators.Packing
      .packSequences(shuffled.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
        ctxLen = ctxLen, bucketSize = 16L)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(small === expected)
  }

  test("hashBucket is stable, in range, and split fractions are sane on 5000 keys") {
    val s = spark
    import s.implicits._
    val df = (1L to 5000L).toDF("k")
    val rows = df.select($"k",
        graft.operators.Sampling.hashBucket($"k", 10000).as("b"),
        graft.operators.Sampling.assignSplit($"k").as("split"))
      .as[(Long, Long, String)].collect()
    assert(rows.forall { case (_, b, _) => b >= 0 && b < 10000 })
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    val train = bySplit.getOrElse("train", 0).toDouble / rows.length
    assert(train > 0.75 && train < 0.85, s"train fraction $train")
    // Stability: a second evaluation must produce identical buckets.
    val again = df.select($"k",
        graft.operators.Sampling.hashBucket($"k", 10000).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(rows.forall { case (k, b, _) => again(k) == b })
  }
}
