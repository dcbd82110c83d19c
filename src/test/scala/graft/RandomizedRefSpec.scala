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

  test("DHash64/ByteEnergy equal sequential references on 300 random payloads; monotone invariance holds") {
    val s = spark
    import s.implicits._
    val payloads = (1 to 300).map { i =>
      val len = rng.nextInt(130) // 0..129 bytes: shorter, at, and past the 64-byte window
      (i.toLong, Array.fill(len)(rng.nextInt(128).toByte))
    }
    def refDHash(b: Array[Byte]): Long = {
      val n = math.min(b.length, 64)
      (0 until math.max(0, n - 1)).foldLeft(0L) { (acc, i) =>
        if ((b(i) & 0xFF) > (b(i + 1) & 0xFF)) acc | (1L << i) else acc
      }
    }
    def refEnergy(b: Array[Byte]): Long = {
      val xs = b.map(v => BigInt(v & 0xFF))
      (BigInt(b.length) * xs.map(x => x * x).sum - xs.sum * xs.sum).toLong
    }
    val got = payloads.toDF("id", "b")
      .select($"id",
        graft.functions.DHash64.dhash64($"b").as("h"),
        graft.functions.ByteEnergy.byteEnergy($"b").as("e"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    payloads.foreach { case (id, b) =>
      assert(got(id)._1 === refDHash(b), s"dhash mismatch on payload $id")
      assert(got(id)._2 === refEnergy(b), s"energy mismatch on payload $id")
    }
    // Monotone invariance over 50 random strictly increasing remaps of the
    // 0..127 domain (the generalization of Round10Spec's single case).
    (1 to 50).foreach { _ =>
      val table = rng.shuffle((0 to 255).toList).take(128).sorted.toArray
      val (_, b) = payloads(rng.nextInt(payloads.length))
      val remapped = b.map(v => table(v & 0xFF).toByte)
      assert(graft.functions.DHash64.compute(b) ===
        graft.functions.DHash64.compute(remapped))
    }
  }

  test("PqAdcScore equals the sequential lookup-sum reference on 200 random code words") {
    val s = spark
    import s.implicits._
    val k = 1 + rng.nextInt(31)
    val m = 1 + rng.nextInt(16)
    val lut = Array.fill(m * k)(rng.nextDouble() * 2 - 1)
    val rows = (1 to 200).map { i =>
      // Mostly valid codes; sprinkle out-of-range on every 9th row.
      val codes = Array.fill(m)(
        if (i % 9 == 0) rng.nextInt(2 * k) - k / 2 else rng.nextInt(k))
      (i.toLong, codes)
    }
    def ref(codes: Array[Int]): Double =
      codes.zipWithIndex.collect {
        case (c, sub) if c >= 0 && c < k => lut(sub * k + c)
      }.sum
    val got = rows.toDF("id", "codes")
      .select($"id", graft.functions.PqAdcScore.pqAdcScore(
        $"codes", typedLit(lut.toSeq), k).as("adc"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, codes) =>
      assert(math.abs(got(id) - ref(codes)) < 1e-9, s"adc mismatch on row $id")
    }
  }
}
