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

  test("PqEncode equals the sequential argmin reference on 200 random vectors") {
    val s = spark
    import s.implicits._
    val m = 4; val k = 8; val subDim = 3
    val cbs = Array.fill(m)(Array.fill(k)(Array.fill(subDim)(
      rng.nextDouble() * 4 - 2)))
    val rows = (1 to 200).map { i =>
      // Mostly full-length vectors; every 9th is ragged (short).
      val len = if (i % 9 == 0) rng.nextInt(m * subDim) else m * subDim
      (i.toLong, Array.fill(len)((rng.nextDouble() * 4 - 2).toFloat))
    }
    def ref(v: Array[Float]): Seq[Int] =
      (0 until m).map { sub =>
        (0 until k).minBy { code =>
          (0 until subDim).map { d =>
            val vi = sub * subDim + d
            val x = if (vi < v.length) v(vi).toDouble else Double.NaN
            if (vi < v.length) { val dx = x - cbs(sub)(code)(d); dx * dx }
            else 0.0
          }.sum
        }
      }
    val got = rows.toDF("id", "v")
      .select($"id", graft.functions.PqEncode.pqEncode($"v", cbs, subDim)
        .as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    rows.foreach { case (id, v) =>
      assert(got(id) === ref(v), s"codes mismatch on row $id")
    }
  }

  private def md5Bucket(g: String, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets
  }

  private def naiveGramBuckets(text: String, buckets: Int): Seq[Long] = {
    val ws = text.split(" ", -1).toSeq.filter(_.nonEmpty)
    val grams = ws ++ (if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq
                       else Seq.empty)
    grams.map(md5Bucket(_, buckets))
  }

  test("dsirScore equals the sequential hashed-model reference on 200 adversarial docs") {
    val s = spark
    import s.implicits._
    val buckets = 64
    val docs = randomTexts(200).map { case (id, t) =>
      (id, t, if (id % 4 == 0) "seed" else "raw")
    }
    // Sequential reference model.
    val tCnt = new Array[Long](buckets)
    val rCnt = new Array[Long](buckets)
    docs.foreach { case (_, t, src) =>
      naiveGramBuckets(t, buckets).foreach { b =>
        if (src == "seed") tCnt(b.toInt) += 1 else rCnt(b.toInt) += 1
      }
    }
    val tTot = tCnt.sum; val rTot = rCnt.sum
    def wBp(b: Int): Long =
      (tCnt(b) + 1) * 10000 / (tTot + buckets) -
        (rCnt(b) + 1) * 10000 / (rTot + buckets)
    val want = docs.filter(_._3 == "raw").flatMap { case (id, t, _) =>
      val bs = naiveGramBuckets(t, buckets)
      if (bs.isEmpty) None
      else Some(id -> ((bs.length.toLong, bs.map(b => wBp(b.toInt)).sum)))
    }.toMap
    val got = graft.operators.Sampling
      .dsirScore(docs.toDF("doc_id", "text", "source"), "doc_id", "text",
        $"source" === "seed", buckets)
      .select($"doc_id", $"n_grams", $"sum_w_bp")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want)
  }

  test("scrubBoilerplate equals the sequential line reference on 200 adversarial docs") {
    val s = spark
    import s.implicits._
    val c = 4; val minDocs = 3
    val banner = "nav1 nav2 nav3 nav4"
    // Adversarial texts with a planted banner on every 3rd doc so the
    // threshold actually fires (line 0 is the banner, alignment kept).
    val docs = randomTexts(200).map { case (id, t) =>
      (id, if (id % 3 == 0) s"$banner $t" else t)
    }
    def naiveLines(text: String): Seq[String] = {
      val ws = text.split(" ", -1).toSeq.filter(_.nonEmpty)
      if (ws.isEmpty) Seq.empty
      else (0 to (ws.length - 1) / c).map(i =>
        ws.slice(i * c, i * c + c).mkString(" "))
    }
    val df = docs.flatMap { case (id, t) => naiveLines(t).map(id -> _) }
    val flagged = df.groupBy(_._2).collect {
      case (line, occ) if occ.map(_._1).distinct.size >= minDocs => line
    }.toSet
    val want = docs.flatMap { case (id, t) =>
      val ls = naiveLines(t)
      if (ls.isEmpty) None
      else Some(id -> ((ls.length.toLong,
        ls.count(flagged).toLong,
        ls.filterNot(flagged).mkString(" "))))
    }.toMap
    val got = graft.operators.TextAnalysis
      .scrubBoilerplate(docs.toDF("doc_id", "text"), "doc_id", "text",
        lineTokens = c, minDocs = minDocs)
      .select($"doc_id", $"n_lines", $"n_cut_lines", $"clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === want)
  }

  test("corpusDiff equals the sequential map-compare reference on random snapshots") {
    val s = spark
    import s.implicits._
    val old = (1L to 150L).map(i => (i, s"text ${rng.nextInt(40)}"))
    val newer = (30L to 180L).map(i => (i, s"text ${rng.nextInt(40)}"))
    val oldM = old.toMap; val newM = newer.toMap
    val want = (oldM.keySet ++ newM.keySet).map { id =>
      id -> ((oldM.get(id), newM.get(id)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      })
    }.toMap
    val got = graft.operators.Dedup
      .corpusDiff(old.toDF("doc_id", "text"), newer.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === want)
  }

  /** The shared naive line slicer of the paragraph-dedup references —
    * must mirror TextAnalysis.docLines exactly (blank-token filter,
    * partial tail window). */
  private def naiveLines4(text: String): Seq[String] = {
    val c = 4
    val ws = text.split(" ", -1).toSeq.filter(_.nonEmpty)
    if (ws.isEmpty) Seq.empty
    else (0 to (ws.length - 1) / c).map(i =>
      ws.slice(i * c, i * c + c).mkString(" "))
  }

  test("paragraphDedup equals the sequential keep-first reference on 200 adversarial docs") {
    val s = spark
    import s.implicits._
    val banner = "nav1 nav2 nav3 nav4"
    val docs = randomTexts(200).map { case (id, t) =>
      (id, if (id % 3 == 0) s"$banner $t" else t)
    }
    // Sequential keep-first: walk docs by ascending (id, line_idx) —
    // exactly the min-struct winner order — keep first global occurrence.
    val seen = scala.collection.mutable.Set[String]()
    val want = docs.sortBy(_._1).flatMap { case (id, t) =>
      val ls = naiveLines4(t)
      if (ls.isEmpty) None
      else {
        val keeps = ls.map { l => val k = !seen(l); if (k) seen += l; k }
        Some(id -> ((ls.length.toLong,
          keeps.count(!_).toLong,
          ls.zip(keeps).collect { case (l, true) => l }.mkString(" "))))
      }
    }.toMap
    val got = graft.operators.Dedup
      .paragraphDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        lineTokens = 4)
      .select($"doc_id", $"n_lines", $"n_cut_lines", $"clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === want)
  }

  test("ingestParagraphClean equals the sequential two-stage reference on 200 adversarial docs") {
    val s = spark
    import s.implicits._
    val banner = "nav1 nav2 nav3 nav4"
    val all = randomTexts(200).map { case (id, t) =>
      (id, if (id % 3 == 0) s"$banner $t" else t)
    }
    val corpus = all.filter(_._1 % 10 != 7)
    val batch = all.filter(_._1 % 10 == 7)
    val corpusLines = corpus.flatMap(d => naiveLines4(d._2)).toSet
    // Stage 1: corpus presence cuts; stage 2: keep-first among survivors
    // walked in ascending (id, line_idx) order.
    val seen = scala.collection.mutable.Set[String]()
    val want = batch.sortBy(_._1).flatMap { case (id, t) =>
      val ls = naiveLines4(t)
      if (ls.isEmpty) None
      else {
        val states = ls.map { l =>
          if (corpusLines(l)) "corpus"
          else if (seen(l)) "batch"
          else { seen += l; "keep" }
        }
        Some(id -> ((ls.length.toLong,
          states.count(_ == "corpus").toLong,
          states.count(_ == "batch").toLong,
          ls.zip(states).collect { case (l, "keep") => l }.mkString(" "))))
      }
    }.toMap
    val idx = graft.operators.Dedup.buildLineSetIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text", lineTokens = 4,
      persist = false)
    val got = graft.operators.Dedup
      .ingestParagraphClean(batch.toDF("doc_id", "text"), idx, "doc_id", "text")
      .select($"doc_id", $"n_lines", $"n_cut_corpus_lines",
        $"n_cut_batch_lines", $"clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === want)
  }

  test("sparseCosinePairs equals the sequential postings reference on 150 adversarial docs") {
    val s = spark
    import s.implicits._
    val cap = 50; val thr = 0.2
    val docs = randomTexts(150)
    // Sequential reference: trigram counts, df-capped vocabulary, exact
    // integer dots/norms, one sqrt/divide, HALF_UP round to 4.
    def tris(t: String): Seq[String] = {
      val ws = t.split(" ", -1).toSeq.filter(_.nonEmpty)
      if (ws.length < 3) Seq.empty else ws.sliding(3).map(_.mkString(" ")).toSeq
    }
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> tris(t).groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    val kept = tf.view.mapValues(_.filter { case (g, _) => df(g) <= cap }).toMap
    val n2 = kept.view.mapValues(_.values.map(v => v * v).sum).toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = docs.map(_._1)
    val want = (for {
      a <- ids; b <- ids if a < b
      shared = kept(a).keySet intersect kept(b).keySet
      if shared.nonEmpty
      dot = shared.toSeq.map(g => kept(a)(g) * kept(b)(g)).sum
      cos = r4(dot.toDouble / (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble)))
      if cos >= thr
    } yield (a, b) -> cos).toMap
    val got = graft.operators.SimilaritySearch
      .sparseCosinePairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        threshold = thr, maxTermDocs = cap, ngram = 3)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want, s"sizes got=${got.size} want=${want.size}")
  }

  test("funnelStages equals the sequential greedy reference on 80 random users") {
    val s = spark
    import s.implicits._
    val steps = Seq("view", "click", "purchase")
    val types = steps ++ Seq("error", "signup")
    val W = 40000000L // 40s in micros
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    var eid = 0L
    val events = (1L to 80L).flatMap { u =>
      (0 until (1 + rng.nextInt(12))).map { _ =>
        eid += 1
        (eid, ts(rng.nextInt(120000).toLong), u, types(rng.nextInt(types.length)))
      }
    }
    // Sequential reference: the greedy (stage, anchor) scan over events
    // sorted by (micros, event_id), relevant types only.
    val want = events
      .filter(e => steps.contains(e._4))
      .groupBy(_._3).map { case (u, evs) =>
        var stage = 0; var anchor = 0L
        evs.sortBy(e => (e._2.getTime, e._1)).foreach { e =>
          val code = steps.indexOf(e._4) + 1
          val t = e._2.getTime * 1000L
          if (code == stage + 1 && (stage == 0 || t - anchor <= W)) {
            if (stage == 0) anchor = t
            stage += 1
          }
        }
        u -> stage.toLong
      }
    val got = graft.operators.Sessionize
      .funnelStages(events.toDF("event_id", "ts", "user_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", steps, W)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }
}
