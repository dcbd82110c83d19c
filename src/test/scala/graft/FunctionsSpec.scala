package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim
import graft.functions.SimHash64.simhash64

class CosineSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine of a vector with itself is 1.0") {
    val vals = emb.limit(20)
      .select(cosineSim(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("expression matches the higher-order-function formulation") {
    def hofDot(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val a = emb.limit(50).select($"vec_id".as("a_id"), $"embedding".as("va"))
    val b = emb.limit(50).select($"vec_id".as("b_id"), $"embedding".as("vb"))
    val both = a.join(b, $"a_id" < $"b_id")
      .select(
        cosineSim($"va", $"vb").as("expr_cos"),
        (hofDot("va", "vb") /
          (sqrt(hofDot("va", "va")) * sqrt(hofDot("vb", "vb")))).as("hof_cos"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (e, h) => assert(math.abs(e - h) < 1e-12, s"$e vs $h") }
  }

  test("orthogonal and opposite vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(cosineSim($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) + 1.0) < 1e-12)
  }

  test("zero vector yields 0.0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(cosineSim($"a", $"b")).as[Double].head() == 0.0)
  }

  test("survives codegen in a realistic plan (filter + projection)") {
    val cnt = emb.select(cosineSim($"embedding", $"embedding").as("c"))
      .filter($"c" > 0.99).count()
    assert(cnt == emb.count())
  }
}

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.{TextAnalysis => TA}

  test("double-valued quality score stays in [0,1] and rewards diversity") {
    val df = Seq(
      "the the the the the the the the",                   // repetitive + stopwords
      "spark catalyst tungsten shuffle broadcast salting") // diverse
      .toDF("text")
      .select(TA.words($"text").as("ws"))
      .select(size($"ws").cast("long").as("t"),
        size(array_distinct($"ws")).cast("long").as("u"),
        TA.stopwordCount($"ws", TA.StopEn).as("s"))
      .select(TA.qualityScore($"t", $"u", $"s").as("q"))
    val Array(repetitive, diverse) = df.as[Double].collect()
    assert(repetitive >= 0.0 && diverse <= 1.0)
    assert(diverse > repetitive)
  }

  test("langGuess breaks ties deterministically en>es>fr>de") {
    val got = spark.range(1)
      .select(TA.langGuess(lit(0L), lit(0L), lit(0L), lit(0L))).as[String].head()
    assert(got == "en")
    val es = spark.range(1)
      .select(TA.langGuess(lit(1L), lit(2L), lit(2L), lit(1L))).as[String].head()
    assert(es == "es")
  }
}

class SqlRegistrationSpec extends SparkSpecBase {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_sql LIMIT 5")
      .as[Double].collect()
    assert(self.forall(v => math.abs(v - 1.0) < 1e-12))
    val sh = spark.sql(
      "SELECT simhash64(word_shingles('a b c d', 3)) AS h").as[Long].head()
    assert(sh != 0L)
    val ic = spark.sql(
      "SELECT intersect_count_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS n")
      .as[Long].head()
    assert(ic == 2L)
    val wn = spark.sql(
      "SELECT winnow_shingles(word_shingles('e d c b a e d', 3, false), 2) AS f")
      .as[Seq[String]].head()
    // positional shingles: [e d c, d c b, c b a, b a e, a e d];
    // window-2 minima: d c b, c b a, b a e, a e d -> sorted distinct
    assert(wn == Seq("a e d", "b a e", "c b a", "d c b"))
  }
}

class LshTableBucketsSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.LshTableBuckets.lshTableBuckets
  import graft.operators.SimilaritySearch

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Plain-Scala reference: sequential-fold projections against the
    * documented hyperplane matrix, sign bits packed per table. */
  private def reference(vec: Seq[Float], tables: Int, bits: Int): Seq[Long] =
    (0 until tables).map { t =>
      val planes = SimilaritySearch.hyperplanes(vec.size, bits, t)
      planes.zipWithIndex.map { case (p, j) =>
        var proj = 0.0
        var d = 0
        while (d < vec.size) { proj += vec(d).toDouble * p(d); d += 1 }
        if (proj > 0) 1L << j else 0L
      }.sum
    }

  test("native expression matches the hyperplane reference on the corpus") {
    val rows = emb.limit(100)
      .select($"vec_id", $"embedding",
        lshTableBuckets($"embedding", 8, 6).as("buckets"))
      .as[(Long, Seq[Float], Seq[Long])].collect()
    rows.foreach { case (id, vec, got) =>
      assert(got == reference(vec, 8, 6), s"vec $id bucket mismatch")
    }
  }

  test("buckets land in [0, 2^bits) and are deterministic across partitionings") {
    val a = emb.select($"vec_id", lshTableBuckets($"embedding", 4, 6).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val b = emb.repartition(7)
      .select($"vec_id", lshTableBuckets($"embedding", 4, 6).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(a == b)
    assert(a.values.forall(bs => bs.size == 4 && bs.forall(x => x >= 0 && x < 64)))
  }

  test("double-valued input is accepted (augmented dedup path)") {
    val asDouble = emb.limit(10)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val fromDouble = asDouble.select($"vec_id", lshTableBuckets($"v", 8, 6).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val fromFloat = emb.limit(10)
      .select($"vec_id", lshTableBuckets($"embedding", 8, 6).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fromDouble == fromFloat) // float→double cast is exact
  }
}

class IntersectCountSortedSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.functions.IntersectCountSorted.intersectCountSorted
  import org.apache.spark.sql.functions._

  test("merge-walk count equals array_intersect size on random sorted sets") {
    val df = spark.range(0, 200).select(
      array_sort(array_distinct(transform(sequence(lit(0), (rand(7) * 50).cast("int") + 3),
        i => (xxhash64($"id" * 31 + i) % 40)))).as("a"),
      array_sort(array_distinct(transform(sequence(lit(0), (rand(11) * 50).cast("int") + 3),
        i => (xxhash64($"id" * 17 + i) % 40)))).as("b"))
    val diff = df.select(
      intersectCountSorted($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
  }

  test("edge cases: empty and disjoint") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val got = df.select(intersectCountSorted($"a", $"b")).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 3L))
  }
}

class MinHashFunctionsSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.functions.MinHashSignature.minhashSignature
  import graft.functions.WordShingles.wordShingles
  import graft.operators.{TextAnalysis => TA}

  test("word_shingles matches the HOF shingle builder on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      wordShingles($"text", 3).as("native"),
      TA.shingles3(TA.words($"text")).as("hof"))
      .filter(not($"native" === $"hof")).count()
    assert(diff == 0)
  }

  test("word_shingles edge cases: short and empty strings") {
    val df = Seq("", "one", "one two", "a b c", "a b c d").toDF("t")
    val got = df.select(wordShingles($"t", 3)).as[Seq[String]].collect()
    assert(got(0).isEmpty && got(1).isEmpty && got(2).isEmpty)
    assert(got(3) == Seq("a b c"))
    assert(got(4) == Seq("a b c", "b c d"))
  }

  test("positional word_shingles keeps repeats that the distinct form drops") {
    val df = Seq("a b a b a b").toDF("t")
    val dedup = df.select(wordShingles($"t", 3)).as[Seq[String]].head()
    val pos = df.select(wordShingles($"t", 3, distinct = false)).as[Seq[String]].head()
    assert(dedup == Seq("a b a", "b a b"))
    assert(pos == Seq("a b a", "b a b", "a b a", "b a b"))
  }

  test("winnow_shingles equals the HOF window-minima formulation on the corpus") {
    import graft.functions.WinnowShingles.winnowShingles
    val w = 4
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", wordShingles($"text", 3, distinct = false).as("hs"))
      .filter(size($"hs") >= w)
    val diff = docs.select(
      winnowShingles($"hs", w).as("native"),
      array_sort(array_distinct(
        transform(sequence(lit(1), size($"hs") - (w - 1)),
          i => array_min(slice($"hs", i, lit(w)))))).as("hof"))
      .filter(not($"native" === $"hof")).count()
    assert(diff == 0)
    // edge: array shorter than the window -> empty fingerprint
    val short = Seq(Seq("only one", "and two")).toDF("hs")
      .select(winnowShingles($"hs", w)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("minhash signature: equal sets equal sigs; similar sets similar sigs") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e", "d e f")),
      (2L, Seq("a b c", "b c d", "c d e", "d e f")),
      (3L, Seq("a b c", "b c d", "c d e", "x y z")),
      (4L, Seq("p q r", "q r s", "r s t", "s t u"))).toDF("id", "sh")
    val sigs = df.orderBy("id").select(minhashSignature($"sh", 64)).as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sigs(0), sigs(2)) > 30, "3/4-overlap sets should agree on most mins")
    assert(agree(sigs(0), sigs(3)) < 10, "disjoint sets should rarely agree")
  }

  test("signature is deterministic across partitionings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sigs(parts: Int) = docs.repartition(parts)
      .select($"doc_id", minhashSignature(wordShingles($"text", 3), 64).as("s"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(sigs(1) == sigs(8))
  }
}

class SimHashSpec extends SparkSpecBase {
  import spark.implicits._

  test("identical token arrays produce identical fingerprints") {
    val df = Seq(
      (1L, Seq("spark", "scala", "engine")),
      (2L, Seq("spark", "scala", "engine"))).toDF("id", "toks")
    val fps = df.select(simhash64($"toks")).as[Long].collect()
    assert(fps(0) == fps(1))
  }

  test("near-identical docs have small hamming distance, unrelated large") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(3, "changed")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "toks")
    val Array(h1, h2, h3) = df.orderBy("id").select(simhash64($"toks")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) < 12, s"near pair hamming ${ham(h1, h2)}")
    assert(ham(h1, h3) > 16, s"far pair hamming ${ham(h1, h3)}")
  }

  test("deterministic across partitionings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", split($"text", " ").as("toks"))
    val one = docs.coalesce(1).select($"doc_id", simhash64($"toks").as("fp"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    val many = docs.repartition(7).select($"doc_id", simhash64($"toks").as("fp"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(one.toSeq == many.toSeq)
  }
}
