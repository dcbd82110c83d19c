package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's custom expressions, so floorplan SQL (and
  * `spark.sql` users) can call them directly:
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT simhash64(split(text, ' ')) FROM documents
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster-wide, survives session cloning);
  *  - [[GraftFunctions.registerAll]] for an existing session (tests, REPL).
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es.head)),
    "dhash64" -> (es => DHash64(es.head)),
    "byte_energy" -> (es => ByteEnergy(es.head)),
    "pq_adc_score" -> (es => es match {
      case Seq(c, l, k) => PqAdcScore(c, l, k.eval().asInstanceOf[Int])
      case other => throw new IllegalArgumentException(
        s"pq_adc_score takes (codes, lut, k), got ${other.size} args")
    }),
    "word_shingles" -> (es => es match {
      case Seq(c) => WordShingles(c)
      case Seq(c, n) => WordShingles(c, n.eval().asInstanceOf[Int])
      case Seq(c, n, d) => WordShingles(c, n.eval().asInstanceOf[Int],
        d.eval().asInstanceOf[Boolean])
      case other => throw new IllegalArgumentException(
        s"word_shingles takes 1-3 args, got ${other.size}")
    }),
    "winnow_shingles" -> (es => es match {
      case Seq(c, w) => WinnowShingles(c, w.eval().asInstanceOf[Int])
      case other => throw new IllegalArgumentException(
        s"winnow_shingles takes (shingles, window), got ${other.size} args")
    }),
    "minhash_signature" -> (es => es match {
      case Seq(c) => MinHashSignature(c)
      case Seq(c, k) => MinHashSignature(c, k.eval().asInstanceOf[Int])
      case other => throw new IllegalArgumentException(
        s"minhash_signature takes 1-2 args, got ${other.size}")
    }),
    "intersect_count_sorted" -> (es => IntersectCountSorted(es(0), es(1))),
    "lsh_table_buckets" -> (es => es match {
      case Seq(c, t, b) => LshTableBuckets(c,
        t.eval().asInstanceOf[Int], b.eval().asInstanceOf[Int])
      case other => throw new IllegalArgumentException(
        s"lsh_table_buckets takes (vec, tables, bits), got ${other.size} args")
    }))

  /** Register every function on an existing session (temp function scope). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `SparkSessionExtensions` hook: inject the function set at session build
  * time (`.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions` conf). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
