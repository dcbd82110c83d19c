package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-character statistics for the t21 diversity filter:
  * `struct(n_chars, n_kinds, coll)` where `coll = Σ count(c)²` over the
  * distinct characters (code points) of the string.
  *
  * Replaces the nested higher-order formulation (`transform(distinct,
  * c -> size(filter(chars, x = c)))`), which rescanned the whole char
  * array once PER DISTINCT CHAR — O(kinds·n) per row with
  * CodegenFallback interpretation on top; t21 was the bench's #2 query
  * (2.4–2.6 s at sf0.1) for an op whose plan has zero shuffles. This is
  * one compiled O(n) counting pass over an open-addressed code-point
  * table (allocation: two arrays sized to the row's alphabet).
  *
  * Code-point iteration matches `split(text, '')` semantics (Java regex
  * zero-width matches never split a surrogate pair), so `n_chars` /
  * `n_kinds` / `coll` equal the HOF formulation's values exactly — the
  * t21 oracle hash is unchanged.
  */
case class CharDiversityStats(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = CharDiversityStats.Schema
  override def prettyName: String = "char_diversity_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_diversity_stats expects string, got $other")
    }

  override def nullSafeEval(s: Any): Any =
    CharDiversityStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharDiversityStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharDiversityStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_kinds", LongType, nullable = false),
    StructField("coll", LongType, nullable = false)))

  // 0x9E3779B9 (the golden-ratio Fibonacci-hash multiplier) as a signed
  // 32-bit literal — Scala rejects hex int literals past Int.MaxValue.
  private final val Phi: Int = -1640531527

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    // Open-addressed (codepoint -> count) table; empty slot = count 0.
    // Capacity stays a power of two, load factor <= 0.5.
    var cap = 64
    var keys = new Array[Int](cap)
    var cnts = new Array[Int](cap)
    var kinds = 0
    var n = 0L

    def slot(cp: Int, ks: Array[Int], cs: Array[Int]): Int = {
      val mask = ks.length - 1
      var idx = ((cp * Phi) >>> (32 - Integer.numberOfTrailingZeros(ks.length))) & mask
      while (cs(idx) != 0 && ks(idx) != cp) idx = (idx + 1) & mask
      idx
    }

    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if ((kinds + 1) * 2 > cap) {
        val nk = new Array[Int](cap * 2)
        val nc = new Array[Int](cap * 2)
        var j = 0
        while (j < cap) {
          if (cnts(j) != 0) {
            val idx = slot(keys(j), nk, nc)
            nk(idx) = keys(j); nc(idx) = cnts(j)
          }
          j += 1
        }
        keys = nk; cnts = nc; cap *= 2
      }
      val idx = slot(cp, keys, cnts)
      if (cnts(idx) == 0) { keys(idx) = cp; kinds += 1 }
      cnts(idx) += 1
    }

    var coll = 0L
    var j = 0
    while (j < cap) {
      val c = cnts(j)
      if (c != 0) coll += c.toLong * c
      j += 1
    }
    new GenericInternalRow(Array[Any](n, kinds.toLong, coll))
  }

  def charDiversityStats(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CharDiversityStats(GraftColumnBridge.expression(text)))
  }
}
