package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash building blocks.
  *
  * Why expressions, not higher-order functions: a HOF like
  * `transform(seq(0,63), j -> array_min(transform(shingles, s -> xxhash64(s, j))))`
  * re-evaluates the `shingles` argument expression on every outer lambda
  * iteration, and any `element_at(split(text), i)` inside the shingle
  * builder re-executes the `split` per element — measured 441s for 5000
  * docs at sf0.1. These expressions do one pass per row inside whole-stage
  * codegen: tokenize once, shingle once, hash each shingle twice and derive
  * all k minima via double hashing (Kirsch–Mitzenmacher: g_j = h1 + j·h2).
  */

/** Word n-gram shingles of a space-separated string. `distinct = true`
  * (the MinHash/Jaccard set form) dedups preserving first occurrence;
  * `distinct = false` keeps the full POSITIONAL sequence (what winnowing
  * windows need — repeats must stay visible).
  * Output: array<string>; fewer than `n` tokens → empty array. */
case class WordShingles(child: Expression, n: Int = 3, distinct: Boolean = true)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toString
    val tokens = new java.util.ArrayList[String](64)
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) tokens.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = tokens.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet dedups preserving order; ArrayList keeps every position.
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String](m * 2)
      else new java.util.ArrayList[String](m)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  def wordShingles(text: Column, n: Int = 3, distinct: Boolean = true): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), n, distinct))
  }
}

/** Winnowing fingerprint core: the distinct, sorted set of per-window
  * minima over every `w` consecutive elements of a string array — one
  * native pass per row. The HOF equivalent
  * (`transform(sequence(...), i -> array_min(slice(hs, i, w)))` +
  * `array_distinct` + `array_sort`) allocates a slice and a lambda frame
  * per window — measured 5.8s vs native at sf0.1 (50k docs).
  * Ordering is UTF8String binary order, identical to `array_sort` and to
  * DuckDB's default collation, so oracle results are unchanged. */
case class WinnowShingles(child: Expression, w: Int)
    extends UnaryExpression with Serializable {
  require(w >= 1, "window must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_shingles expects array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    WinnowShingles.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowShingles.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowShingles {
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // TreeSet = distinct + sorted in one structure; UTF8String's natural
    // order is unsigned byte-wise, matching array_sort.
    val marks = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i + w <= n) {
      // Null elements are skipped, matching the array_min HOF this
      // replaces (the SQL-registered form can receive containsNull arrays).
      var m: UTF8String = null
      var k = 0
      while (k < w) {
        val c = arr.getUTF8String(i + k)
        if (c != null && (m == null || c.compareTo(m) < 0)) m = c
        k += 1
      }
      // clone: the UTF8String may view an unsafe buffer that is reused
      // after this eval returns.
      if (m != null) marks.add(m.clone())
      i += 1
    }
    val out = new Array[Any](marks.size)
    val it = marks.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  def winnowShingles(shingles: Column, w: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WinnowShingles(GraftColumnBridge.expression(shingles), w))
  }
}

/** k-permutation MinHash signature of a string set (array<string> →
  * array<long> of length k), single pass per row. */
case class MinHashSignature(child: Expression, k: Int = 64)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private final val Seed1 = 0x9747b28cL
  private final val Seed2 = 0x243f6a8885a308dL

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h1 = XXH64.hashUTF8String(s, Seed1)
        val h2 = XXH64.hashUTF8String(s, Seed2)
        var j = 0
        var g = h1
        while (j < k) {
          if (g < mins(j)) mins(j) = g
          g += h2 // g_j = h1 + j*h2 (unsigned wraparound is fine)
          j += 1
        }
      }
      i += 1
    }
    // Empty input: deterministic all-zero signature (never collides with a
    // real min which is ~uniform over Long).
    if (n == 0) java.util.Arrays.fill(mins, 0L)
    ArrayData.toArrayData(mins)
  }

  def minhashSignature(shingles: Column, k: Int = 64): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(shingles), k))
  }
}
