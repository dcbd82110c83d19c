package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over embedding columns
  * (`ArrayType(FloatType)` or `ArrayType(DoubleType)`).
  *
  * Why an Expression and not a UDF/higher-order function: the similarity
  * inner loop runs O(N·M·dim) times in a kNN join — at 100 TB it dominates
  * the plan. This implementation stays inside whole-stage codegen (doGenCode
  * emits a static call, no boxing, no lambda allocation per row) and reads
  * the parquet float arrays directly without an up-front cast-to-double
  * projection.
  *
  * Accumulation is a sequential left fold in element order, in double —
  * bit-identical to DuckDB's `list_inner_product`-based oracle formula.
  *
  * Dimension mismatch: the loop runs over min(len(a), len(b)) — extra
  * trailing coordinates on the longer side are IGNORED, not an error
  * (DuckDB's `list_inner_product` raises instead). This is deliberate: a
  * kNN join evaluates the kernel billions of times and a per-row length
  * branch that throws would abort a 100 TB job on one ragged row. Callers
  * that must reject ragged embeddings should validate dimensions once at
  * ingest (`size(col) = lit(dim)`), not in the inner loop. Same contract
  * as [[DotProduct]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSimilarity.compute(
      l.asInstanceOf[ArrayData], isFloat(left),
      r.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute($l, ${isFloat(left)}, $r, ${isFloat(right)});")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH bucket ids of a vector, one per hash table, in
  * ONE pass over the input (`array<float|double>` → `array<long>` of length
  * `tables`; bucket = `bits` sign bits of the hyperplane projections).
  *
  * Why an Expression: the higher-order-function formulation
  * (`aggregate(zip_with(vec, lit(plane), ...)` per bit per table) evaluates
  * tables×bits separate lambda chains per row — 48 re-walks of the array
  * with per-element lambda invocation. This expression computes every
  * projection in a tight fused loop inside whole-stage codegen; the
  * hyperplane matrix is deterministic (MurmurHash3-seeded, identical to
  * [[graft.operators.SimilaritySearch.hyperplanes]]) and cached per
  * (tables, bits, dim). */
case class LshTableBuckets(child: Expression, tables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
  require(tables >= 1, s"tables must be >= 1, got $tables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_table_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_table_buckets expects array<float|double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    LshTableBuckets.compute(v.asInstanceOf[ArrayData], isFloat, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshTableBuckets.compute($c, $isFloat, $tables, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshTableBuckets {
  /** Hyperplane matrix rows, flattened [(table·bits + bit)][dim]. Values are
    * `MurmurHash3.productHash((table, bit, d)) % 10000 / 10000.0` — must stay
    * bit-identical to `SimilaritySearch.hyperplanes` (tests cross-check). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  def planesFor(tables: Int, bits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((tables, bits, dim), { key =>
      val (t, b, d) = key
      Array.tabulate(t * b) { tb =>
        val table = tb / b
        val bit = tb % b
        Array.tabulate(d) { i =>
          val h = scala.util.hashing.MurmurHash3.productHash((table, bit, i))
          (h % 10000) / 10000.0
        }
      }
    })

  /** Static hot loop shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, isFloat: Boolean, tables: Int, bits: Int): ArrayData = {
    val dim = vec.numElements()
    val planes = planesFor(tables, bits, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val row = planes(t * bits + j)
        var proj = 0.0
        var d = 0
        while (d < dim) {
          val x: Double = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          proj += x * row(d)
          d += 1
        }
        if (proj > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Column-API entry point: `lshTableBuckets($"embedding", 8, 6)`. */
  def lshTableBuckets(vec: Column, tables: Int, bits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      LshTableBuckets(GraftColumnBridge.expression(vec), tables, bits))
  }
}

/** Native dot product over embedding columns — the scoring kernel of
  * maximum-inner-product search (MIPS). Same codegen rationale as
  * [[CosineSimilarity]]; accumulation is a sequential left fold in element
  * order in double, bit-identical to DuckDB's `list_inner_product`.
  * Dimension mismatch truncates to min(len(a), len(b)) — see the
  * [[CosineSimilarity]] scaladoc for the contract and the ingest-time
  * validation pattern.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.compute(
      l.asInstanceOf[ArrayData], isFloat(left),
      r.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.DotProduct.compute($l, ${isFloat(left)}, $r, ${isFloat(right)});")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static hot loop shared by interpreted eval and generated code. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x: Double = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  /** Column-API entry point: `dotProduct($"a", $"b")`. */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}

object CosineSimilarity {
  /** Static hot loop shared by interpreted eval and generated code. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x: Double = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-API entry point: `cosineSim($"a", $"b")`. */
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
