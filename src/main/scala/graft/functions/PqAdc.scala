package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) scoring kernel of product quantization
  * (Jégou et al. 2011, "Product quantization for nearest neighbor
  * search", public method): score = Σ_m lut[m·k + codes[m]], where
  * `codes` is a vector's m-byte PQ code word and `lut` is the probing
  * query's per-subspace lookup table (inner product of the query's m-th
  * slice with each of the k codebook centroids, laid out [m·k + code]).
  *
  * This is what makes PQ a SCAN format: the candidate side never
  * materializes floats — m table lookups per pair replace a dim-length
  * multiply-add, and the corpus rows carry m small ints (8 bytes at
  * m=8) instead of dim floats (256 bytes at dim=64). The lut is built
  * once per query (m·k short dot products) and amortized over every
  * candidate, which is the asymmetry the name refers to.
  *
  * Same codegen rationale as [[DotProduct]]: the kernel runs once per
  * (query, candidate) pair in an ANN scan, so it must stay inside
  * whole-stage codegen with no boxing. Out-of-range codes and short
  * arrays truncate (contribute nothing) rather than throw — the
  * [[CosineSimilarity]] ragged-row contract; callers validate code
  * words at encode time, not in the inner loop.
  */
case class PqAdcScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with Serializable {
  require(k >= 1, s"codebook size must be >= 1, got $k")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_score expects (array<int> codes, array<double> lut), got $l / $r")
    }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcScore.compute(
      codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.PqAdcScore.compute($c, $l, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  /** Static hot loop shared by interpreted eval and generated code. */
  def compute(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    val lutLen = lut.numElements()
    var score = 0.0
    var sub = 0
    while (sub < m) {
      val code = codes.getInt(sub)
      val idx = sub * k + code
      if (code >= 0 && code < k && idx < lutLen) score += lut.getDouble(idx)
      sub += 1
    }
    score
  }

  /** Column-API entry point: `pqAdcScore($"codes", $"lut", 16)`. */
  def pqAdcScore(codes: Column, lut: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PqAdcScore(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(lut), k))
  }
}

/** Codegen'd PQ ENCODER — the other half of the PQ scan format: map a
  * vector to its m-int code word (per subspace, the argmin over the k
  * codebook centroids of squared L2 on that slice; ties take the lowest
  * code, the ML findClosest convention).
  *
  * Why an Expression: the encode pass runs once per corpus vector at
  * build time, and the m chained Spark ML KMeans transforms it replaces
  * walk every row through the boxed Vector path m times — measured as
  * the dominant term of `ivf_pq_build` (≈95 s of a 32× stress build
  * that is seconds of actual arithmetic). This expression does the
  * whole code word in ONE codegen pass over the parquet arrays, no
  * boxing, no per-subspace projection chain. The codebooks ride along
  * as a flattened reference object — m·k·subDim doubles ≈ k vectors'
  * worth, broadcast-sized by construction.
  *
  * A vector shorter than m·subDim truncates (missing coordinates
  * contribute nothing) — the [[CosineSimilarity]] ragged-row contract. */
case class PqEncode(child: Expression, codebooks: Array[Double],
                    m: Int, k: Int, subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  require(m >= 1 && k >= 1 && subDim >= 1,
    s"bad PQ geometry: m=$m k=$k subDim=$subDim")
  require(codebooks.length == m * k * subDim,
    s"codebooks length ${codebooks.length} != m*k*subDim = ${m * k * subDim}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float|double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], isFloat, codebooks, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.compute($c, $isFloat, $cbRef, $m, $k, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Static hot loop shared by interpreted eval and generated code.
    * Codebook layout: cb[(sub·k + code)·subDim + d]. */
  def compute(v: ArrayData, vFloat: Boolean, cb: Array[Double],
              m: Int, k: Int, subDim: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      var bestCode = 0
      var bestD = Double.MaxValue
      var code = 0
      while (code < k) {
        val off = (sub * k + code) * subDim
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val vi = sub * subDim + d
          if (vi < n) {
            val x: Double =
              if (vFloat) v.getFloat(vi).toDouble else v.getDouble(vi)
            val dx = x - cb(off + d)
            s += dx * dx
          }
          d += 1
        }
        if (s < bestD) { bestD = s; bestCode = code }
        code += 1
      }
      out(sub) = bestCode
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column-API entry point; flattens the [sub][code][d] codebooks into
    * the reference-object layout. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]],
               subDim: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val m = codebooks.length
    val k = if (m == 0) 0 else codebooks(0).length
    val flat = new Array[Double](m * k * subDim)
    var i = 0
    var sub = 0
    while (sub < m) {
      var code = 0
      while (code < k) {
        val c = codebooks(sub)(code)
        var d = 0
        while (d < subDim) {
          flat(i) = if (d < c.length) c(d) else 0.0
          i += 1; d += 1
        }
        code += 1
      }
      sub += 1
    }
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(vec), flat, m, k, subDim))
  }
}
