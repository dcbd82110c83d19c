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
