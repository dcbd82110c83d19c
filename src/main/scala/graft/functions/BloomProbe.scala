package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd Bloom-filter membership over a gram ARRAY — true iff any
  * element's k probe bits are all set (`exists` fused into the probe).
  *
  * Exists/transform are `HigherOrderFunction`s, which Spark evaluates as
  * CodegenFallback — per GRAM the interpreted 16-position expression tree
  * dominated p21/p22's wall clock. This expression walks the array in one
  * compiled pass: per gram two XXH64 draws (the exact arithmetic of
  * `xxhash64(gram)` / `xxhash64(gram, lit(0x9E3779B9))` — seed 42 then a
  * chained hashLong — FunctionsSpec pins expression-vs-Column equality so
  * the probe can never drift from the index build) and k strides of
  * Kirsch–Mitzenmacher double hashing against the referenced bit array.
  *
  * The bits ride as a codegen REFERENCE OBJECT (ctx.addReferenceObj), not
  * a literal: one deserialized long[] per task, shared across rows. */
case class BloomContainsAny(child: Expression, bits: Array[Long],
                            mBits: Int, k: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_any"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains_any expects array<string>, got $other")
    }

  override def nullSafeEval(arr: Any): Any =
    BloomContainsAny.compute(arr.asInstanceOf[ArrayData], bits, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomContainsAny.compute($a, $bitsRef, $mBits, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomContainsAny {
  /** Seed constant of the second hash draw — must equal the literal in
    * [[graft.operators.Sampling]]'s Column-based `bloomPositions` (the
    * index BUILD side). */
  final val H2Seed = 0x9E3779B9L

  def compute(arr: ArrayData, bits: Array[Long], m: Int, k: Int): Boolean = {
    val n = arr.numElements()
    val mL = m.toLong
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        // xxhash64(gram): seed 42, bytes folded once.
        val h1 = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        // xxhash64(gram, lit(H2Seed)): the long child chains onto h1.
        val h2 = XXH64.hashLong(H2Seed, h1)
        val h1m = java.lang.Math.floorMod(h1, mL)
        val stride = java.lang.Math.floorMod(h2, mL) * 2L + 1L
        var j = 0
        var all = true
        while (all && j < k) {
          val pos = ((h1m + j * stride) % mL).toInt
          if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) all = false
          j += 1
        }
        if (all) return true
      }
      i += 1
    }
    false
  }
}
