package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-byte-window difference hash (dHash) over a binary payload — the
  * PERCEPTUAL fingerprint of the multimodal family: bit i is the sign of
  * the gradient between adjacent bytes i and i+1 (unsigned order, first 64
  * bytes, 63 comparison bits in a long).
  *
  * Why gradient signs: any STRICTLY MONOTONE remap of byte values —
  * the byte-level model of a brightness/contrast/gamma re-encode, the
  * transformations image dHash is built to survive — preserves every
  * comparison, so the hash is bit-for-bit invariant where a cryptographic
  * digest (m04's md5) changes completely. Equal adjacent bytes hash as
  * "not greater" on both sides of a monotone remap, so ties are stable
  * too; the invariance claim needs strictness only so distinct values
  * cannot collapse into a tie (saturating remaps break it — callers model
  * headroom-respecting transforms, which ASCII payloads always have).
  *
  * Deliberately NOT a cryptographic hash: two payloads with the same
  * gradient profile collide by design (that is the "perceptual" trade).
  * Collisions are deterministic and engine-independent, so the m05 oracle
  * reproduces them exactly via the same comparisons in SQL.
  *
  * Codegen'd static-call loop (the SimHash64 pattern): frame
  * fingerprinting runs once per sampled frame of every media payload, so
  * it must stay inside whole-stage codegen without boxing.
  */
case class DHash64(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dhash64 expects binary, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    DHash64.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer variance NUMERATOR of a binary payload's byte values:
  * n·Σx² − (Σx)² over unsigned bytes — n² times the population variance,
  * kept in exact integer arithmetic so the threshold compare is
  * engine-stable (a floating variance would make the keep/drop flag
  * hash-fragile at the boundary). The energy signal of the multimodal
  * family: a constant payload (digital silence, a black frame) scores
  * exactly 0; any content scores thousands. Bounded: n ≤ 2^31 bytes of
  * values ≤ 255 keeps n·Σx² < 2^63 for payloads under ~140 KB per frame —
  * frames here are fixed small windows (64 B), far inside it.
  * Same codegen rationale as [[DHash64]]: runs once per sampled frame. */
case class ByteEnergy(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_energy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_energy expects binary, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    ByteEnergy.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteEnergy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteEnergy {
  /** n·Σx² − (Σx)² over unsigned byte values; empty payloads score 0. */
  def compute(bytes: Array[Byte]): Long = {
    var s = 0L
    var sq = 0L
    var i = 0
    while (i < bytes.length) {
      val x = (bytes(i) & 0xFF).toLong
      s += x
      sq += x * x
      i += 1
    }
    bytes.length * sq - s * s
  }

  def byteEnergy(payload: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ByteEnergy(GraftColumnBridge.expression(payload)))
  }
}

object DHash64 {
  /** Bit i (0..62) set iff byte i > byte i+1 unsigned, over the first
    * min(len, 64) bytes. Payloads shorter than 2 bytes hash to 0. */
  def compute(bytes: Array[Byte]): Long = {
    val n = math.min(bytes.length, 64)
    var out = 0L
    var i = 0
    while (i + 1 < n) {
      if ((bytes(i) & 0xFF) > (bytes(i + 1) & 0xFF)) out |= (1L << i)
      i += 1
    }
    out
  }

  def dhash64(payload: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DHash64(GraftColumnBridge.expression(payload)))
  }
}
