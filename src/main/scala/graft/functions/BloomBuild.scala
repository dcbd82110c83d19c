package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter BUILD as one imperative aggregate: each task ORs its
  * grams' k probe bits into a local `long[mBits/64]` buffer (classic
  * map-side partial aggregation — what `df.stat.bloomFilter` does
  * internally), partials merge by array OR, and the final value is the
  * bit array as ONE binary row, so the driver collect is bounded by the
  * FILTER SIZE, never the reference set.
  *
  * Replaces the round-11 build shape — `explode(array(k position
  * exprs))` → `(word, bit_or)` hash aggregate — which fanned every gram
  * into k=16 rows, re-derived both XXH64 draws inside each of the 16
  * position expressions (no cross-element subexpression elimination in
  * an `array(...)` literal), and hash-aggregated 16n rows into up to
  * m/64 groups. Here both hashes are drawn ONCE per gram and the k
  * strides are pure arithmetic (the Kirsch–Mitzenmacher double-hash,
  * bit-identical to [[BloomContainsAny.compute]]'s probe — the
  * build/probe pairing is pinned by Round12Spec against the Column
  * `bloomPositions` reference).
  *
  * Buffer lifecycle: one `long[mBits/64]` per (task × group). Flat
  * aggregation (no grouping) holds exactly one buffer per task; the
  * sharded build groups by a shard key, so callers repartition by shard
  * first when nShards × mBits/8 would crowd executor memory.
  */
case class BloomBitsAgg(child: Expression, mBits: Int, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(mBits > 0 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bits_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBitsAgg.setBits(v.asInstanceOf[UTF8String], buf, mBits, k)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomBitsAgg.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomBitsAgg.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBitsAgg =
    copy(child = newChild)
}

object BloomBitsAgg {

  /** The probe-side arithmetic verbatim ([[BloomContainsAny.compute]]),
    * writing instead of testing: two XXH64 draws per gram, k
    * Kirsch–Mitzenmacher strides. */
  def setBits(s: UTF8String, bits: Array[Long], m: Int, k: Int): Unit = {
    val mL = m.toLong
    val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    val h2 = XXH64.hashLong(BloomContainsAny.H2Seed, h1)
    val h1m = java.lang.Math.floorMod(h1, mL)
    val stride = java.lang.Math.floorMod(h2, mL) * 2L + 1L
    var j = 0
    while (j < k) {
      val pos = ((h1m + j * stride) % mL).toInt
      bits(pos >>> 6) |= 1L << (pos & 63)
      j += 1
    }
  }

  def toBytes(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().put(buf)
    bytes
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  def bloomBitsAgg(gram: Column, mBits: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BloomBitsAgg(GraftColumnBridge.expression(gram), mBits, k)
        .toAggregateExpression())
  }
}

/** Codegen'd membership probe against an N-way SHARDED Bloom filter —
  * the past-2³⁰-bits scale path: the reference set is split by an
  * independent per-gram hash draw into nShards sub-filters built and
  * sized separately, so no single bit array (or its builder's buffer)
  * ever exceeds ~2³⁰ bits. Per gram exactly ONE shard is probed (the
  * shard hash picks it; the other shards' bits are irrelevant to this
  * gram by construction), so probe cost is identical to the unsharded
  * filter plus one 64-bit hash.
  *
  * The shard draw hashes h1 again with [[ShardedBloomContains.ShardSeed]]
  * rather than reusing `h1 mod nShards`: both m and nShards are powers
  * of two, so reusing h1 would correlate the shard index with the low
  * bits of the first probe position and skew each shard's occupied
  * positions. nShards == 1 skips the draw and is bit-identical to
  * [[BloomContainsAny]]. */
case class ShardedBloomContains(child: Expression, shards: Array[Array[Long]],
                                mBits: Int, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sharded_bloom_contains_any"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sharded_bloom_contains_any expects array<string>, got $other")
    }

  override def nullSafeEval(arr: Any): Any =
    ShardedBloomContains.compute(
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      shards, mBits, k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val shardsRef = ctx.addReferenceObj("bloomShards", shards, "long[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShardedBloomContains.compute($a, $shardsRef, $mBits, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShardedBloomContains {
  /** Seed of the shard-selection draw (64-bit golden ratio — a constant
    * distinct from every other seed in the engine). */
  final val ShardSeed = 0x9E3779B97F4A7C15L

  def shardOf(h1: Long, nShards: Int): Int =
    if (nShards == 1) 0
    else java.lang.Math.floorMod(XXH64.hashLong(ShardSeed, h1), nShards.toLong).toInt

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              shards: Array[Array[Long]], m: Int, k: Int): Boolean = {
    val n = arr.numElements()
    val nShards = shards.length
    val mL = m.toLong
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h2 = XXH64.hashLong(BloomContainsAny.H2Seed, h1)
        val bits = shards(shardOf(h1, nShards))
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

  /** Shard index of a gram COLUMN (build side) — the same h1 + ShardSeed
    * draw [[compute]] makes probe-side, as Catalyst arithmetic:
    * `xxhash64(gram)` is the h1 draw, and `xxhash64(lit, gram-hash)`
    * cannot express hashLong(seed, v) directly, so the build side goes
    * through [[ShardOfGram]]. */
  def shardOfGram(gram: Column, nShards: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ShardOfGram(GraftColumnBridge.expression(gram), nShards))
  }
}

/** Build-side shard selector: `shardOf(xxhash64(gram), nShards)` as one
  * codegen'd scalar, guaranteed to agree with the probe's draw. */
case class ShardOfGram(child: Expression, nShards: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "shard_of_gram"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shard_of_gram expects string, got $other")
    }

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val h1 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    ShardedBloomContains.shardOf(h1, nShards)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.ShardedBloomContains.shardOf(
         |  org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L), $nShards);
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
