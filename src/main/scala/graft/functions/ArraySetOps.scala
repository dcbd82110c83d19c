package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection cardinality of two SORTED distinct long arrays via a linear
  * merge walk — the hot inner loop of pairwise set-similarity joins.
  *
  * `size(array_intersect(a, b))` builds a hash set per invocation; on a
  * candidate-pair join evaluating millions of pairs that allocation
  * dominates. Sorting each array once per row upstream (`array_sort`)
  * amortizes to nothing, and the merge walk is branch-predictable and
  * allocation-free. Jaccard follows as ic / (|a| + |b| - ic).
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"intersect_count_sorted expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    IntersectCountSorted.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.IntersectCountSorted.compute($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product of two sparse vectors stored as parallel sorted
  * arrays — (keys, vals) per side, keys sorted ascending and distinct —
  * via the same allocation-free merge walk as [[IntersectCountSorted]].
  *
  * The s12 verify stage evaluates this once per surviving candidate pair;
  * the map_zip_with/aggregate HOF formulation it replaces built a merged
  * map and two lambda closures per pair (interpreted, never codegen'd),
  * and the map payload itself shuffled wider than two flat arrays. */
case class DotSortedArrays(aKeys: Expression, aVals: Expression,
                           bKeys: Expression, bVals: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with Serializable {

  override def first: Expression = aKeys
  override def second: Expression = aVals
  override def third: Expression = bKeys
  override def fourth: Expression = bVals
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_sorted_arrays"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (children.forall(c => ok(c.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_sorted_arrays expects four array<bigint>, got " +
        children.map(_.dataType).mkString(", "))
  }

  override def nullSafeEval(ak: Any, av: Any, bk: Any, bv: Any): Any =
    DotSortedArrays.compute(ak.asInstanceOf[ArrayData], av.asInstanceOf[ArrayData],
      bk.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ak, av, bk, bv) =>
      s"${ev.value} = graft.functions.DotSortedArrays.compute($ak, $av, $bk, $bv);")

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): Expression =
    copy(aKeys = first, aVals = second, bKeys = third, bVals = fourth)
}

object DotSortedArrays {
  def compute(ak: ArrayData, av: ArrayData, bk: ArrayData, bv: ArrayData): Long = {
    val na = ak.numElements()
    val nb = bk.numElements()
    var i = 0
    var j = 0
    var dot = 0L
    while (i < na && j < nb) {
      val x = ak.getLong(i)
      val y = bk.getLong(j)
      if (x == y) { dot += av.getLong(i) * bv.getLong(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    dot
  }

  def dotSortedArrays(ak: Column, av: Column, bk: Column, bv: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DotSortedArrays(GraftColumnBridge.expression(ak), GraftColumnBridge.expression(av),
        GraftColumnBridge.expression(bk), GraftColumnBridge.expression(bv)))
  }
}

object IntersectCountSorted {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def intersectCountSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      IntersectCountSorted(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
