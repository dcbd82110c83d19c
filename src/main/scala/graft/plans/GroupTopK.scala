package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Expression, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Per-key top-k as a first-class Catalyst operator: logical node +
  * strategy + physical plan, registered through
  * `spark.experimental.extraStrategies` (no session rebuild needed).
  *
  * Why a custom operator: Spark's idiomatic per-key top-k is
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k`, whose
  * physical plan shuffles EVERY row to its key's partition and then sorts
  * ENTIRE partitions — at 100 TB that is a full-data shuffle plus a full
  * sort to keep k rows per key. This operator keeps a bounded heap per key
  * on the MAP side (the top-k analogue of partial aggregation), so at most
  * `k × |keys|` rows per input partition reach the exchange; the reduce
  * side merges heaps and emits ranks. Shuffled bytes drop from O(N) to
  * O(k · |keys| · partitions) and no full sort ever runs — the sort that
  * remains is per-key over ≤ k survivors.
  *
  * Rank semantics are exactly `row_number` (1-based, gap-free) provided
  * the ordering is total per key (give it a tiebreak column, same as any
  * deterministic window query).
  *
  * CODEGEN BOUNDARY (documented, by design): [[GroupTopKExec]] does not
  * implement `CodegenSupport`, so whole-stage fusion breaks at its input
  * — the upstream scan/project span ends in a `WholeStageCodegen` block
  * that feeds this operator row-by-row, and any downstream codegen span
  * starts fresh above it. That is the same boundary every blocking
  * operator (sort, window, non-codegen aggregate) introduces, and it is
  * the right trade here: the operator's value is shuffle-volume
  * reduction (O(k·keys) vs O(N)), which dwarfs the per-row virtual-call
  * cost at the boundary. The plan-shape expectations live with the
  * operator's specs — GroupTopKSpec (partial/final split, pushdown
  * through the node) and Round5Spec/Round11Spec (the multi-flush and
  * AQE-coalesced-to-1 partition ends).
  */
final case class GroupTopK(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: AttributeReference =
      AttributeReference("rnk", LongType, nullable = false)(),
    maxPartialKeys: Int = GroupTopK.DefaultMaxPartialKeys)
    extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  require(maxPartialKeys >= 1, s"maxPartialKeys must be >= 1, got $maxPartialKeys")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // The rank is born here, not read from the child — without this,
  // CheckAnalysis rejects the plan for consuming an attribute no child
  // provides.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

/** Physical per-partition bounded-heap top-k. Used twice per logical node
  * (the partial/final pattern of HashAggregateExec): `partial = true` runs
  * before the exchange with no distribution requirement and emits its
  * survivors WITHOUT ranks; `partial = false` requires clustering on the
  * group key (EnsureRequirements inserts the shuffle), merges the partial
  * survivors, and appends the rank.
  *
  * Memory on the partial side is STRICTLY bounded: the heap map holds at
  * most `maxPartialKeys` keys × k row copies; when a new key would exceed
  * the bound, the map's current contents are emitted downstream and the
  * map resets. Emitting a superset of the per-key top-k is always correct
  * before the merge — the final side re-filters — so the flush trades a
  * little shuffle volume for a hard memory ceiling on high-cardinality
  * keys (hash aggregation spills in the same situation; top-k can do
  * better because partial results are summable). The final side holds the
  * partition's keys × k rows, the same envelope as a final hash
  * aggregate.
  */
final case class GroupTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    rankAttr: AttributeReference,
    maxPartialKeys: Int,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // Empty group = GLOBAL top-k with ranks: the final merge needs all
    // partial survivors on one partition (≤ k rows per input partition —
    // a distributed TakeOrdered that also emits row_number).
    else if (groupExprs.isEmpty) org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = {
    import org.apache.spark.sql.execution.metric.SQLMetrics
    val base = Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))
    if (partial)
      base + ("numFlushes" -> SQLMetrics.createMetric(sparkContext,
        "partial heap-map drains (1 per partition + 1 per key-cap hit)"))
    else base
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val grpExprs = groupExprs
    val ordExprs = order
    val limit = k
    val isPartial = partial
    val keyCap = maxPartialKeys
    val outRows = longMetric("numOutputRows")
    val flushes = if (partial) Some(longMetric("numFlushes")) else None
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(grpExprs, childOutput)
      val ordering = RowOrdering.create(ordExprs, childOutput)
      // Heap head = the WORST retained row (last in sort order): eviction
      // compares candidates against it in O(1), replacement is O(log k).
      val heaps = new java.util.LinkedHashMap[
        UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      def insert(row: InternalRow): Boolean = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        val isNewKey = heap == null
        if (isNewKey && !(isPartial && heaps.size() >= keyCap)) {
          heap = new java.util.PriorityQueue[InternalRow](limit, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap == null) false // partial map full: caller flushes, then retries
        else {
          if (heap.size < limit) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
          true
        }
      }
      if (isPartial) {
        // Streaming state machine: consume input, and whenever the heap
        // map would exceed keyCap keys, drain it downstream and reset —
        // strictly bounded memory at any key cardinality. Survivors
        // stream out unranked; order within a group is irrelevant before
        // the merge.
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[InternalRow] =
            java.util.Collections.emptyIterator()
          private var pending: InternalRow = null
          private def drain(): java.util.Iterator[InternalRow] = {
            val all = new java.util.ArrayList[InternalRow]()
            heaps.values().forEach(h => all.addAll(h))
            heaps.clear()
            flushes.foreach(_.add(1))
            all.iterator()
          }
          override def hasNext: Boolean = {
            while (!cur.hasNext) {
              if (pending != null) {
                val row = pending; pending = null
                insert(row) // map just drained: always succeeds
              }
              if (!iter.hasNext) {
                if (heaps.isEmpty) return false
                cur = drain()
              } else {
                val row = iter.next()
                if (!insert(row)) { pending = row.copy(); cur = drain() }
              }
            }
            true
          }
          override def next(): InternalRow = { outRows.add(1); cur.next() }
        }
      } else {
        while (iter.hasNext) insert(iter.next())
        val groups = heaps.values().iterator()
        val outProj = UnsafeProjection.create(
          (childOutput :+ rankAttr).map(_.dataType).toArray)
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new JoinedRow
        new Iterator[InternalRow] {
          private var cur: Array[InternalRow] = Array.empty
          private var i = 0
          override def hasNext: Boolean = {
            while (i >= cur.length && groups.hasNext) {
              val heap = groups.next()
              cur = heap.toArray(new Array[InternalRow](heap.size))
              java.util.Arrays.sort(cur, ordering)
              i = 0
            }
            i < cur.length
          }
          override def next(): InternalRow = {
            rankRow.setLong(0, i + 1L)
            val out = outProj(joined(cur(i), rankRow))
            i += 1
            outRows.add(1)
            out
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}

/** Optimizer rule: group-key predicates commute with per-key top-k (each
  * group's result is independent of every other group), so a Filter on the
  * group columns sitting ABOVE GroupTopK moves below it — from there
  * Spark's own pushdown walks it the rest of the way into the scan
  * (`PushedFilters`), and the heaps never see pruned groups. Predicates
  * touching non-group columns (including the rank) must stay above: they
  * would change which rows compete for the top k. */
object PushFilterThroughGroupTopK
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet => ASet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Guard: only when every group expr is a bare Attribute. With derived
    // group exprs (e.g. a % 10) a predicate on the underlying column is
    // NOT a function of the group value — pushing `a > 5` under a group
    // key of `a % 10` would remove rows from groups they still compete
    // in. Attributes are the only case where "references ⊆ group refs"
    // implies "constant within a group".
    case f @ Filter(cond, g: GroupTopK)
        if g.groupExprs.forall(_.isInstanceOf[Attribute]) =>
      val groupRefs = ASet(g.groupExprs.flatMap(_.references))
      val (push, keep) = conjuncts(cond)
        .partition(p => p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(groupRefs))
      if (push.isEmpty) f
      else {
        val below = g.copy(child = Filter(push.reduce(And), g.child))
        keep.reduceOption(And).map(Filter(_, below)).getOrElse(below)
      }
  }
}

/** Plans [[GroupTopK]] as partial exec → (exchange via EnsureRequirements)
  * → final exec. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupTopK =>
      // Normalize float/double group keys (-0.0 → 0.0, canonical NaN) the
      // same way Spark does for groupBy/window/join keys: the heap map
      // compares raw UnsafeRow bytes and the exchange hashes the
      // expressions, so without this a group keyed by -0.0 and 0.0 would
      // split into two groups — diverging from the row_number window this
      // operator is rank-equivalent to.
      val grp = g.groupExprs.map(
        org.apache.spark.sql.GraftColumnBridge.normalizeFloats)
      val partial = GroupTopKExec(grp, g.order, g.k,
        partial = true, g.rankAttr, g.maxPartialKeys, planLater(g.child))
      GroupTopKExec(grp, g.order, g.k,
        partial = false, g.rankAttr, g.maxPartialKeys, partial) :: Nil
    case _ => Nil
  }
}

object GroupTopK {

  /** Partial-side heap-map key bound (see [[GroupTopKExec]]): 64k keys ×
    * k rows is a few tens of MB for typical row widths — comfortably
    * inside an executor task's working memory. */
  val DefaultMaxPartialKeys: Int = 1 << 16

  /** Idempotently register the strategy + pushdown rule on an existing
    * session — no `spark.sql.extensions` config or session rebuild
    * required. Synchronized: the check-and-append below is a
    * read-modify-write on the session's mutable strategy list, and two
    * concurrent topK calls on one session could otherwise double-register
    * (or interleave and drop) a strategy. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GroupTopKStrategy
      if (!spark.experimental.extraOptimizations.contains(PushFilterThroughGroupTopK))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ PushFilterThroughGroupTopK
    }

  /** Top `k` rows per group, ranked 1..k in `orderBy` order (append a
    * unique tiebreak for deterministic results, as with any window). The
    * rank column is emitted as `rankName`.
    *
    * Column resolution is delegated to the analyzer: the `orderBy`
    * columns are planted in a throwaway `Sort` over the input (Spark 4
    * Columns carry unresolved column-node expressions that only the
    * analyzer can bind), and the resolved `SortOrder`s plus analyzed
    * child are harvested from it. */
  def topK(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
           k: Int, rankName: String = "rnk",
           maxPartialKeys: Int = DefaultMaxPartialKeys): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val spark = df.sparkSession
    register(spark)
    require(!df.columns.contains(rankName),
      s"input already has a column named '$rankName' — pass a different rankName")
    val sortPlan = GraftColumnBridge.logicalPlan(df.sort(orderBy: _*))
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val grp = groupCols.map(c => GraftColumnBridge.expression(df(c)))
    // Internal rank name, renamed on the way out. withColumnRenamed
    // renames EVERY match, so the name must not collide with any input
    // column — including a user column literally named "__gtk_rnk":
    // suffix until unique instead of assuming the prefix is reserved.
    val internal = Iterator.from(0)
      .map(i => if (i == 0) "__gtk_rnk" else s"__gtk_rnk$i")
      .find(n => !df.columns.contains(n)).get
    val node = GroupTopK(grp, sortPlan.order, k, sortPlan.child,
      rankAttr = AttributeReference(internal, LongType, nullable = false)(),
      maxPartialKeys = maxPartialKeys)
    GraftColumnBridge.ofRows(spark, node)
      .withColumnRenamed(internal, rankName)
  }
}
