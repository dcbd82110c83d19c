package graft.operators

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shape utilities for the 100 TB case.
  *
  * Catalyst + AQE already pick broadcast vs sort-merge and split moderate
  * skew at runtime; these helpers cover the situations that still need
  * explicit structure:
  *
  *  - [[saltedJoin]] — degenerate key skew (one key = a large fraction of
  *    the fact table). AQE splits skewed *partitions*, but a single hot key
  *    still lands in one task after the split-point; salting spreads one
  *    key over `numSalts` shuffle partitions by construction, at the cost
  *    of replicating the dimension side `numSalts`×.
  *  - [[writeBucketed]] — co-located layout for joins that repeat across
  *    jobs. Two tables bucketed by the join key into the same bucket count
  *    sort-merge-join with NO shuffle exchange on either side — at 100 TB
  *    the dominant cost of the join disappears from every consumer query.
  *  - [[asofJoin]] — temporal "latest value at or before t" join. Spark
  *    has no ASOF JOIN; the naive encoding (non-equi `r.ts <= l.ts` +
  *    row_number) is a BroadcastNestedLoopJoin — quadratic and
  *    single-node. This is the linear union+window formulation instead.
  *  - [[rangeJoinBinned]] — large-large interval join (`r.ts` within a
  *    fixed window of `l.ts`). A plain inequality join is again a
  *    nested-loop plan; binning both sides to window-sized buckets turns
  *    it into an equi-join on (key, bin) with a residual filter.
  */
object JoinStrategies {

  private val SaltCol = "__graft_salt"

  /** Equi-join `big ⋈ small` on `keys`, spreading each hot key of `big`
    * across `numSalts` shuffle partitions. Output equals the plain inner
    * join (salt columns are internal). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 numSalts: Int): DataFrame = {
    require(numSalts > 0)
    // Any row-level value works as a salt (it only spreads rows of one key
    // over partitions); spark_partition_id+local id avoids an RNG.
    val saltedBig = big.withColumn(SaltCol,
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(numSalts.toLong)))
    val explodedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    saltedBig.join(explodedSmall, keys :+ SaltCol).drop(SaltCol)
  }

  /** Write `df` as a bucketed (+ optionally sorted) table so future joins
    * and aggregations on `bucketCol` need no shuffle. `path` keeps the data
    * outside the default warehouse. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
    w.saveAsTable(tableName)
  }

  /** As-of join: every `left` row gains `payload` columns from the `right`
    * row with the greatest `tsCol <= left.tsCol` for the same `keyCol`
    * (null when no such row). Ties on `tsCol` are broken by `tieBreak`
    * (greatest wins); a right row exactly at `left.tsCol` counts.
    *
    * Plan shape: tag both sides, union, one window
    * (`last(payload, ignoreNulls)` over rows-unbounded-preceding), filter
    * the left tag back out. ONE shuffle on `keyCol` + a per-partition
    * sort — linear in |left|+|right| and fully distributed, vs the
    * nested-loop plan Spark produces for the equivalent non-equi join.
    *
    * `payload` names must not collide with `left` column names (rename on
    * the right side first).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[String],
               tieBreak: Seq[String] = Nil): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(!payload.exists(left.columns.contains),
      s"payload ${payload.mkString(",")} collides with a left column")
    // SQL join semantics for NULLs: a NULL key or NULL timestamp on the
    // right can never satisfy `r.key = l.key AND r.ts <= l.ts`, but the
    // window formulation would group/sort NULLs together and hand out
    // matches. Drop them up front. (Left rows with NULL key/ts come out
    // with a NULL payload naturally: no right row shares their partition
    // slot / precedes a nulls-first timestamp.)
    val rightClean = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val payloadT = rightClean.select(payload.map(col): _*).schema
    val tieCols = if (tieBreak.isEmpty) payload else tieBreak
    val tieT = rightClean.select(tieCols.map(col): _*).schema
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__is_l"),
      lit(null).cast(tieT).as("__tie"),
      struct(left.columns.map(col): _*).as("__row"),
      lit(null).cast(payloadT).as("__p"))
    val r = rightClean.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__is_l"),
      struct(tieCols.map(col): _*).as("__tie"),
      lit(null).cast(l.schema("__row").dataType).as("__row"),
      struct(payload.map(col): _*).as("__p"))
    // Right rows sort before left rows at equal ts (__is_l), so an exact-ts
    // match is visible to the frame ending at the left row.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__is_l"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)
      .select(col("__row.*") +: payload.map(p => col(s"__asof.$p").as(p)): _*)
  }

  /** Interval join: pairs `(l, r)` with the same `keyCol` and
    * `r.tsCol` ∈ [`l.tsCol + lower`, `l.tsCol + upper`] (bounds inclusive,
    * offsets in seconds, `lower <= upper`). Returns `left.*` +
    * `payload` columns of each matching right row; left rows with no match
    * are dropped (aggregate afterwards and re-join to keep them).
    *
    * Plan shape: both sides bin to `upper - lower`-second buckets; the
    * left side explodes to the (≤2 when the bin equals the window width)
    * candidate bins its window spans; equi-join on (key, bin); residual
    * range filter. Each right row lives in exactly ONE bin, so no
    * post-join dedup is needed. Linear + shuffle-partitionable, vs the
    * nested-loop plan of a raw inequality join.
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, keyCol: String,
                      tsCol: String, lowerSec: Long, upperSec: Long,
                      payload: Seq[String]): DataFrame = {
    require(lowerSec <= upperSec, "empty window")
    require(!payload.exists(left.columns.contains),
      s"payload ${payload.mkString(",")} collides with a left column")
    val binUs = math.max(1L, upperSec - lowerSec) * 1000000L
    def bin(c: Column): Column = floor(unix_micros(c) / binUs)
    val r = right.select(
      col(keyCol).as("__k"), bin(col(tsCol)).as("__bin"),
      col(tsCol).as("__rts"), struct(payload.map(col): _*).as("__p"))
    val l = left.withColumn("__bins",
        sequence(bin(col(tsCol) + expr(s"INTERVAL $lowerSec SECOND")),
                 bin(col(tsCol) + expr(s"INTERVAL $upperSec SECOND"))))
      .withColumn("__bin", explode(col("__bins")))
    l.join(r, l("__bin") === r("__bin") &&
              l(keyCol) === r("__k") &&
              r("__rts") >= l(tsCol) + expr(s"INTERVAL $lowerSec SECOND") &&
              r("__rts") <= l(tsCol) + expr(s"INTERVAL $upperSec SECOND"))
      .select(left.columns.map(l(_)) ++ payload.map(p => r("__p").getField(p).as(p)): _*)
  }
}
