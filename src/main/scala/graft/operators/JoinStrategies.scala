package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Join-shape utilities for the 100 TB case.
  *
  * Catalyst + AQE already pick broadcast vs sort-merge and split moderate
  * skew at runtime; these helpers cover the two situations that still need
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
}
