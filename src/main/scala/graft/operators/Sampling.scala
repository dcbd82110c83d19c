package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Everything here is a pure function of row CONTENT (md5 of a key), never
  * of physical placement (`rand()`, partition ids, row order) — so splits
  * are reproducible across runs, cluster sizes, and engines, and a re-run
  * over grown data keeps every existing row's assignment. md5 rather than
  * xxhash64/hash because the reference oracle (and any other engine a user
  * compares against) computes the identical digest.
  */
object Sampling {

  /** Stable bucket in [0, buckets): first 8 md5 hex chars as an integer.
    * 32 uniform bits is plenty for percentage-grade bucketing. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** train/valid/test label from [[hashBucket]]. Pass a group key (e.g. the
    * document's source) instead of the row id to keep whole groups in one
    * split — the group-leakage-safe variant. */
  def assignSplit(key: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100)
    val b = hashBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "valid")
      .otherwise("test")
  }

  /** Exact train/eval decontamination: pairs of byte-identical documents
    * whose split assignments straddle the train boundary — each pair is a
    * training document leaking into an evaluation split. Content equality
    * via md5, so the join key is a fixed 32-char hex digest, never the
    * document body; one hash equi-join, no quadratic stage. (Near-duplicate decontamination =
    * run [[graft.operators.Dedup.minhashNearDups]] and filter pairs whose
    * splits differ — same shape, sketch key instead of md5.) */
  def exactContamination(df: DataFrame, idCol: String, textCol: String,
                         splitCol: String, trainLabel: String = "train"): DataFrame = {
    val h = df.select(col(idCol), md5(col(textCol)).as("__h"), col(splitCol))
    val tr = h.filter(col(splitCol) === trainLabel)
      .select(col(idCol).as("train_id"), col("__h"))
    val ev = h.filter(col(splitCol) =!= trainLabel)
      .select(col(idCol).as("eval_id"), col("__h"), col(splitCol).as("eval_split"))
    tr.join(ev, Seq("__h"))
      .select(col("train_id"), col("eval_id"), col("eval_split"))
  }

  /** Deterministic "random" k-per-group sample: the k rows whose key hash
    * sorts lowest within each group. One shuffle on the group columns;
    * rank-k per group, so output is `k × |groups|` regardless of skew. */
  def samplePerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
                     k: Int): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
