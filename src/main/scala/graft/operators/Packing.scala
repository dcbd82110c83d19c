package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-length training sequences
  * by concatenating them in a stable order and chunking every `ctxLen`
  * tokens (a document whose tokens straddle a boundary belongs to the
  * pack holding its first token — exactly what concat-and-chunk training
  * data preparation does).
  *
  * `pack_id = (global running token count before this doc) div ctxLen`,
  * i.e. a global prefix sum — the classic two-pass parallel scan, kept
  * fully distributed and deterministic:
  *
  *  1. rows bucket by `orderCol div bucketSize` (a pure function of the
  *     row, NOT of physical placement — no `spark_partition_id`, so the
  *     result is reproducible and the exchange is canonically reusable);
  *     per-bucket running sums via a bucket-partitioned window;
  *  2. per-bucket totals (one row per bucket) get a tiny
  *     unbounded-preceding window to become prefix offsets, broadcast back.
  *
  * The only single-task step operates on #buckets rows. The offsets branch
  * is a second pass over the input, but a cheap one: column pruning cuts
  * its scan to (orderCol, tokenCol) and map-side partial aggregation means
  * it shuffles one row per (bucket × task), not the data. (Spark does NOT
  * reuse the main branch's exchange here — the partial aggregate sits
  * below the offsets exchange, so the subtrees differ.)
  */
object Packing {

  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    ctxLen: Long, bucketSize: Long = 1L << 16): DataFrame = {
    require(ctxLen > 0, "context length must be positive")
    require(bucketSize > 0, "bucket size must be positive")
    // DIV, not `/`: Column `/` is floating division. Assumes a non-negative
    // orderCol (bucket order must follow orderCol order).
    val bucketed = df.withColumn("__bkt",
      expr(s"CAST($orderCol AS BIGINT) DIV $bucketSize"))
    val wLocal = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__cum", sum(col(tokenCol)).over(wLocal))
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col(tokenCol)).as("__t"))
      .withColumn("__off",
        // Unpartitioned by design: one row per pack bucket survives the
        // aggregate, so this prefix sum runs over ~(corpus tokens / bucket
        // size) rows, not the corpus. WindowExec's moving-all-data warning
        // is expected and bounded here.
        coalesce(sum(col("__t")).over(
          Window.orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bkt"), col("__off"))
    // Integer arithmetic end-to-end: at 100 TB the global token count
    // overflows double's 2^53 mantissa long before it overflows BIGINT.
    local.join(broadcast(offsets), "__bkt")
      .withColumn("pack_id",
        expr(s"CAST((__cum + __off - $tokenCol) DIV $ctxLen AS BIGINT)"))
      .drop("__bkt", "__cum", "__off")
  }

  /** p18: the training-shard manifest — the deterministic global shuffle
    * every training-data pipeline ends with: each document lands in a
    * pseudo-random shard (`shard` = the p01 md5-bucket of its id, so the
    * assignment is reproducible, content-independent, and stable under
    * re-runs) at a deterministic position within it (`shard_pos` = rank
    * by (full md5, id) inside the shard — md5-ordered, so within-shard
    * order is itself a shuffle, not ingest order). A trainer that reads
    * shards in index order and rows in position order sees a reproducible
    * global permutation of the corpus; the manifest is the contract that
    * makes a 100 TB run resumable and auditable.
    *
    * Scale contract: `nShards` must scale with the corpus so one shard ≈
    * one output file (the sink's maxRecordsPerFile geometry — millions of
    * shards at 100 TB, NOT 32): per-shard population is then bounded and
    * the rank window sorts bounded groups (the q38 per-group-sort
    * argument). Writing is one `partitionBy(shard)` pass — the shuffle is
    * keyed on the shard, exactly the exchange the manifest implies.
    *
    * Output: (idCol, shard, shard_pos), zero-based positions. */
  def shardManifest(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("shard", Sampling.hashBucket(col(idCol), nShards))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** p19: per-shard integrity checksums — the manifest table a dataset
    * release publishes beside its shards (the HF-datasets checksum
    * practice): per [[shardManifest]] shard, the document count and an
    * ORDER-FREE content checksum (bit_xor of a 60-bit md5-derived digest
    * per document — xor is commutative/associative, so the checksum is
    * independent of row order and partitioning, and any single-document
    * change flips it). Verification after a copy/rewrite is one scan +
    * one aggregate against the published table; a 60-bit digest keeps
    * the '0x'-parse inside signed BIGINT on every engine.
    *
    * Plan shape: the manifest's shard assignment is scan-side (md5
    * bucket of the id — no join with the manifest needed, the
    * assignment is recomputed, deterministic by construction); digests
    * are scan-side; ONE hash aggregate keyed on the shard with map-side
    * partial xor. Output: (shard, n_docs, checksum). */
  def shardChecksums(df: DataFrame, idCol: String, textCol: String,
                     nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    df.select(Sampling.hashBucket(col(idCol), nShards).as("shard"),
        expr(s"CAST(conv(substring(md5($textCol), 1, 15), 16, 10) AS BIGINT)")
          .as("__dg"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(__dg)").as("checksum"))
  }
}
