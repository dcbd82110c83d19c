package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinStrategies

class JoinStrategiesSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join returns exactly the plain join result on skewed data") {
    // 90% of fact rows share one hot key.
    val big = spark.range(0, 10000)
      .select(when($"id" % 10 < 9, lit(7L)).otherwise($"id" % 100).as("k"),
        $"id".as("v"))
    val small = spark.range(0, 100).select($"id".as("k"), ($"id" * 10).as("w"))
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum($"v"), sum($"w"))
      .as[(Long, Long, Long)].head()
    val salted = JoinStrategies.saltedJoin(big, small, Seq("k"), numSalts = 8)
      .agg(count(lit(1)), sum($"v"), sum($"w")).as[(Long, Long, Long)].head()
    assert(salted == plain)
  }

  test("bucketed tables sort-merge-join with no shuffle exchange") {
    val dir = tmpDir("bucketed")
    JoinStrategies.writeBucketed(
      spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("a")),
      "graft_bkt_a", s"$dir/a", "k", numBuckets = 4)
    JoinStrategies.writeBucketed(
      spark.range(0, 1000).select($"id".as("k"), ($"id" * 3).as("b")),
      "graft_bkt_b", s"$dir/b", "k", numBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("date-partitioned layout prunes partitions at scan time") {
    val dir = tmpDir("pruned")
    spark.range(0, 1000)
      .select($"id", (($"id" % 10)).cast("int").as("day"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter($"day" === 3)
    val qe = q.queryExecution
    assert(qe.executedPlan.toString.contains("PartitionFilters"), qe.executedPlan.toString)
    // Execute THIS plan instance (count() would re-plan and leave these
    // metrics untouched), then read its scan metrics.
    assert(qe.executedPlan.execute().count() == 100)
    // Pruning proof: the scan's numFiles metric (post-execution) equals the
    // file count of the ONE matching partition directory. (inputFiles is
    // not pruning-aware — it lists the whole relation.)
    val numFilesRead = qe.executedPlan
      .collect { case p if p.metrics.contains("numFiles") => p.metrics("numFiles").value }
    val day3Files = new java.io.File(s"$dir/day=3").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(day3Files > 0)
    assert(numFilesRead.nonEmpty && numFilesRead.head == day3Files,
      s"scan read $numFilesRead files, day=3 has $day3Files")
  }
}
