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

  test("asofJoin equals the naive non-equi formulation, nulls when no match") {
    // (key, ts, id): right rows carry a payload; ties on ts must resolve to
    // the greatest tie-break id; key 3 has no right rows at all.
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 20L), (3L, 10L, 30L))
      .toDF("k", "t", "lid")
      .select($"k", timestamp_micros($"t").as("ts"), $"lid")
    val right = Seq((1L, 100L, 1L, 1.0), (1L, 100L, 2L, 2.0), (1L, 150L, 3L, 3.0),
                    (2L, 60L, 4L, 4.0))
      .toDF("k", "t", "rid", "rv")
      .select($"k", timestamp_micros($"t").as("ts"), $"rid", $"rv")
    val got = JoinStrategies.asofJoin(left, right, "k", "ts",
        payload = Seq("rid", "rv"), tieBreak = Seq("rid"))
      .select($"lid", $"rid", $"rv").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (10L, Some(2L), Some(2.0)),  // exact-ts tie -> greatest rid
      (11L, Some(3L), Some(3.0)),  // latest at/preceding 200
      (20L, None, None),           // right row is later than the left ts
      (30L, None, None)))          // no right rows for the key
  }

  test("asofJoin follows SQL NULL semantics: NULL keys/timestamps never match") {
    val left = Seq((Some(1L), Some(100L), 10L), (None, Some(100L), 11L),
                   (Some(1L), None, 12L))
      .toDF("k", "t", "lid")
      .select($"k", timestamp_micros($"t").as("ts"), $"lid")
    val right = Seq((Some(1L), Some(50L), 1L), (None, Some(50L), 2L),
                    (Some(1L), None, 3L))
      .toDF("k", "t", "rid")
      .select($"k", timestamp_micros($"t").as("ts"), $"rid")
    val got = JoinStrategies.asofJoin(left, right, "k", "ts", Seq("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (10L, Some(1L)), // normal match; NULL-ts right row must NOT win
      (11L, None),     // NULL left key matches nothing (not even NULL right key)
      (12L, None)))    // NULL left ts precedes everything -> no match
  }

  test("asofJoin plan is shuffle+window, not a nested-loop join") {
    val ev = graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("cid"), $"value".as("cv"))
    val plan = JoinStrategies.asofJoin(l, r, "user_id", "ts", Seq("cid", "cv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asof join must not nested-loop:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("rangeJoinBinned equals the naive inequality join") {
    val left = Seq((1L, 1000L, 10L), (1L, 5000L, 11L), (2L, 1000L, 20L))
      .toDF("k", "t", "lid")
      .select($"k", timestamp_micros($"t" * 1000000L).as("ts"), $"lid")
    val right = (0L to 8000L by 500L).map(t => (1L, t, t))
      .toDF("k", "t", "rid")
      .select($"k", timestamp_micros($"t" * 1000000L).as("ts"), $"rid")
    // window: right.ts in [left.ts - 1000s, left.ts]
    val got = JoinStrategies.rangeJoinBinned(left, right, "k", "ts",
        lowerSec = -1000L, upperSec = 0L, payload = Seq("rid"))
      .groupBy($"lid").agg(count(lit(1)).as("n"), sum($"rid").as("s"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" &&
          $"r.ts" >= $"l.ts" - expr("INTERVAL 1000 SECOND") && $"r.ts" <= $"l.ts")
      .groupBy($"lid").agg(count(lit(1)).as("n"), sum($"rid").as("s"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
    assert(got.map(_._1).toSeq == Seq(10L, 11L)) // key 2 has no right rows
  }

  test("rangeJoinBinned plan is an equi hash/merge join, not a nested loop") {
    val ev = graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id".as("vid"))
    val plan = JoinStrategies.rangeJoinBinned(l, r, "user_id", "ts", -3600L, 0L, Seq("vid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must bin to an equi-join:\n$plan")
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
