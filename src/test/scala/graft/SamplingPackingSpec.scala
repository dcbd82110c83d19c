package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}

class SamplingPackingSpec extends SparkSpecBase {
  import spark.implicits._

  test("hash split is deterministic, complete, and roughly proportioned") {
    val ids = spark.range(0, 10000).select($"id".as("doc_id"))
    val a = ids.select($"doc_id", Sampling.assignSplit($"doc_id").as("split"))
    val b = ids.select($"doc_id", Sampling.assignSplit($"doc_id").as("split"))
    assert(a.exceptAll(b).isEmpty, "same key must always map to the same split")
    val bySplit = a.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == 10000)
    assert(bySplit("train") > 7500 && bySplit("train") < 8500, bySplit.toString)
    assert(bySplit("valid") > 600 && bySplit("valid") < 1400, bySplit.toString)
    assert(bySplit("test") > 600 && bySplit("test") < 1400, bySplit.toString)
  }

  test("group-keyed split keeps every group in exactly one split") {
    val df = spark.range(0, 1000)
      .select($"id".as("doc_id"), ($"id" % 37).cast("string").as("source"))
    val split = df.select($"source", Sampling.assignSplit($"source").as("split"))
    assert(split.select($"source", $"split").distinct().count() == 37,
      "a group must never straddle splits")
  }

  test("samplePerGroup returns exactly k deterministic rows per group") {
    val df = spark.range(0, 5000)
      .select($"id".as("doc_id"), ($"id" % 10).as("g"))
    val s1 = Sampling.samplePerGroup(df, Seq("g"), "doc_id", k = 7)
    assert(s1.groupBy($"g").count().as[(Long, Long)].collect().forall(_._2 == 7))
    val s2 = Sampling.samplePerGroup(df, Seq("g"), "doc_id", k = 7)
    assert(s1.exceptAll(s2).isEmpty, "sample must be deterministic")
  }

  test("packSequences matches the single-window prefix sum across many buckets") {
    // Variable token counts; bucketSize 16 forces ~63 buckets so the
    // distributed scan's offset stitching is actually exercised.
    val docs = spark.range(0, 1000)
      .select($"id".as("doc_id"), (($"id" * 7919) % 97 + 1).as("n_tokens"))
    val got = Packing.packSequences(docs, "doc_id", "n_tokens",
        ctxLen = 256, bucketSize = 16)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().sortBy(_._1)
    val naive = docs.withColumn("pack_id",
        expr("CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) DIV 256 AS BIGINT)"))
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
    // pack ids are dense from 0 and each pack (except possibly the last)
    // spans >= ctxLen tokens' worth of starts
    val packs = got.map(_._2).distinct.sorted
    assert(packs.head == 0L && packs.zipWithIndex.forall { case (p, i) => p == i })
  }

  test("packSequences never splits below one full shuffle of the data") {
    val docs = spark.range(0, 100)
      .select($"id".as("doc_id"), lit(10L).as("n_tokens"))
    val plan = Packing.packSequences(docs, "doc_id", "n_tokens", 64, 16)
      .queryExecution.executedPlan.toString
    // the full-width side shuffles exactly once (one hashpartitioning of
    // the main branch); the offsets side is a partial-agg branch
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
