package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GroupTopK

/** The custom GroupTopK operator: result equality with the window
  * formulation, row_number rank semantics, and the partial→exchange→final
  * plan shape that makes it the 100 TB path. */
class GroupTopKSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("matches the row_number window formulation exactly") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val viaOp = GroupTopK.topK(orders, Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
    assert(viaOp.count() == viaWindow.count())
    assert(viaOp.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaOp).isEmpty,
      "operator and window results must be identical")
  }

  test("plan: partial and final heaps around one exchange, no sort, no window") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val plan = GroupTopK.topK(orders, Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
      .queryExecution.executedPlan.toString
    assert("GroupTopK".r.findAllIn(plan).size == 2,
      s"expected partial+final GroupTopK execs:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no exchange:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into plan:\n$plan")
    assert(!plan.contains("Sort "), s"full sort in plan:\n$plan")
  }

  test("k larger than the group emits every row, gap-free ranks from 1") {
    val df = Seq((1L, 10.0), (1L, 30.0), (1L, 20.0), (2L, 5.0))
      .toDF("g", "v")
    val out = GroupTopK.topK(df, Seq("g"), Seq($"v".desc), k = 10)
      .as[(Long, Double, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 10.0, 3L), (1L, 20.0, 2L), (1L, 30.0, 1L), (2L, 5.0, 1L)))
  }

  test("heap eviction keeps the best k under arbitrary input order") {
    val df = spark.range(0, 10000)
      .select(($"id" % 7).as("g"), ($"id" * 2654435761L % 100000).as("v"), $"id")
    val viaOp = GroupTopK.topK(df, Seq("g"), Seq($"v".desc, $"id"), k = 5)
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val viaWindow = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5)
    assert(viaOp.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaOp).isEmpty)
  }

  test("partial flush under a tiny key cap changes nothing but memory") {
    // 500 keys against a cap of 3: the partial side flushes ~170 times per
    // partition; results must be identical to the uncapped run.
    val df = spark.range(0, 50000)
      .select(($"id" % 500).as("g"), ($"id" * 48271 % 99991).as("v"), $"id")
    val capped = GroupTopK.topK(df, Seq("g"), Seq($"v".desc, $"id"), k = 4,
      maxPartialKeys = 3)
    val uncapped = GroupTopK.topK(df, Seq("g"), Seq($"v".desc, $"id"), k = 4)
    assert(capped.count() == 2000)
    assert(capped.exceptAll(uncapped).isEmpty && uncapped.exceptAll(capped).isEmpty,
      "flush must be invisible in the result")
  }

  test("empty group = global top-k with ranks (distributed TakeOrdered)") {
    val df = spark.range(0, 100000)
      .select(($"id" * 2654435761L % 1000000).as("v"), $"id")
    val viaOp = GroupTopK.topK(df, Nil, Seq($"v".desc, $"id"), k = 7)
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    val viaSort = df.orderBy($"v".desc, $"id").limit(7)
      .as[(Long, Long)].collect().toSeq
    assert(viaOp.map(r => (r._1, r._2)) == viaSort)
    assert(viaOp.map(_._3) == (1L to 7L))
  }

  test("group-key filters push below the operator into the scan") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val q = GroupTopK.topK(orders, Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
      .filter($"o_custkey" < 100 && $"rnk" <= 2)
    // The group predicate reaches the parquet scan; the rank predicate
    // (non-group) must stay above the operator.
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(o_custkey), LessThan(o_custkey,100)]"),
      s"group filter did not reach the scan:\n$physical")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.indexOf("rnk") < optimized.indexOf("GroupTopK"),
      s"rank filter must stay above GroupTopK:\n$optimized")
    // And the semantics are unchanged vs filtering a window formulation.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .filter($"o_custkey" < 100 && $"rnk" <= 2)
    assert(q.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(q).isEmpty)
  }

  test("-0.0 and 0.0 group keys form ONE group, like any groupBy/window") {
    val df = Seq((-0.0, 1L), (0.0, 2L), (-0.0, 3L), (1.5, 4L)).toDF("g", "v")
    val out = GroupTopK.topK(df, Seq("g"), Seq($"v"), k = 10)
    // One group of three zeros (ranks 1..3) and one singleton.
    val ranks = out.filter($"v" <= 3).select($"rnk").as[Long].collect().sorted.toSeq
    assert(ranks == Seq(1L, 2L, 3L), s"zero keys split into groups: $ranks")
  }

  test("a pre-existing rank-name column is rejected instead of corrupted") {
    val df = Seq((1L, 2.0, 9L)).toDF("g", "v", "rnk")
    val e = intercept[IllegalArgumentException] {
      GroupTopK.topK(df, Seq("g"), Seq($"v"), k = 1)
    }
    assert(e.getMessage.contains("rnk"))
    // A non-colliding name works fine.
    val ok = GroupTopK.topK(df, Seq("g"), Seq($"v"), k = 1, rankName = "position")
    assert(ok.columns.toSeq == Seq("g", "v", "rnk", "position"))
  }

  test("rank column is renameable and registration is idempotent") {
    GroupTopK.register(spark)
    GroupTopK.register(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.GroupTopKStrategy) == 1)
    val df = Seq((1L, 2.0)).toDF("g", "v")
    val out = GroupTopK.topK(df, Seq("g"), Seq($"v"), k = 1, rankName = "position")
    assert(out.columns.toSeq == Seq("g", "v", "position"))
  }
}
