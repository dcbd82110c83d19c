package graft

import graft.queries.RelationalQueries

/** Inventory-wide sanity: every SparkEntry query runs at sf0.001, returns
  * its declared shape, and every oracle key points at a real query. */
class QueriesSpec extends SparkSpecBase {
  private val dir = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every query executes and only the legitimately-empty ones are empty") {
    // q06 is the constant-false relation; q09's anti join is empty at this
    // SF because every customer has at least one order (oracle agrees).
    val mayBeEmpty = Set("q06_empty_relation", "q09_anti_join")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (name == "q06_empty_relation") assert(n == 0, s"$name expected empty")
      else if (!mayBeEmpty.contains(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct stays within 10% of exact") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val both = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
           countDistinct(col("l_partkey")).as("exact"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
    }
    // The q35 query's own error-band flags must all hold.
    val flags = SparkEntry.queries("q35_approx_distinct")(spark, dir)
      .select(col("l_returnflag"), col("within_10pct")).collect()
    assert(flags.nonEmpty && flags.forall(_.getLong(1) == 1L),
      "q35 within_10pct flag cleared for some return flag")
  }

  test("HLL sketch rollup estimates match exact distinct counts within 5%") {
    import org.apache.spark.sql.functions._
    // Raw estimate-vs-exact bound (the q42 query itself now emits only the
    // exact counts + the within-band flag, so the sketch rollup is rebuilt
    // here for a direct numeric check).
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    val r = spark.read.parquet(s"$dir/region.parquet")
    val joined = c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
    val est = joined
      .groupBy(col("r_name"), col("n_name"))
      .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      .groupBy(col("r_name"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    val exact = joined
      .groupBy(col("r_name")).agg(countDistinct(col("c_custkey")).as("e"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (region, e) =>
      val a = est(region).toDouble
      assert(math.abs(a - e) / e < 0.05, s"$region: approx $a vs exact $e")
    }
    // And the query's own error-band flags agree.
    val flags = SparkEntry.queries("q42_hll_union")(spark, dir)
      .select(col("region"), col("within_5pct")).collect()
    assert(flags.nonEmpty && flags.forall(_.getLong(1) == 1L),
      "q42 within_5pct flag cleared for some region")
  }

  test("pipeline plans: bucketed ops never degrade to nested-loop/cartesian joins") {
    // The 100 TB contract of the dedup/sampling family: every join is an
    // equi-join (hash or sort-merge, broadcast at most), never an all-pairs
    // BroadcastNestedLoopJoin/CartesianProduct. s02/d03 are the declared
    // exact ground-truth ops and are exempt by design; p06 is exempt
    // because its crossJoin against the 1-row n_min aggregate IS a
    // broadcast nested loop by construction (|strata| x 1 — Spark plans
    // scalar subqueries the same way), not a data-sized one.
    Seq("t10_repetition", "t11_oov_rate", "d08_chunk_dedup",
        "p04_stratified_sample", "p05_near_decontamination",
        "s05_semantic_dedup", "s06_quantize",
        "m02_frame_sample", "d04_minhash_lsh", "d06_embedding_dedup",
        "d01_dedup_exact", "p01_hash_split", "p03_decontamination",
        "p07_token_budget", "t12_bigram_topk", "p08_curriculum_bins",
        "s08_filtered_topk", "p09_chunk_windows", "d11_source_overlap")
      // d10 is absent for the same localCheckpoint reason as d09 below;
      // s07 shares s01's deliberate broadcast-NLJ (tiny query side).
      // d09 is intentionally absent: connectedComponents localCheckpoints,
      // so its executedPlan shows only the final anti join (the dedup
      // pipeline is hidden behind the checkpoint scan) while CONSTRUCTING
      // the plan eagerly runs the whole iterative clustering — all cost,
      // no assertion value. Its constituent stages (d03 via the exempt
      // ground-truth list, d07's loop) are covered elsewhere.
      .foreach { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
               !plan.contains("CartesianProduct"),
          s"$name plan degraded to an all-pairs join:\n$plan")
      }
  }

  test("t10 aggregates partially (map-side combine before the shuffle)") {
    val plan = SparkEntry.queries("t10_repetition")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"no partial aggregation in:\n$plan")
  }

  test("relational inventory covers the SURVEY checklist categories") {
    val names = RelationalQueries.queries.keySet
    // One representative per operator category (SURVEY.md §2.2-2.3).
    Seq("q01_project_rename", "q05_cross_join", "q07_distinct", "q08_semi_join",
      "q09_anti_join", "q11_lineitem_agg", "q12_window_rank", "q14_topk",
      "q15_union", "q17_string_funcs", "q18_date_funcs", "q19_json_agg",
      "q21_rollup", "q22_cube", "q24_scalar_subquery", "q25_exists",
      "q26_cte", "q31_distinct_agg", "q33_array_funcs", "q36_regexp")
      .foreach(n => assert(names.contains(n), s"missing $n"))
  }
}
