package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench line is consumed from a ~2000-char tail window of the build
  * output; these tests pin the compaction contract that keeps it parseable
  * (rounds 1 and 2 overflowed the window and were recorded `parsed: null`).
  */
class BenchFormatSpec extends AnyFunSuite {

  private def parseable(s: String): Unit = {
    // No JSON lib on the classpath beyond Spark's shaded ones; structural
    // sanity is enough here — the driver uses a real parser.
    assert(s.startsWith("""{"metric":"total","value":"""))
    assert(s.endsWith("}"))
    assert(s.count(_ == '{') === s.count(_ == '}'))
    assert(!s.contains('\n'))
  }

  test("all current queries fit the line budget at realistic precision") {
    val names = SparkEntry.queries.keys.toSeq
    val results = names.zipWithIndex.map { case (n, i) => n -> (0.1 + i * 0.0173) }
    val (compact, full) = Bench.formatJson(results, Nil, "/root/testdata/sf0.1")
    parseable(compact); parseable(full)
    assert(compact.length <= Bench.LineBudget,
      s"compact line ${compact.length} chars > ${Bench.LineBudget}; " +
        "too many queries for full per-query detail — truncation should have engaged")
    names.foreach(n => assert(full.contains("\"" + n + "\":")))
  }

  test("over-budget inputs truncate to the slowest entries and record the cut") {
    val many = (1 to 400).map(i => f"query_with_a_long_name_$i%03d" -> i * 0.01)
    val (compact, full) = Bench.formatJson(many, Nil, "/sf")
    parseable(compact); parseable(full)
    assert(compact.length <= Bench.LineBudget)
    assert(compact.contains(""""omitted":"""))
    // slowest entry survives, fastest is cut
    assert(compact.contains("query_with_a_long_name_400"))
    assert(!compact.contains("query_with_a_long_name_001\":"))
    assert(!full.contains(""""omitted":"""))
  }

  test("errors surface and totals are millisecond-rounded") {
    val (compact, _) = Bench.formatJson(Seq("a" -> 1.23456789, "b" -> 2.0),
      Seq("b"), "/sf")
    assert(compact.contains(""""errors":["b"]"""))
    assert(compact.contains(""""value":3.235"""))
    assert(compact.contains(""""a":1.235"""))
    assert(compact.contains(""""b":2"""))
  }

  test("the errors key is present even on an all-pass run") {
    val (compact, full) = Bench.formatJson(Seq("a" -> 1.0), Nil, "/sf")
    assert(compact.contains(""""errors":[]"""))
    assert(full.contains(""""errors":[]"""))
  }

  test("an all-queries-fail run still fits the budget (error list truncates)") {
    val names = (1 to 200).map(i => f"long_failing_query_name_$i%03d")
    val results = names.map(_ -> 0.001)
    val (compact, _) = Bench.formatJson(results, names, "/sf")
    parseable(compact)
    assert(compact.length <= Bench.LineBudget, s"${compact.length} chars")
    assert(compact.contains(""""errors_omitted":"""))
  }

  test("warmup artifacts break down slowest-first; over-budget flags") {
    val wa = Seq("ivf_flat" -> 2.5, "media_pairs" -> 9.0, "dsir_model" -> 0.4)
    val (compact, full) = Bench.formatJson(Seq("a" -> 1.0), Nil, "/sf",
      warmupBuild = 11.9, warmupArtifacts = wa)
    parseable(compact); parseable(full)
    assert(full.contains(""""warmup_artifacts":{"media_pairs":9,"ivf_flat":2.5,"dsir_model":0.4}"""))
    assert(!full.contains("warmup_over_budget"), "11.9s is under budget")
    val (over, _) = Bench.formatJson(Seq("a" -> 1.0), Nil, "/sf",
      warmupBuild = Bench.WarmupBudgetSeconds + 0.1, warmupArtifacts = wa)
    assert(over.contains(""""warmup_over_budget":1"""))
  }

  test("artifact tail truncates before any query entry, floor of 3") {
    val names = SparkEntry.queries.keys.toSeq
    val results = names.zipWithIndex.map { case (n, i) => n -> (0.1 + i * 0.0173) }
    val wa = (1 to 40).map(i => f"artifact_family_name_$i%02d" -> i * 0.3)
    val (compact, full) = Bench.formatJson(results, Nil, "/sf",
      warmupBuild = wa.map(_._2).sum, warmupArtifacts = wa)
    parseable(compact); parseable(full)
    assert(compact.length <= Bench.LineBudget)
    // the 3 hottest artifacts always survive
    assert(compact.contains("artifact_family_name_40"))
    assert(compact.contains("artifact_family_name_38"))
    assert(compact.contains(""""wa_omitted":"""))
    assert(!full.contains(""""wa_omitted":"""))
    // no query entry was sacrificed for artifact telemetry while the
    // artifact tail could still shrink
    if (compact.contains(""""omitted":"""))
      assert(compact.indexOf(""""wa_omitted":""") >= 0)
  }

  test("compact line carries spread + oracle_forms (driver-visible, truncated)") {
    // 20 queries so the 1600-char budget forces truncation: the compact
    // line must still CARRY both keys (slowest-first) with explicit
    // omitted counts, because the driver records only a bounded stdout
    // tail — full-document-only keys are invisible to it.
    val results = (1 to 20).map(i => (f"q$i%02d_long_query_name", i * 0.1))
    val spreads = results.map { case (n, v) => n -> (v * 0.8, v * 1.3) }
    val forms = results.take(6).map { case (n, v) => n -> (v * 2) }
    val (compact, _) = Bench.formatJson(results, Nil, "/sf",
      spreads = spreads, oracleForms = forms)
    assert(compact.length <= Bench.LineBudget)
    assert(compact.contains(""""spread":{"""), "compact must carry spread")
    assert(compact.contains(""""oracle_forms":{"""), "compact must carry oracle_forms")
    // slowest query's spread survives the truncation
    assert(compact.contains(""""q20_long_query_name":["""))
  }

  test("spread is complete in the full document, ordered like queries") {
    val results = Seq("slow" -> 2.0, "fast" -> 0.5)
    val spreads = Seq("fast" -> (0.4, 0.9), "slow" -> (1.8, 2.6))
    val (compact, full) = Bench.formatJson(results, Nil, "/sf", spreads = spreads)
    parseable(compact); parseable(full)
    assert(full.contains(""""spread":{"slow":[1.8,2.6],"fast":[0.4,0.9]}"""))
    assert(!full.contains(""""spread_omitted""""),
      "the full document never truncates spread")
    // spread sits before queries so the accounting keys group together
    assert(full.indexOf(""""spread":""") < full.indexOf(""""queries":"""))
  }

  /** Round 13 (judge item 7): the budget gate must read COMMITTED bench
    * artifacts, not the gitignored working-tree BENCH_FULL.json (whatever
    * process ran last — in round 11 that silently validated the driver's
    * run as "the committed bench document"). The newest `bench_history/
    * r*_run*.json` triple is the committed record of this binary's cost.
    */
  test("the newest committed bench triple stays under the warmup budget") {
    val dir = new java.io.File("bench_history")
    assume(dir.isDirectory, "no bench_history directory")
    val Pat = """r(\d+)([a-z]?)_run(\d+)\.json""".r
    val runs = dir.listFiles().toSeq.flatMap { f =>
      f.getName match {
        case Pat(n, suf, _) => Some(((n.toInt, suf), f))
        case _ => None
      }
    }
    assume(runs.nonEmpty, "no r*_run*.json files committed")
    val newestKey = runs.map(_._1).max
    val newest = runs.filter(_._1 == newestKey).map(_._2)
    assert(newest.nonEmpty)
    newest.foreach { f =>
      val doc = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(doc.trim.nonEmpty, s"${f.getName} is empty — a crashed bench " +
        "run must not be committed as evidence (the r11b zero-byte lesson)")
      val m = """"warmup_build":([0-9.]+)""".r.findFirstMatchIn(doc)
      assert(m.isDefined, s"${f.getName} carries no warmup_build key")
      val v = m.get.group(1).toDouble
      assert(v <= Bench.WarmupBudgetSeconds,
        f"${f.getName}: warmup_build $v%.1f s exceeds the " +
          f"${Bench.WarmupBudgetSeconds}%.0f s budget — make the artifact " +
          "builds cheaper (see warmup_artifacts) or raise the budget as a " +
          "reviewed decision")
    }
  }

  /** Round 15 (r14 judge item 2): the committed triple must be the FULL
    * bench document — `spread` (per-query [min,max] of the 3 timed runs)
    * and `oracle_forms` are the outlier-discrimination keys the repo's
    * own host-drift attributions rest on (SURVEY §8.12 items 7/12/14).
    * A recurrence of a d04/d17-style outlier is only "classifiable from
    * the artifact alone" if the committed artifact carries the
    * classifier; r14's triples dropped both keys into the gitignored
    * working tree. Applies from r15 on (the newest triple).
    */
  test("the newest committed bench triple carries the spread/oracle_forms classifiers") {
    val dir = new java.io.File("bench_history")
    assume(dir.isDirectory, "no bench_history directory")
    val Pat = """r(\d+)([a-z]?)_run(\d+)\.json""".r
    val runs = dir.listFiles().toSeq.flatMap { f =>
      f.getName match {
        case Pat(n, suf, _) => Some(((n.toInt, suf), f))
        case _ => None
      }
    }
    assume(runs.nonEmpty, "no r*_run*.json files committed")
    val newestKey = runs.map(_._1).max
    assume(newestKey._1 >= 15, "pre-r15 triples predate the requirement")
    runs.filter(_._1 == newestKey).map(_._2).foreach { f =>
      val doc = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(doc.contains(""""spread":{"""),
        s"${f.getName} lacks the spread key — commit the FULL document " +
          "(BENCH_FULL.json), not the compact line")
      assert(doc.contains(""""oracle_forms":{"""),
        s"${f.getName} lacks oracle_forms — twin accounting must be " +
          "reconstructible from the committed artifact")
    }
  }
}
