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
}
