package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** BPE learn-then-apply (round 15): hand-trained merges on a tiny corpus,
  * the dual-anchored ",tok." representation's correctness on consecutive
  * chains (where a space-separated form fails), deterministic
  * tie-breaks, and the applied token counts. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("bpeTrain learns the hand-computed greedy merges") {
    // corpus: "aaab" x3, "ab" x2 -> pair counts: (a,a) 2*3=6, (a,b) 3+2=5
    // step1 merges (a,a); aaab -> [aa,a,b] (greedy leftmost)
    // step2 counts: (aa,a) 3, (a,b) 3+2=5 -> merges (a,b); aaab -> [aa,ab]
    // step3 counts: (aa,ab) 3 -> merges (aa,ab) = "aaab"
    val docsDf = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val ms = TextAnalysis.bpeTrain(docsDf, "text", topWords = 100, merges = 3)
    assert(ms.map(m => (m.step, m.pair, m.merged, m.count)) === Seq(
      (1, "a,a", "aa", 6L), (2, "a,b", "ab", 5L), (3, "aa,ab", "aaab", 3L)))
  }

  test("consecutive chains merge correctly (the dual-anchor guarantee)") {
    // "ababab": after rule (a,b)->ab ALL THREE occurrences must merge in
    // one pass — a single-delimiter form's shared delimiter would skip
    // every other one.
    val docsDf = Seq((1L, "ababab ababab xz")).toDF("doc_id", "text")
    val ms = TextAnalysis.bpeTrain(docsDf, "text", 100, 1)
    assert(ms.head.pair === "a,b" && ms.head.count === 6L)
    val applied = TextAnalysis.bpeApply(docsDf, "doc_id", "text", ms).collect()(0)
    // words: ababab(x2) -> 3 tokens each, xz -> 2 tokens
    assert(applied.getAs[Long]("n_words") === 3L)
    assert(applied.getAs[Long]("n_tokens") === 8L)
    // 14 chars, 8 tokens -> 5714 bp
    assert(applied.getAs[Long]("ratio_bp") === 8L * 10000L / 14L)
  }

  test("a rule never fires across a token boundary (prefix-crossing guard)") {
    // the×2, th×4, he×3 — step1 pairs: (t,h) 6 > (h,e) 5 -> merge (t,h);
    // "the" -> [th, e]. step2: (h,e) 3 > (th,e) 2 -> merge (h,e) — which
    // must NOT touch [th, e] even though the flat string ends ...h,e...
    // (a single-delimiter comma form falsely yields [the] here). step3:
    // (th,e) 2 still present -> merge.
    val docsDf = Seq((1L, "the the th th th th he he he")).toDF("doc_id", "text")
    val ms = TextAnalysis.bpeTrain(docsDf, "text", topWords = 100, merges = 3)
    assert(ms.map(m => (m.step, m.pair, m.merged, m.count)) === Seq(
      (1, "t,h", "th", 6L), (2, "h,e", "he", 3L), (3, "th,e", "the", 2L)))
    // apply only rules 1-2 to "the": must stay [th, e] = 2 tokens
    val applied = TextAnalysis.bpeApply(
      Seq((1L, "the")).toDF("doc_id", "text"), "doc_id", "text", ms.take(2))
      .collect()(0)
    assert(applied.getAs[Long]("n_tokens") === 2L)
  }

  test("argmax tie-break is (count desc, pair asc) — deterministic") {
    // "xy" x2, "zw" x2: pairs (x,y) 2 and (z,w) 2 -> "x,y" wins on ASC
    val docsDf = Seq((1L, "xy xy zw zw")).toDF("doc_id", "text")
    val ms = TextAnalysis.bpeTrain(docsDf, "text", 100, 2)
    assert(ms(0).pair === "x,y")
    assert(ms(1).pair === "z,w")
  }

  test("application handles empty docs, non-letters, and case folding") {
    val docsDf = Seq(
      (1L, "The QUICK brown"), // case-folds before extraction
      (2L, "123 !!! ..."), // no letter runs at all
      (3L, "a") // single symbol, no pairs
    ).toDF("doc_id", "text")
    val ms = Seq(TextAnalysis.BpeMerge(1, "t,h", "th", 1L))
    val rows = TextAnalysis.bpeApply(docsDf, "doc_id", "text", ms)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_words") === 3L)
    // "the"->th,e (2) + "quick"(5) + "brown"(5) = 12
    assert(rows(1L).getAs[Long]("n_tokens") === 12L)
    assert(rows(2L).getAs[Long]("n_words") === 0L)
    assert(rows(2L).getAs[Long]("n_tokens") === 0L)
    assert(rows(2L).getAs[Long]("ratio_bp") === 0L)
    assert(rows(3L).getAs[Long]("n_tokens") === 1L)
  }

  test("bpeApply rejects unsafe merge literals") {
    val docsDf = Seq((1L, "x")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException](
      TextAnalysis.bpeApply(docsDf, "doc_id", "text",
        Seq(TextAnalysis.BpeMerge(1, "a',b", "ab", 1L)))
    ).getMessage.contains("unsafe"))
  }

  test("the applied plan is one codegen'd projection — no shuffle, no UDF") {
    val docsDf = Seq((1L, "hello world")).toDF("doc_id", "text")
    val ms = TextAnalysis.bpeTrain(docsDf, "text", 100, 2)
    val plan = TextAnalysis.bpeApply(docsDf, "doc_id", "text", ms)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), "must stay UDF-free")
  }
}
