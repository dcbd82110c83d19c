package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** t16 boilerplate line removal: cut-ALL-copies semantics (vs d08/d16
  * keep-first), threshold exactness, order-preserving rebuild, the
  * build/apply split contract, and the shuffle-key ledger.
  */
class BoilerplateSpec extends SparkSpecBase {

  // 16 words — one full line at the default window width.
  private val banner =
    "b01 b02 b03 b04 b05 b06 b07 b08 b09 b10 b11 b12 b13 b14 b15 b16"

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def bodies(n: Int): Seq[String] =
    (0 until n).map(i => (0 until 20).map(j => s"w${i}_$j").mkString(" "))

  test("a line reaching minDocs is cut from EVERY doc — including the first") {
    val bs = bodies(4)
    val rows = (0L until 4L).map(i => (i, s"$banner ${bs(i.toInt)}"))
    val out = TextAnalysis
      .scrubBoilerplate(df(rows), "doc_id", "text", lineTokens = 16, minDocs = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    (0L until 4L).foreach { i =>
      val (nLines, nCut, clean) = out(i)
      assert(nLines === 3) // banner + 20 body tokens = 16+16+4 → 3 windows
      assert(nCut === 1, s"doc $i: banner not cut")
      assert(clean === bs(i.toInt), s"doc $i: rebuild mismatch")
    }
  }

  test("a line at df = minDocs - 1 survives everywhere") {
    val bs = bodies(3)
    val rows = (0L until 3L).map(i => (i, s"$banner ${bs(i.toInt)}"))
    val out = TextAnalysis
      .scrubBoilerplate(df(rows), "doc_id", "text", lineTokens = 16, minDocs = 4)
      .collect()
    assert(out.forall(_.getLong(2) == 0L), "below-threshold line was cut")
    out.foreach { r =>
      assert(r.getString(3) === s"$banner ${bs(r.getLong(0).toInt)}")
    }
  }

  test("an all-boilerplate doc survives with empty clean_text (map, not filter)") {
    val bs = bodies(3)
    val rows = (0L until 3L).map(i => (i, s"$banner ${bs(i.toInt)}")) :+
      (9L, banner)
    val out = TextAnalysis
      .scrubBoilerplate(df(rows), "doc_id", "text", lineTokens = 16, minDocs = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out.contains(9L))
    assert(out(9L) === ((1L, "")))
  }

  test("mid-doc boilerplate cut preserves surrounding line order") {
    // Line layout per doc: [body16][banner][tail] — the cut must splice
    // the tail directly after the first window.
    val heads = bodies(4).map(_.split(" ").take(16).mkString(" "))
    val rows = (0L until 4L).map(i =>
      (i, s"${heads(i.toInt)} $banner tail${i}_a tail${i}_b"))
    val out = TextAnalysis
      .scrubBoilerplate(df(rows), "doc_id", "text", lineTokens = 16, minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    (0L until 4L).foreach { i =>
      assert(out(i) === s"${heads(i.toInt)} tail${i}_a tail${i}_b")
    }
  }

  test("apply against an empty flagged table is a canonical pass-through") {
    val s = spark
    import s.implicits._
    val rows = (0L until 3L).map(i => (i, bodies(3)(i.toInt)))
    val empty = TextAnalysis.BoilerplateLines(Seq.empty[String].toDF("h"), 16)
    val out = TextAnalysis
      .scrubBoilerplateAgainst(df(rows), "doc_id", "text", empty)
      .collect()
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.map(r => r.getLong(0) -> r.getString(3)).toMap ===
      rows.toMap)
  }

  test("duplicate rows in a caller-built flagged table do not fan the probe out") {
    val s = spark
    import s.implicits._
    val bs = bodies(4)
    val rows = (0L until 4L).map(i => (i, s"$banner ${bs(i.toInt)}"))
    val flagged = TextAnalysis.boilerplateLineTable(
      df(rows), "doc_id", "text", lineTokens = 16, minDocs = 4)
    def run(f: TextAnalysis.BoilerplateLines) = TextAnalysis
      .scrubBoilerplateAgainst(df(rows), "doc_id", "text", f)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(run(flagged) === run(TextAnalysis.BoilerplateLines(
      flagged.flagged.unionAll(flagged.flagged), flagged.lineTokens)))
  }

  test("artifact save/load round-trips the flagged set AND the window geometry") {
    val bs = bodies(4)
    val rows = (0L until 4L).map(i => (i, s"$banner ${bs(i.toInt)}"))
    val built = TextAnalysis.boilerplateLineTable(
      df(rows), "doc_id", "text", lineTokens = 16, minDocs = 4)
    val d = tmpDir("boiler-idx")
    built.save(d)
    val loaded = TextAnalysis.loadBoilerplateLines(spark, d)
    assert(loaded.lineTokens === 16)
    def run(f: TextAnalysis.BoilerplateLines) = TextAnalysis
      .scrubBoilerplateAgainst(df(rows), "doc_id", "text", f)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(run(built) === run(loaded))
  }

  test("minDocs < 2 is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.boilerplateLineTable(
        df(Seq((0L, "a b"))), "doc_id", "text", lineTokens = 16, minDocs = 1)
    }
    assert(e.getMessage.contains("minDocs"))
  }

  test("plan ledger: shuffles key only on the line hash / doc id") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.scrubBoilerplate(docs, "doc_id", "text",
      lineTokens = 16, minDocs = 4)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    val keyed = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    // _groupingexpression is the md5(line) grouping key before aliasing.
    assert(keyed.subsetOf(Set("h", "doc_id", "_groupingexpression")),
      s"unexpected shuffle keys $keyed:\n$plan")
  }
}
