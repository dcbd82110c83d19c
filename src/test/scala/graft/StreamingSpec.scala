package graft

import org.apache.spark.sql.functions._

import graft.sources.Sources
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Stage the events table as a file-stream source directory. */
  private lazy val streamDir: String = {
    val d = tmpDir("events-stream")
    Sources.table(spark, dir, "events").write.mode("overwrite").parquet(d)
    d
  }

  test("windowed streaming agg over a file source matches the batch plan") {
    val stream = EventStreams.windowedCounts(
      EventStreams.readEventStream(spark, streamDir))
    val qname = "windowed_out"
    val q = stream.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName(qname).start()
    try assert(q.awaitTermination(120000), "stream did not drain in 120s")
    finally q.stop()
    // Append mode only emits windows the watermark has closed; with a
    // finite file source the final window stays open, so compare as subset.
    val got = spark.table(qname)
      .select($"bucket_start", $"event_type", $"n", $"total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val want = EventStreams.windowedCounts(
      spark.read.schema(EventStreams.eventSchema).parquet(streamDir))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got.nonEmpty, "stream should emit closed windows")
    assert(got.subsetOf(want), s"stream emitted rows batch lacks: ${got -- want}")
  }

  test("streaming dedup keeps one row per key and matches batch dropDuplicates") {
    // Duplicate the staged events (same content, so every key appears at
    // least twice) and dedupe the combined stream on a content key.
    val d = tmpDir("events-dup-stream")
    val ev = Sources.table(spark, dir, "events")
    ev.write.mode("overwrite").parquet(d)
    ev.write.mode("append").parquet(d)
    val keys = Seq("user_id", "event_type", "value")
    val stream = EventStreams.dedupeStream(
      EventStreams.readEventStream(spark, d), keys, "1 hour")
    val q = stream.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("dedup_out").start()
    try assert(q.awaitTermination(120000), "stream did not drain in 120s")
    finally q.stop()
    val got = spark.table("dedup_out")
    val nKeys = ev.select(keys.map(col): _*).distinct().count()
    assert(got.count() >= nKeys,
      "every distinct key must survive (dups beyond the watermark may too)")
    // The doubled copy is byte-identical, so its duplicates arrive at the
    // same event time and MUST all be dropped: output keys are unique.
    assert(got.groupBy(keys.map(col): _*).count().filter($"count" > 1).isEmpty,
      "no key may appear twice after within-watermark dedup")
  }

  test("stream-stream interval join matches the batch range join") {
    val schema = EventStreams.eventSchema
    def side(tpe: String, idAs: String, valAs: String) =
      EventStreams.readEventStream(spark, streamDir)
        .filter($"event_type" === tpe)
        .select($"user_id", $"ts", $"event_id".as(idAs), $"value".as(valAs))
    // Generous watermark: with a finite source nothing is late, so the
    // stream must emit EXACTLY the batch join's pairs.
    val joined = EventStreams.intervalJoinStream(
      side("purchase", "p_id", "p_value"), side("view", "v_id", "v_value"),
      "user_id", windowSec = 3600L, watermarkDelay = "365 days")
    val q = joined.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("ssj_out").start()
    try assert(q.awaitTermination(120000), "stream did not drain in 120s")
    finally q.stop()
    val got = spark.table("ssj_out").select($"p_id", $"v_id")
      .as[(Long, Long)].collect().toSet
    val ev = spark.read.schema(schema).parquet(streamDir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"), $"event_id".as("p_id"))
    val v = ev.filter($"event_type" === "view")
      .select($"user_id".as("vu"), $"ts".as("vts"), $"event_id".as("v_id"))
    val want = p.join(v, $"pu" === $"vu" &&
        $"vts" >= $"pts" - expr("INTERVAL 3600 SECOND") && $"vts" <= $"pts")
      .select($"p_id", $"v_id").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "batch truth should have matches")
    assert(got == want, s"missing: ${want -- got}; extra: ${got -- want}")
  }

  test("stateful sessionization (flatMapGroupsWithState) runs and matches batch on closed sessions") {
    val events = Sources.table(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    // Batch twin gives ground truth for every session.
    val batch = EventStreams.sessionizeBatch(
      Sources.table(spark, dir, "events"), gapMinutes = 30)
    val batchSessions = batch
      .select($"user_id", $"session_start", $"n_events").collect()
    assert(batchSessions.nonEmpty)

    // Streaming: single microbatch closes sessions only on gap rollover
    // (timeout can't fire in processAllAvailable), so closed sessions must
    // be a subset of batch sessions.
    val memStream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark, 1)
    memStream.addData(events.collect().toSeq)
    // NoTimeout: sessions close on gap rollover only, so AvailableNow can
    // drain (processing-time timers would keep the query waiting).
    val q = EventStreams.sessionize(memStream.toDS(), gapMinutes = 30,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("sessions_out").start()
    try assert(q.awaitTermination(120000), "stream did not drain in 120s")
    finally q.stop()
    val streamed = spark.table("sessions_out")
      .select($"user_id", $"session_start", $"n_events").collect()
    val batchSet = batchSessions.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val streamSet = streamed.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamSet.subsetOf(batchSet),
      s"streamed sessions not in batch truth: ${streamSet -- batchSet}")
  }

  test("streaming budget admission enforces the quota across microbatches") {
    import EventStreams.{Admitted, BudgetDoc}
    val memStream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[BudgetDoc](
      spark, 2)
    // Batch 1: group a consumes 8 of its 10-token budget; group b 4.
    memStream.addData(Seq(
      BudgetDoc(1, "a", 5), BudgetDoc(2, "a", 3), BudgetDoc(3, "b", 4)))
    val q = EventStreams.budgetAdmitStream(memStream.toDS(), budget = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("budget_out").start()
    try {
      q.processAllAvailable()
      // Batch 2: a has 2 tokens left -> doc 4 straddles (admitted), doc 5
      // is over budget (dropped); b admits doc 6 then is exhausted.
      memStream.addData(Seq(
        BudgetDoc(4, "a", 6), BudgetDoc(5, "a", 1),
        BudgetDoc(6, "b", 7), BudgetDoc(7, "b", 1)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("budget_out").as[Admitted]
      .collect().map(a => (a.doc_id, a.cum_before)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 0L, 4L -> 8L, 6L -> 4L),
      s"unexpected admissions: $got")
  }

  test("event-time sessionization closes sessions as the watermark advances") {
    import java.sql.Timestamp
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    def ev(id: Long, minute: Long) =
      EventStreams.Event(id, ts(minute), user_id = 1L, "click", 1.0)

    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.Event](spark, 1)
    val q = EventStreams.sessionizeEventTime(
      memStream.toDS(), gapMinutes = 30, watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("et_sessions").start()
    try {
      // Session A: two events 10m apart; session B: one event 2h later.
      memStream.addData(ev(1, 0), ev(2, 10), ev(3, 120))
      q.processAllAvailable()
      // Sentinel events push the watermark far past B's gap window; the
      // extra batch lets the timer fire against the advanced watermark.
      memStream.addData(ev(4, 600))
      q.processAllAvailable()
      memStream.addData(ev(5, 610))
      q.processAllAvailable()
      val sessions = spark.table("et_sessions")
        .select($"session_start", $"n_events").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      assert(sessions.contains((ts(0), 2L)), s"session A missing: $sessions")
      assert(sessions.contains((ts(120), 1L)), s"session B missing: $sessions")
    } finally q.stop()
  }

  test("event-time sessionization: a gap exactly AT the cutoff straddling a microbatch split") {
    // The batch twin is microsecond-exact at the boundary (Round4Spec);
    // the stream must agree even when the boundary-straddling event lands
    // in a LATER microbatch: gap == cutoff continues the session, gap ==
    // cutoff + 1µs starts a new one. Millisecond state arithmetic (or
    // per-batch state resets) would merge or split both the same way.
    import java.sql.Timestamp
    val baseUs = 1700000000000000L
    def tsu(offsetUs: Long): Timestamp = {
      val us = baseUs + offsetUs
      val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val gapUs = 60L * 1000000L // gapMinutes = 1
    def ev(id: Long, user: Long, offsetUs: Long) =
      EventStreams.Event(id, tsu(offsetUs), user, "click", 1.0)

    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.Event](spark, 1)
    val q = EventStreams.sessionizeEventTime(
      memStream.toDS(), gapMinutes = 1, watermarkDelay = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("et_boundary").start()
    try {
      // Microbatch 1: both users' openers.
      memStream.addData(ev(1, 1L, 0), ev(2, 2L, 0))
      q.processAllAvailable()
      // Microbatch 2: user 1's follow-up EXACTLY at the cutoff (same
      // session); user 2's at cutoff + 1µs (new session).
      memStream.addData(ev(3, 1L, gapUs), ev(4, 2L, gapUs + 1))
      q.processAllAvailable()
      // Sentinels march the watermark past every gap window so the
      // event-time timers fire and all sessions close.
      memStream.addData(ev(5, 3L, 3600L * 1000000L))
      q.processAllAvailable()
      memStream.addData(ev(6, 3L, 7200L * 1000000L))
      q.processAllAvailable()
      val sessions = spark.table("et_boundary")
        .select($"user_id", $"session_start", $"n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(sessions.contains((1L, tsu(0), 2L)),
        s"user 1's boundary event must CONTINUE the session: $sessions")
      assert(sessions.contains((2L, tsu(0), 1L)) &&
             sessions.contains((2L, tsu(gapUs + 1), 1L)),
        s"user 2's +1µs event must START a new session: $sessions")
    } finally q.stop()
  }

  test("streaming delta dedup probes the static corpus index, matches the batch probe") {
    import java.sql.Timestamp
    import graft.operators.Dedup
    import graft.functions.WordShingles
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    def shingled(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"ts", WordShingles.wordShingles($"text", 3).as("sh"))
        .filter(size($"sh") > 0)

    // Offline: the corpus index (built once, loaded by the ingest job).
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
      .select($"doc_id", WordShingles.wordShingles($"text", 3).as("sh"))
    val idx = Dedup.buildMinHashIndex(corpus, "doc_id", "sh")

    // Online: documents arrive across microbatches; 101 is a corpus twin,
    // 102 unrelated, 103 a twin of corpus doc 2; 101 arrives AGAIN in the
    // second batch (a replayed ingest) and must not re-emit its pair.
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val streamed = shingled(memStream.toDS().toDF("doc_id", "ts", "text"))
    val q = EventStreams.deltaDedupStream(streamed, "doc_id", "sh", "ts",
        idx, threshold = 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("delta_dedup_out").start()
    try {
      memStream.addData((101L, ts(0), "a b c d e f g h i j"),
                        (102L, ts(1), "totally different words here now"))
      q.processAllAvailable()
      memStream.addData((103L, ts(2), "one two three four five six seven eight"),
                        (101L, ts(3), "a b c d e f g h i j")) // replay
      q.processAllAvailable()
      val got = spark.table("delta_dedup_out")
        .select($"new_id", $"old_id", $"est_jaccard")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got.size == got.toSet.size, s"replayed doc re-emitted a pair: $got")
      val want = Dedup.deltaNearDupsIndexed(
        shingled(Seq((101L, ts(0), "a b c d e f g h i j"),
                     (102L, ts(1), "totally different words here now"),
                     (103L, ts(2), "one two three four five six seven eight"))
          .toDF("doc_id", "ts", "text")),
        idx, "doc_id", "sh", threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(got.toSet == want, s"stream $got vs batch $want")
      assert(want == Set((101L, 1L, 1.0), (103L, 2L, 1.0)))
    } finally q.stop()
    idx.unpersist()
  }

  test("streaming ExactSubstr probes the static gram index, matches the batch probe") {
    import java.sql.Timestamp
    import graft.operators.Dedup
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)

    // Offline: the capped gram index (built once, loaded by the ingest job).
    val corpus = Seq(
      (1L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"d$i").mkString(" "))).toDF("doc_id", "text")
    val idx = Dedup.buildGramIndex(corpus, "doc_id", "text",
      k = 10, maxGramDocs = 256)

    // Online: 101 verbatim-quotes doc 1's run, 102 is unrelated, 103
    // quotes doc 2; 101 arrives AGAIN in the second microbatch (replayed
    // ingest) and must not re-flag.
    val quote1 = s"intro ${(1 to 10).map(i => s"c$i").mkString(" ")} outro"
    val other = (1 to 12).map(i => s"z$i").mkString(" ")
    val quote2 = (1 to 10).map(i => s"d$i").mkString(" ")
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.exactSubstrStream(
        memStream.toDS().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts", idx)
      .writeStream.outputMode("append").format("memory")
      .queryName("exact_substr_out").start()
    try {
      memStream.addData((101L, ts(0), quote1), (102L, ts(1), other))
      q.processAllAvailable()
      memStream.addData((103L, ts(2), quote2), (101L, ts(3), quote1)) // replay
      q.processAllAvailable()
      val got = spark.table("exact_substr_out")
        .select($"new_id", $"old_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"replayed doc re-flagged: $got")
      val want = Dedup.deltaExactSubstrPairs(
        Seq((101L, quote1), (102L, other), (103L, quote2)).toDF("doc_id", "text"),
        idx, "text")
        .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
      assert(got.toSet == want, s"stream $got vs batch $want")
      assert(want == Set((101L, 1L), (103L, 2L)))
    } finally q.stop()
    idx.unpersist()
  }

  test("batch sessionization is internally consistent") {
    val events = Sources.table(spark, dir, "events")
    val sessions = EventStreams.sessionizeBatch(events, gapMinutes = 30)
    val nEvents = events.count()
    val summed = sessions.agg(sum($"n_events")).as[Long].head()
    assert(summed == nEvents, "every event belongs to exactly one session")
    assert(sessions.filter($"session_end" < $"session_start").isEmpty)
  }

  test("stateless pipeline ops run unchanged on a stream: quality filter equality") {
    import graft.operators.{TextAnalysis => TA}
    val docsDf = Sources.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val batch = TA.qualityFilter(docsDf, "doc_id", "text")
      .as[(Long, Long, String, Boolean)].collect().toSet
    assert(batch.nonEmpty)

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark, 1)
    mem.addData(docsDf.as[(Long, String)].collect().toSeq)
    val q = TA.qualityFilter(mem.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("qf_out").start()
    try assert(q.awaitTermination(120000), "stream did not drain in 120s")
    finally q.stop()
    val streamed = spark.table("qf_out")
      .as[(Long, Long, String, Boolean)].collect().toSet
    assert(streamed == batch,
      "per-row quality filter must be identical on stream and batch")
  }

  test("streaming seed scoring matches batch t15; replays score exactly-once") {
    import java.sql.Timestamp
    import graft.operators.{TextAnalysis => TA}
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // Offline: the curated seed's shingle table (built once, broadcast).
    val seedDocs = Seq((1L, "the quick brown fox jumps")).toDF("sid", "text")
    val seedGrams = TA.seedGramTable(seedDocs, "text")
    val arriving = Seq(
      (301L, ts(0), "the quick brown fox sleeps"),       // 2 of 3 shingles
      (302L, ts(1), "entirely different tokens here"),   // 0 of 2
      (303L, ts(2), "too short"))                        // no shingles: absent
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.seedScoreStream(
        memStream.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", seedGrams,
        watermarkDelay = "1 minute", windowDuration = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("seed_out").start()
    try {
      memStream.addData(arriving: _*)
      q.processAllAvailable()
      // REPLAY doc 301 in a later batch, then advance the watermark far
      // past its window so the aggregate emits.
      memStream.addData((301L, ts(0), "the quick brown fox sleeps"))
      q.processAllAvailable()
      memStream.addData((999L, ts(120), "late watermark advancer doc"))
      q.processAllAvailable()
      val got = spark.table("seed_out")
        .select($"doc_id", $"n_grams", $"n_seed_grams", $"overlap_bp")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got.size == got.map(_._1).toSet.size,
        s"a replayed doc must score once, not twice: $got")
      val batch = TA.seedOverlapAgainst(
          arriving.map { case (id, _, text) => (id, text) }.toDF("doc_id", "text"),
          "doc_id", "text", seedGrams)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.filter(_._1 != 999L).toSet == batch,
        s"stream ${got.toSet} vs batch $batch")
      // The replay must not have double-counted grams into the window agg.
      assert(got.find(_._1 == 301L).get === ((301L, 3L, 2L, 6666L)))
    } finally q.stop()
  }

  test("streaming ExactSubstr apply cuts in-flight, matches the batch delta apply") {
    import java.sql.Timestamp
    import graft.operators.Dedup
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    val corpus = Seq(
      (1L, (1 to 14).map(i => s"c$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"d$i").mkString(" "))).toDF("doc_id", "text")
    val idx = Dedup.buildGramIndex(corpus, "doc_id", "text",
      k = 10, maxGramDocs = 256)
    val quote = (3 to 12).map(i => s"c$i").mkString(" ")
    val arriving = Seq(
      (201L, ts(0), s"intro $quote outro extra tokens here"),
      (202L, ts(1), (1 to 12).map(i => s"z$i").mkString(" ")), // clean
      (203L, ts(2), "too short"))                              // sub-k
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.exactSubstrApplyStream(
        memStream.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", idx,
        watermarkDelay = "1 minute", windowDuration = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("substr_apply_out").start()
    try {
      memStream.addData(arriving: _*)
      q.processAllAvailable()
      // REPLAY doc 201, then advance the watermark so windows emit.
      memStream.addData((201L, ts(0), s"intro $quote outro extra tokens here"))
      q.processAllAvailable()
      memStream.addData((999L, ts(120), (1 to 11).map(i => s"w$i").mkString(" ")))
      q.processAllAvailable()
      val got = spark.table("substr_apply_out")
        .select($"doc_id", $"n_tokens", $"n_cut_tokens", $"clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got.size == got.map(_._1).toSet.size,
        s"a replayed doc must land once, not twice: $got")
      val batch = Dedup.deltaExactSubstrApply(
          arriving.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"),
          idx, "text")
        .select($"doc_id", $"n_tokens", $"n_cut_tokens", $"clean_text")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got.filter(_._1 != 999L).toSet == batch,
        s"stream ${got.toSet} vs batch $batch")
      assert(got.find(_._1 == 201L).get ===
        ((201L, 15L, 10L, "intro outro extra tokens here")))
    } finally q.stop()
    idx.unpersist()
  }

  test("streaming embedding dedup probes the static vector index, matches the batch probe") {
    import java.sql.Timestamp
    import graft.operators.Dedup
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // Offline: the corpus vector index (8-dim synthetic, explicit density).
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.5, 0.5)))
      .toDF("vec_id", "v")
    val idx = Dedup.buildLshVecIndex(corpus, "vec_id", "v",
      bits = 8, tables = 12)
    // Online: 101 is a near-dup of 1, 102 is unrelated to everything,
    // 103 nears 2; 101 is REPLAYED in the second microbatch.
    val near1 = Seq(0.99, 0.02, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0)
    val lone = Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, -1.0)
    val near2 = Seq(0.01, 0.98, 0.0, 0.0, 0.0, 0.51, 0.0, 0.0)
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Seq[Double])](spark, 1)
    val q = EventStreams.embeddingDedupStream(
        memStream.toDS().toDF("vec_id", "ts", "v"),
        "vec_id", "v", "ts", idx, threshold = 0.9)
      .writeStream.outputMode("append").format("memory")
      .queryName("vecdedup_out").start()
    try {
      memStream.addData((101L, ts(0), near1), (102L, ts(1), lone))
      q.processAllAvailable()
      memStream.addData((103L, ts(2), near2), (101L, ts(3), near1)) // replay
      q.processAllAvailable()
      val got = spark.table("vecdedup_out")
        .select($"new_id", $"old_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"replayed vector re-flagged: $got")
      val want = Dedup.deltaEmbeddingNearDups(
          Seq((101L, near1), (102L, lone), (103L, near2)).toDF("vec_id", "v"),
          idx, threshold = 0.9)
        .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
      assert(got.toSet == want, s"stream $got vs batch $want")
      assert(want == Set((101L, 1L), (103L, 2L)))
    } finally q.stop()
    idx.unpersist()
  }

  test("streaming target-mixture admission matches batch p15; replays admit exactly-once") {
    import java.sql.Timestamp
    import graft.operators.Sampling
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)

    // Offline: the census + solve. en has 4x fr's tokens but 1/4 its
    // weight, so fr binds (admits everything) and en downsamples hard.
    val census = ((1L to 40L).map(id => (id, "en", 10L)) ++
      (101L to 120L).map(id => (id, "fr", 10L)))
      .toDF("doc_id", "lang", "n_tokens")
    val targets = Seq(("en", 2000L), ("fr", 8000L)).toDF("lang", "weight_bp")
    val rates = Sampling.targetMixtureRates(
      census, "lang", "n_tokens", targets)

    // Online: the same docs arrive as a stream (plus one from a group the
    // targets omit — weight 0, must drop); doc 101 is REPLAYED in the
    // second microbatch and must not re-admit.
    val arriving = ((1L to 40L).map(id => (id, ts(id), "en")) ++
      (101L to 120L).map(id => (id, ts(id), "fr")) :+
      ((900L, ts(50L), "de"))).toSeq
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.targetMixtureStream(
        memStream.toDS().toDF("doc_id", "ts", "lang"),
        "lang", "doc_id", "ts", rates)
      .writeStream.outputMode("append").format("memory")
      .queryName("mix_out").start()
    try {
      memStream.addData(arriving.take(30): _*)
      q.processAllAvailable()
      memStream.addData(arriving.drop(30) :+ ((101L, ts(101L), "fr")): _*)
      q.processAllAvailable()
      val got = spark.table("mix_out")
        .select($"doc_id").as[Long].collect().toSeq
      assert(got.size == got.toSet.size, s"replayed doc re-admitted: $got")
      // Batch twin over the same census with the same stated targets.
      val batch = Sampling.targetMixture(
          census, "lang", "doc_id", "n_tokens", targets)
        .select($"doc_id").as[Long].collect().toSet
      assert(got.toSet == batch, s"stream ${got.toSet} vs batch $batch")
      // fr binds: all 20 fr docs admitted; en admits a strict subset.
      assert((101L to 120L).toSet.subsetOf(batch))
      assert(batch.count(_ <= 40L) < 40)
      assert(!batch.contains(900L), "untargeted group must drop")
    } finally q.stop()
  }

  test("streaming decontamination matches batch p11 and suppresses replays") {
    import java.sql.Timestamp
    import graft.operators.Sampling
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)

    // Offline: the curated eval suite's gram table (built once, broadcast).
    val passage = (1 to 13).map(i => s"ev$i").mkString(" ")
    val evalDocs = Seq(
      (100L, passage),
      (101L, s"$passage plus trailing context words")).toDF("doc_id", "text")
    val evalGrams = Sampling.evalGramTable(evalDocs, "doc_id", "text", n = 13)

    // Online: 201 quotes the eval passage inside unrelated text, 202 is
    // clean, 203 shares only a 12-token prefix (not contamination), and
    // 201 is REPLAYED in the second batch — must not re-flag.
    val quoting =
      s"${(1 to 20).map(i => s"tr$i").mkString(" ")} $passage tr_tail"
    val clean = (1 to 40).map(i => s"other$i").mkString(" ")
    val nearMiss =
      s"${(1 to 20).map(i => s"pre$i").mkString(" ")} ${(1 to 12).map(i => s"ev$i").mkString(" ")}"
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.decontaminateStream(
        memStream.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", evalGrams, n = 13)
      .writeStream.outputMode("append").format("memory")
      .queryName("decon_out").start()
    try {
      memStream.addData((201L, ts(0), quoting), (202L, ts(1), clean))
      q.processAllAvailable()
      memStream.addData((203L, ts(2), nearMiss), (201L, ts(3), quoting))
      q.processAllAvailable()
      val got = spark.table("decon_out")
        .select($"new_id", $"eval_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"replayed doc re-flagged: $got")
      // Batch twin over the union: same flagged docs, and the stream's
      // min eval id per doc equals the batch's first_eval_id.
      val batch = Sampling.ngramContamination(
          Seq((201L, quoting, "train"), (202L, clean, "train"),
              (203L, nearMiss, "train"),
              (100L, passage, "test"),
              (101L, s"$passage plus trailing context words", "valid"))
            .toDF("doc_id", "text", "split"),
          "doc_id", "text", "split", n = 13)
        .select($"train_id", $"first_eval_id").as[(Long, Long)].collect().toMap
      val streamMin = got.groupBy(_._1).map { case (id, ps) => (id, ps.map(_._2).min) }
      assert(streamMin == batch, s"stream $streamMin vs batch $batch")
      assert(batch.keySet == Set(201L))
      // The quoting doc leaked from BOTH eval docs (the passage is in each).
      assert(got.toSet == Set((201L, 100L), (201L, 101L)))
    } finally q.stop()
  }

  test("streaming boilerplate scrub probes the static flagged-line table, matches the batch apply") {
    import java.sql.Timestamp
    import graft.operators.TextAnalysis
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    val banner =
      "b01 b02 b03 b04 b05 b06 b07 b08 b09 b10 b11 b12 b13 b14 b15 b16"
    // Offline: the standing flagged-line artifact from a corpus where the
    // banner reaches the document-frequency threshold.
    val corpus = (0L until 4L).map(i =>
      (i, s"$banner " + (0 until 20).map(j => s"c${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.boilerplateLineTable(
      corpus, "doc_id", "text", lineTokens = 16, minDocs = 4)
    // Online: 201 carries the banner mid-doc, 202 is clean, 203 is ALL
    // banner; 201 is replayed in the second microbatch.
    val head16 = (1 to 16).map(i => s"h$i").mkString(" ")
    val arriving = Seq(
      (201L, ts(0), s"$head16 $banner tail_a tail_b"),
      (202L, ts(1), (1 to 20).map(i => s"z$i").mkString(" ")),
      (203L, ts(2), banner))
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.boilerplateScrubStream(
        memStream.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", flagged,
        watermarkDelay = "1 minute",
        windowDuration = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("boiler_out").start()
    try {
      memStream.addData(arriving: _*)
      q.processAllAvailable()
      // REPLAY doc 201, then advance the watermark so windows emit.
      memStream.addData((201L, ts(0), s"$head16 $banner tail_a tail_b"))
      q.processAllAvailable()
      memStream.addData((999L, ts(120), (1 to 5).map(i => s"w$i").mkString(" ")))
      q.processAllAvailable()
      val got = spark.table("boiler_out")
        .select($"doc_id", $"n_lines", $"n_cut_lines", $"clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got.size == got.map(_._1).toSet.size,
        s"a replayed doc must land once, not twice: $got")
      val batch = TextAnalysis.scrubBoilerplateAgainst(
          arriving.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"),
          "doc_id", "text", flagged)
        .select($"doc_id", $"n_lines", $"n_cut_lines", $"clean_text")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got.filter(_._1 != 999L).toSet == batch,
        s"stream ${got.toSet} vs batch $batch")
      assert(got.find(_._1 == 201L).get ===
        ((201L, 3L, 1L, s"$head16 tail_a tail_b")))
      assert(got.find(_._1 == 203L).get === ((203L, 1L, 1L, "")))
    } finally q.stop()
  }

  test("streaming DSIR scoring probes the static model table, matches the batch apply") {
    import java.sql.Timestamp
    import graft.operators.Sampling
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // Offline: the dense model artifact fit on a seed + raw corpus.
    val corpus = (
      (0L until 4L).map(i => (i, "alpha beta gamma delta epsilon", "seed")) ++
      (10L until 14L).map(i => (i, "omega psi chi phi upsilon", "raw")))
      .toDF("doc_id", "text", "source")
    val model = Sampling.dsirModelTable(corpus, "text",
      col("source") === "seed", buckets = 256)
    // Online: 201 looks like the seed (incl. a REPEATED gram — the
    // positional dedup must keep both occurrences), 202 looks raw;
    // 201 is replayed in the second microbatch.
    val arriving = Seq(
      (201L, ts(0), "alpha beta alpha beta"),
      (202L, ts(1), "omega psi chi"))
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.dsirScoreStream(
        memStream.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", model)
      .writeStream.outputMode("append").format("memory")
      .queryName("dsir_out").start()
    try {
      memStream.addData(arriving: _*)
      q.processAllAvailable()
      memStream.addData((201L, ts(0), "alpha beta alpha beta"))
      q.processAllAvailable()
      memStream.addData((999L, ts(120), "w1 w2"))
      q.processAllAvailable()
      val got = spark.table("dsir_out")
        .select($"doc_id", $"n_grams", $"sum_w_bp", $"dsir_w")
        .as[(Long, Long, Long, Double)].collect().toSeq
      // Stateless gate: a replay RE-DERIVES the identical score (the
      // bloom-gate convention) instead of deduplicating through state.
      assert(got.count(_._1 == 201L) == 2, s"replay must re-score: $got")
      assert(got.filter(_._1 == 201L).toSet.size == 1,
        s"replayed scores must be identical: $got")
      val batch = Sampling.dsirScoreAgainst(
          arriving.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"),
          "doc_id", "text", model)
        .select($"doc_id", $"n_grams", $"sum_w_bp", $"dsir_w")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got.filter(_._1 != 999L).toSet == batch,
        s"stream ${got.toSet} vs batch $batch")
      // Multiset semantics survived the positional dedup: 4 unigrams +
      // 3 bigrams = 7 gram occurrences, repeats included.
      assert(got.find(_._1 == 201L).get._2 === 7L)
      val seedish = got.find(_._1 == 201L).get._4
      val rawish = got.find(_._1 == 202L).get._4
      assert(seedish > rawish, s"seed-like $seedish !> raw-like $rawish")
    } finally q.stop()
  }

  test("streaming quality scoring probes the static classifier, matches the batch apply") {
    import java.sql.Timestamp
    import graft.operators.TextAnalysis
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    val corpus = (
      (0L until 10L).map(i => (i, "alpha beta gamma delta epsilon", "seed")) ++
      (100L until 110L).map(i => (i, "omega psi chi phi upsilon", "raw")))
      .toDF("doc_id", "text", "source")
    val clf = TextAnalysis.trainQualityClassifier(corpus, "doc_id", "text",
      col("source") === "seed", buckets = 256)
    val arriving = Seq(
      (201L, ts(0), "alpha beta gamma"),   // seed-like
      (202L, ts(1), "omega psi chi"))      // raw-like
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.qualityScoreStream(
        memStream.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", clf)
      .writeStream.outputMode("append").format("memory")
      .queryName("qc_out").start()
    try {
      memStream.addData(arriving: _*)
      q.processAllAvailable()
      memStream.addData((201L, ts(0), "alpha beta gamma")) // replay
      q.processAllAvailable()
      memStream.addData((999L, ts(120), "w1 w2"))
      q.processAllAvailable()
      val got = spark.table("qc_out")
        .select($"doc_id", $"n_grams", $"quality")
        .as[(Long, Long, Double)].collect().toSeq
      // Stateless gate: the replay re-derives an identical score.
      assert(got.count(_._1 == 201L) == 2, s"replay must re-score: $got")
      assert(got.filter(_._1 == 201L).toSet.size == 1,
        s"replayed scores must be identical: $got")
      val batch = TextAnalysis.scoreQualityClassifier(
          arriving.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"),
          "doc_id", "text", clf)
        .select($"doc_id", $"n_grams", $"quality")
        .as[(Long, Long, Double)].collect().toSet
      assert(got.filter(_._1 != 999L).toSet == batch,
        s"stream ${got.toSet} vs batch $batch")
      assert(got.find(_._1 == 201L).get._3 > 0.5)
      assert(got.find(_._1 == 202L).get._3 < 0.5)
    } finally q.stop()
  }

  test("streaming IVF probe serves arriving queries against the static index, matches the batch probe") {
    import java.sql.Timestamp
    import graft.operators.SimilaritySearch
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    def vec(i: Int): Seq[Double] =
      Seq.tabulate(8)(d => if (d == i % 8) 1.0 else 0.1 * ((i + d) % 3))
    // Offline: the index over corpus + the (known) query vectors — the
    // batch probe can only rank queries the index carries, so equality
    // is checked on exactly those.
    val all = ((1 to 30).map(i => (i.toLong, vec(i))) ++
      Seq((901L, vec(3)), (902L, vec(7)))).toDF("vec_id", "v")
    val idx = SimilaritySearch.buildIvfIndex(all, "vec_id", "v", nCells = 4)
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Seq[Double])](spark, 1)
    val q = EventStreams.ivfProbeStream(
        memStream.toDS().toDF("vec_id", "ts", "v"),
        "vec_id", "v", "ts", idx, k = 3, nProbe = 2,
        watermarkDelay = "1 minute", windowDuration = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("ivf_serve_out").start()
    try {
      memStream.addData((901L, ts(0), vec(3)), (902L, ts(1), vec(7)))
      q.processAllAvailable()
      // REPLAY query 901, then advance the watermark so windows emit.
      memStream.addData((901L, ts(0), vec(3)))
      q.processAllAvailable()
      memStream.addData((999L, ts(120), vec(5)))
      q.processAllAvailable()
      val got = spark.table("ivf_serve_out")
        .select($"q_id", explode($"topk").as("t"))
        .select($"q_id", $"t.n_id", $"t.cos", $"t.rnk")
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(got.map(_._1).distinct.sorted ==
        got.filter(_._4 == 1).map(_._1).sorted,
        s"every served query has a rank-1 row: $got")
      assert(got.count(_._4 == 1) == got.map(_._1).distinct.size,
        s"a replayed query must be served once, not twice: $got")
      val batch = SimilaritySearch
        .probeIvf(idx, col("vec_id").isin(901L, 902L), k = 3, nProbe = 2)
        .select($"q_id", $"n_id", $"cos", $"rnk".cast("int"))
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got.filter(_._1 != 999L).toSet == batch,
        s"stream ${got.toSet} vs batch $batch")
    } finally q.stop()
    idx.unpersist()
  }

  test("streaming funnel advances across microbatches, matches batch funnelStages, replays re-emit nothing") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val W = 60000000L // 60s in micros
    // Batch 1: u1 view+click (stage 2 by end of batch), u2 view only.
    val b1 = Seq(
      EventStreams.FunnelEvent(1L, ts(0), 1L, "view"),
      EventStreams.FunnelEvent(1L, ts(10), 2L, "click"),
      EventStreams.FunnelEvent(2L, ts(0), 3L, "view"))
    // Batch 2: u1 completes INSIDE the window (state carried across the
    // batch boundary); u2's click lands outside its window.
    val b2 = Seq(
      EventStreams.FunnelEvent(1L, ts(59), 4L, "purchase"),
      EventStreams.FunnelEvent(2L, ts(61), 5L, "click"))
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.FunnelEvent](spark, 1)
    val q = EventStreams.funnelStream(memStream.toDS(),
        Seq("view", "click", "purchase"), W)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      memStream.addData(b1: _*)
      q.processAllAvailable()
      memStream.addData(b2: _*)
      q.processAllAvailable()
      // REPLAY batch 2 — monotone state means nothing may re-emit.
      memStream.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .select($"user_id", $"stage")
        .as[(Long, Int)].collect().toSeq.sorted
      assert(got === Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)),
        s"one row per stage advance, none from the replay: $got")
      // The max emitted stage per user equals the batch op's final stage.
      val all = (b1 ++ b2).map(e => (e.event_id, e.ts, e.user_id, e.event_type))
        .toDF("event_id", "ts", "user_id", "event_type")
      val batchStages = graft.operators.Sessionize
        .funnelStages(all, "user_id", "ts", "event_id", "event_type",
          Seq("view", "click", "purchase"), W)
        .as[(Long, Long)].collect().toMap
      val streamMax = got.groupBy(_._1).view.mapValues(_.map(_._2).max.toLong).toMap
      assert(streamMax === batchStages.filter(_._2 > 0),
        s"stream $streamMax vs batch $batchStages")
    } finally q.stop()
  }

  test("streaming paragraph clean probes the static line-set index, matches the batch corpus stage") {
    import java.sql.Timestamp
    import graft.operators.Dedup
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // Offline: the standing line-set artifact — EVERY corpus line cuts,
    // no frequency threshold (the d23-vs-t16 distinction).
    val corpusLine = (1 to 16).map(i => s"k$i").mkString(" ")
    val corpus = Seq((1L, s"$corpusLine " +
      (1 to 16).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val idx = Dedup.buildLineSetIndex(corpus, "doc_id", "text",
      lineTokens = 16, persist = false)
    // Online: 201 quotes the corpus line mid-doc, 202 is clean, 203 is
    // ALL corpus lines; 201 replays in the second microbatch. No
    // within-batch duplicates (the corpus-stage scoping this twin has).
    val head16 = (1 to 16).map(i => s"h$i").mkString(" ")
    val arriving = Seq(
      (201L, ts(0), s"$head16 $corpusLine tail_a tail_b"),
      (202L, ts(1), (1 to 20).map(i => s"z$i").mkString(" ")),
      (203L, ts(2), corpusLine))
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = EventStreams.paragraphCleanStream(
        memStream.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", idx,
        watermarkDelay = "1 minute",
        windowDuration = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("parclean_out").start()
    try {
      memStream.addData(arriving: _*)
      q.processAllAvailable()
      // REPLAY doc 201, then advance the watermark so windows emit.
      memStream.addData((201L, ts(0), s"$head16 $corpusLine tail_a tail_b"))
      q.processAllAvailable()
      memStream.addData((999L, ts(120), (1 to 5).map(i => s"w$i").mkString(" ")))
      q.processAllAvailable()
      val got = spark.table("parclean_out")
        .select($"doc_id", $"n_lines", $"n_cut_corpus_lines", $"clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got.size == got.map(_._1).toSet.size,
        s"a replayed doc must land once, not twice: $got")
      // Batch twin: ingestParagraphClean on a batch with no within-batch
      // dups — n_cut_batch_lines is all zeros and the corpus stage is
      // exactly what the stream computes.
      val batchOut = Dedup.ingestParagraphClean(
          arriving.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"),
          idx, "doc_id", "text")
      assert(batchOut.agg(sum($"n_cut_batch_lines")).head().getLong(0) === 0L,
        "fixture must have no within-batch duplicates")
      val batch = batchOut
        .select($"doc_id", $"n_lines", $"n_cut_corpus_lines", $"clean_text")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got.filter(_._1 != 999L).toSet == batch,
        s"stream ${got.toSet} vs batch $batch")
      assert(got.find(_._1 == 201L).get ===
        ((201L, 3L, 1L, s"$head16 tail_a tail_b")))
      assert(got.find(_._1 == 203L).get === ((203L, 1L, 1L, "")))
    } finally q.stop()
  }

  // ---- round 17: streaming ANN index APPEND (the ingest-lifecycle
  // symmetry: dedup indexes already ingest per microbatch; the vector
  // index only probed) ----

  // Round16Spec's planted construction: 4 well-separated clusters, each
  // batch vector a collinear twin of one base vector.
  private def r17BaseVec(i: Int): Seq[Float] = {
    val c = i % 4
    Seq.tabulate(8)(j =>
      if (j == 2 * c) 10f
      else if (j == 2 * c + 1) (i / 4).toFloat
      else 0f)
  }
  private def r17BaseDf = (0 until 40).map(i => (i.toLong, r17BaseVec(i)))
    .toDF("vec_id", "embedding")
  private def r17BatchRows(off: Long): Seq[(Long, Seq[Float])] =
    (0 until 10).map(i => (off + i, r17BaseVec(i).map(_ * 1.02f)))

  private def probeRows(idx: graft.operators.SimilaritySearch.IvfIndex,
                        lo: Long): Set[(Long, Long, Double, Long)] = {
    import graft.operators.SimilaritySearch
    SimilaritySearch.probeIvf(idx, col("vec_id") >= lo, k = 3,
        nProbe = idx.centroids.length)
      .select($"q_id", $"n_id", $"cos", $"rnk".cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet
  }

  test("streaming IVF append == batch append (probe equality), compaction in-flight") {
    import graft.operators.SimilaritySearch
    val base = r17BaseDf
    // an OWNED index (not memoized): the in-stream compaction at batch 2
    // unpersists its superseded lineage, which must never hit a shared one
    val ingest = new EventStreams.IvfIngest(
      SimilaritySearch.buildIvfIndex(base, "vec_id", "embedding", nCells = 4))
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark, 1)
    val q = EventStreams.ivfAppendStream(
        memStream.toDS().toDF("vec_id", "embedding"), ingest,
        compactEvery = 2)
      .option("checkpointLocation", tmpDir("ivf-append-ck")).start()
    try {
      memStream.addData(r17BatchRows(1000L))
      q.processAllAvailable()
      assert(ingest.index.appendsSinceCompaction === 1)
      memStream.addData(r17BatchRows(2000L))
      q.processAllAvailable()
      // window of 2: the second microbatch compacted — counter reset,
      // lineage flat, geometry retained (nCells defaulted to the index's own)
      assert(ingest.index.appendsSinceCompaction === 0)
      assert(ingest.index.centroids.length === 4)
      assert(ingest.index.assigned.count() === 60)
    } finally q.stop()
    // stream == batch: the full-coverage probe over the streamed index
    // equals the same probe over a one-shot batch build of base ∪ batches
    val batchIdx = SimilaritySearch.buildIvfIndex(
      base.unionByName(r17BatchRows(1000L).toDF("vec_id", "embedding"))
        .unionByName(r17BatchRows(2000L).toDF("vec_id", "embedding")),
      "vec_id", "embedding", nCells = 4, persist = false)
    assert(probeRows(ingest.index, 1000L) === probeRows(batchIdx, 1000L),
      "streamed append must answer exactly like the batch build")
  }

  test("IVF append replay guard: a re-delivered batchId is not re-applied") {
    import graft.operators.SimilaritySearch
    val ingest = new EventStreams.IvfIngest(
      SimilaritySearch.buildIvfIndex(r17BaseDf, "vec_id", "embedding",
        nCells = 4))
    val b = r17BatchRows(1000L).toDF("vec_id", "embedding")
    EventStreams.applyIvfBatch(ingest, b, 0L, nCells = 0, compactEvery = 100)
    assert(ingest.index.assigned.count() === 50)
    // foreachBatch replay: same batchId after a crash-before-commit
    EventStreams.applyIvfBatch(ingest, b, 0L, nCells = 0, compactEvery = 100)
    assert(ingest.batchesApplied === 1L, "replayed batchId must be skipped")
    assert(ingest.index.assigned.count() === 50,
      "a replayed microbatch must not duplicate assignment rows")
    EventStreams.applyIvfBatch(ingest,
      r17BatchRows(2000L).toDF("vec_id", "embedding"), 1L,
      nCells = 0, compactEvery = 100)
    assert(ingest.index.assigned.count() === 60)
  }

  test("streaming PQ append == batch append; compaction re-fits from the corpus thunk") {
    import graft.operators.SimilaritySearch
    val base = r17BaseDf
    val frozen = SimilaritySearch.buildPqIndex(base, "vec_id", "embedding",
      m = 4, k = 16, persist = false)
    val ingest = new EventStreams.PqIngest(frozen)
    val lake = base
      .unionByName(r17BatchRows(1000L).toDF("vec_id", "embedding"))
      .unionByName(r17BatchRows(2000L).toDF("vec_id", "embedding"))
    var corpusReads = 0
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark, 1)
    val q = EventStreams.pqAppendStream(
        memStream.toDS().toDF("vec_id", "embedding"), "embedding", ingest,
        corpus = () => { corpusReads += 1; lake }, compactEvery = 2)
      .option("checkpointLocation", tmpDir("pq-append-ck")).start()
    try {
      memStream.addData(r17BatchRows(1000L))
      q.processAllAvailable()
      assert(ingest.index.codebooks eq frozen.codebooks,
        "the first append must encode through the FROZEN codebooks")
      memStream.addData(r17BatchRows(2000L))
      q.processAllAvailable()
      assert(corpusReads === 1, "compaction resolves the corpus exactly once")
      assert(ingest.index.appendsSinceCompaction === 0)
      assert(ingest.index.codes.count() === 60)
    } finally q.stop()
    // drift reset made equality: post-compact the streamed index IS a
    // fresh build over the lake (deterministic k-means, same sample)
    val fresh = SimilaritySearch.buildPqIndex(lake, "vec_id", "embedding",
      m = 4, k = 16, persist = false)
    val got = ingest.index.codes.as[(Long, Seq[Int])].collect().toMap
    val want = fresh.codes.as[(Long, Seq[Int])].collect().toMap
    assert(got === want, "streamed compact != fresh batch build")
  }

  test("streaming audio probe flags re-encoded arrivals, matches batch, suppresses replays") {
    import java.sql.Timestamp
    import graft.multimodal.{Codecs, Multimodal}
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // standing corpus: three PCM16 WAVs
    val corpusDocs = Seq((1L, "alpha beta gamma delta"),
      (2L, "totally different words"), (3L, "third corpus body"))
      .toDF("doc_id", "text")
    val corpusFp = Multimodal.decodedAudioFingerprints(
      Multimodal.renderWavTable(corpusDocs)).localCheckpoint()
    // arrivals: a mu-law RE-ENCODE of doc 1 (must flag against 1), an
    // unrelated fresh signal (must not flag)
    def mulawOf(id: Long, text: String): Array[Byte] = {
      val pcm = Multimodal.textPcm(id, text)
      Codecs.encodeWavMulaw(pcm.samples.map(Codecs.mulawCompress),
        pcm.sampleRate, pcm.channels)
    }
    val dup = mulawOf(1L, "alpha beta gamma delta")
    val fresh = Codecs.encodeWav(Codecs.Pcm(8000, 1,
      Array.tabulate[Short](256)(i => ((i % 16) * 2000 - 15000).toShort)))
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Array[Byte])](spark, 1)
    val q = EventStreams.audioProbeStream(
        memStream.toDS().toDF("doc_id", "ts", "media"), "doc_id", "media",
        "ts", corpusFp)
      .writeStream.outputMode("append").format("memory")
      .queryName("audio_probe_out").start()
    try {
      memStream.addData((101L, ts(0), dup), (102L, ts(1), fresh))
      q.processAllAvailable()
      memStream.addData((101L, ts(2), dup)) // replayed arrival
      q.processAllAvailable()
      val got = spark.table("audio_probe_out")
        .select($"new_id", $"old_id", $"max_dev_bp")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"replay re-flagged a pair: $got")
      assert(got.map(p => (p._1, p._2)).toSet === Set((101L, 1L)),
        s"expected exactly the re-encode flagged against its source: $got")
      // and the stream's verdict equals the batch probe's
      val batch = Multimodal.audioFpProbe(
          Multimodal.decodedAudioFingerprints(
            Seq(Multimodal.MediaRow(101L, dup, "audio/wav;mulaw"),
              Multimodal.MediaRow(102L, fresh, "audio/wav")).toDS()),
          corpusFp, maxDevBp = 700L)
        .select($"new_id", $"old_id", $"max_dev_bp")
        .as[(Long, Long, Long)].collect().toSet
      assert(got.toSet === batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }

  test("streaming video probe flags re-uploaded arrivals, matches batch, suppresses replays") {
    import java.sql.Timestamp
    import graft.multimodal.{Codecs, Multimodal}
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // standing corpus: three AVIs (doc 1/3 DIB, doc 2 MJPEG by parity)
    val corpusDocs = Seq((1L, "alpha beta gamma delta"),
      (2L, "totally different words"), (3L, "third corpus body"))
      .toDF("doc_id", "text")
    val corpusFp = Multimodal.decodedVideoFingerprints(
      Multimodal.renderAviTable(corpusDocs)).localCheckpoint()
    // the kernel and the avi_meta-aggregate corpus paths must agree
    // string-for-string (m35 reads the memoized artifact; the stream
    // fingerprints scan-side)
    val viaMeta = Multimodal.aviMetaFingerprints(
      Multimodal.decodedAviFrameMeta(
        Multimodal.renderAviTable(corpusDocs), stride = 2).toDF())
    assert(corpusFp.collect().map(_.toSeq).toSet ===
      viaMeta.collect().map(_.toSeq).toSet,
      "videoFingerprintOf must equal the AviFrameMeta aggregate")
    // arrivals: a RE-UPLOAD of doc 1's video (identical render — must
    // flag against 1) and a fresh unrelated video (must not flag)
    val dup = Multimodal.renderAviTable(
        Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"))
      .collect().head.media
    val fresh = Codecs.encodeAvi((0 until 2).map(f =>
        Codecs.encodeJpeg(Multimodal.blockGrayImage("totally new content",
          shift = 3 * f + 1))), 64, 64, usPerFrame = 40000)
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Array[Byte])](spark, 1)
    val q = EventStreams.videoProbeStream(
        memStream.toDS().toDF("doc_id", "ts", "media"), "doc_id", "media",
        "ts", corpusFp)
      .writeStream.outputMode("append").format("memory")
      .queryName("video_probe_out").start()
    try {
      memStream.addData((101L, ts(0), dup), (102L, ts(1), fresh))
      q.processAllAvailable()
      memStream.addData((101L, ts(2), dup)) // replayed arrival
      q.processAllAvailable()
      val got = spark.table("video_probe_out")
        .select($"new_id", $"old_id", $"n_frames")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"replay re-flagged a pair: $got")
      assert(got.map(p => (p._1, p._2)).toSet === Set((101L, 1L)),
        s"expected exactly the re-upload flagged against its source: $got")
      // and the stream's verdict equals the batch probe's (m35's shape)
      val batch = Multimodal.videoFpProbe(
          Multimodal.decodedVideoFingerprints(
            Seq(Multimodal.MediaRow(101L, dup, "video/avi"),
              Multimodal.MediaRow(102L, fresh, "video/avi")).toDS()),
          corpusFp)
        .select($"new_id", $"old_id", $"n_frames")
        .as[(Long, Long, Long)].collect().toSet
      assert(got.toSet === batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }

  test("AdmissionPipeline on a stream: stateless stages compose, disposition matches batch") {
    import java.sql.Timestamp
    import graft.streaming.AdmissionPipeline
    import graft.streaming.AdmissionPipeline.Stage
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // a standing fingerprint artifact — the corpus-dup stage probes it
    // with a stream-STATIC join (the stream-safe verdict shape)
    val corpusFp = Seq("known corpus body").toDF("text")
      .select(graft.operators.TextAnalysis.fingerprint($"text").as("__cfp"))
      .withColumn("__hit", lit(1)).localCheckpoint()
    val stages = Seq(
      Stage.rowLocal("min_len", length(col("text")) >= 10,
        when(length(col("text")) >= 10, lit("")).otherwise(lit("too short"))),
      Stage("corpus_dup", df => df
        .withColumn("__fp",
          graft.operators.TextAnalysis.fingerprint(col("text")))
        .join(broadcast(corpusFp), col("__fp") === col("__cfp"), "left")
        .withColumn("admit", col("__hit").isNull)
        .withColumn("reason", when(col("__hit").isNull, lit(""))
          .otherwise(lit("exact duplicate already in corpus")))
        .drop("__fp", "__cfp", "__hit")))
    val rows = Seq(
      (1L, ts(0), "a genuinely novel arriving document"),
      (2L, ts(1), "short"),
      (3L, ts(2), "known corpus body"))
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)](spark, 1)
    val q = AdmissionPipeline.run(
        memStream.toDS().toDF("doc_id", "ts", "text"), stages)
      .writeStream.outputMode("append").format("memory")
      .queryName("adm_pipe_out").start()
    try {
      memStream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("adm_pipe_out")
        .select($"doc_id", $"admitted", $"stage", $"reason")
        .as[(Long, Boolean, String, String)].collect().toSet
      // composed-on-stream == the same composition on the batch frame
      val want = AdmissionPipeline.run(rows.toDF("doc_id", "ts", "text"), stages)
        .select($"doc_id", $"admitted", $"stage", $"reason")
        .as[(Long, Boolean, String, String)].collect().toSet
      assert(got === want, s"stream $got vs batch $want")
      assert(got === Set(
        (1L, true, "", ""),
        (2L, false, "min_len", "too short"),
        (3L, false, "corpus_dup", "exact duplicate already in corpus")))
    } finally q.stop()
  }

  test("streaming tolerant video probe flags LOSSY re-encodes the exact " +
    "probe misses, matches batch, suppresses replays") {
    import java.sql.Timestamp
    import graft.multimodal.{Codecs, Multimodal}
    def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)
    // doc 1's text carries a "ba" adjacency: v('b')=98 > v('a')=97 raw
    // (DIB), but MJPEG quantization rounds both to 98 — a REAL dHash
    // flip, so the plant is provably invisible to the exact fingerprint
    // while staying within the tolerant bound
    val corpusDocs = Seq((1L, "alpha beta gamma delta ba"),
      (2L, "totally different words"), (3L, "third corpus body"))
      .toDF("doc_id", "text")
    val corpusMeta = Multimodal.decodedAviFrameMeta(
        Multimodal.renderAviTable(corpusDocs), stride = 2).toDF()
      .select($"doc_id", $"n_frames", $"frame_idx", $"dhash")
      .localCheckpoint()
    // an MJPEG re-encode of doc 1's DIB frames: decoded pixels genuinely
    // move (JPEG quantization), so the EXACT fingerprint cannot pair it
    val imgs = (0 until 3).map(f =>
      Multimodal.blockGrayImage("alpha beta gamma delta ba", shift = 7 * f))
    val lossy = Codecs.encodeAvi(imgs.map(Codecs.encodeJpeg(_)), 64, 64,
      usPerFrame = 40000)
    val (nL, fpLossy) = Multimodal.videoFingerprintOf(lossy, 2)
    val exactFps = Multimodal.aviMetaFingerprints(corpusMeta)
      .select($"fp").as[String].collect().toSet
    assert(nL === 3L && !exactFps.contains(fpLossy),
      "the plant must be invisible to the exact sequence fingerprint")
    val fresh = Codecs.encodeAvi(Seq(Codecs.encodeJpeg(
      Multimodal.blockGrayImage("unrelated fresh content", shift = 5))),
      64, 64, usPerFrame = 40000)
    val memStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Array[Byte])](spark, 1)
    val q = EventStreams.videoBandProbeStream(
        memStream.toDS().toDF("doc_id", "ts", "media"), "doc_id", "media",
        "ts", corpusMeta)
      .writeStream.outputMode("append").format("memory")
      .queryName("video_band_probe_out").start()
    try {
      memStream.addData((100L, ts(0), lossy), (102L, ts(1), fresh))
      q.processAllAvailable()
      memStream.addData((100L, ts(2), lossy)) // replayed arrival
      q.processAllAvailable()
      val got = spark.table("video_band_probe_out")
        .select($"new_id", $"old_id", $"n_frames", $"max_frame_hamming")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"replay re-flagged a pair: $got")
      assert(got.map(p => (p._1, p._2)).toSet === Set((100L, 1L)),
        s"expected exactly the lossy re-encode flagged against its source: $got")
      assert(got.forall(p => p._4 > 0L && p._4 <= 4L),
        s"the pair must show REAL but bounded per-frame deviation: $got")
      // and the stream's verdict equals the m36 batch probe's (even ids
      // so the corpus-render parity rule lets the batch side decode)
      val deltaMeta = Multimodal.decodedAviFrameMeta(
          Seq(Multimodal.MediaRow(100L, lossy, "video/avi;mjpeg"),
            Multimodal.MediaRow(102L, fresh, "video/avi;mjpeg")).toDS(),
          stride = 2).toDF()
        .select($"doc_id", $"n_frames", $"frame_idx", $"dhash")
      val batch = Multimodal.videoBandProbe(deltaMeta, corpusMeta)
        .select($"new_id", $"old_id", $"n_frames", $"max_frame_hamming")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.toSet === batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }

  test("PQ append replay guard: a re-delivered batchId is not re-applied") {
    import graft.operators.SimilaritySearch
    val ingest = new EventStreams.PqIngest(
      SimilaritySearch.buildPqIndex(r17BaseDf, "vec_id", "embedding",
        m = 4, k = 16, persist = false))
    val b = r17BatchRows(1000L).toDF("vec_id", "embedding")
    def noCorpus(): org.apache.spark.sql.DataFrame =
      sys.error("replay test must never compact")
    EventStreams.applyPqBatch(ingest, b, 0L, "embedding",
      noCorpus _, compactEvery = 100)
    assert(ingest.index.codes.count() === 50)
    EventStreams.applyPqBatch(ingest, b, 0L, "embedding",
      noCorpus _, compactEvery = 100)
    assert(ingest.batchesApplied === 1L, "replayed batchId must be skipped")
    assert(ingest.index.codes.count() === 50,
      "a replayed microbatch must not duplicate code rows")
  }
}
