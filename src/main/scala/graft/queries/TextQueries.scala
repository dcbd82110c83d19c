package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Sampling, SimilaritySearch, TextAnalysis => TA}
import graft.queries.PipelineShared._

/** t-family query registry — text analysis: language-id, quality scoring, token counting, fingerprints, LM likelihood, classifiers, blocklists.
  * Split out of the monolithic PipelineQueries in round 11 (pure
  * re-grouping: every entry verbatim; shared machinery lives in
  * [[PipelineShared]], aggregation in [[PipelineQueries]]). */
private[queries] object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Seed-corpus overlap quality (classifier-free importance signal):
    // fraction of each doc's distinct 3-gram shingles present anywhere in
    // the designated seed source. Spread before the shingle projection —
    // the per-row shingle CPU must not serialize on a compact scan (the
    // d04 pattern).
    "t15_seed_overlap" -> ((s, dir) => {
      val base = Dedup.spreadToParallelism(docs(s, dir))
      TA.seedOverlapScore(base, "doc_id", "text", col("source") === "src0")
    }),


    // Boilerplate line removal (RefinedWeb/CCNet-style): cut every
    // "line" (16-token window, the d08 chunk convention) whose document
    // frequency reaches 4 from EVERY document — unlike d08/d16, the
    // first copy dies too, because a cookie banner's first copy is still
    // noise. Docs = 0 mod 5 get a 16-word banner planted at line 0 (the
    // oracle plants the identical banner), so the flagged set, the cuts,
    // and the untouched remainder are all driver-visible.
    "t16_boilerplate_scrub" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat_ws(" ", lit(BoilerplateBanner), col("text")))
          .otherwise(col("text")).as("text"))
      TA.scrubBoilerplate(d, "doc_id", "text", lineTokens = 16, minDocs = 4)
    }),


    // t19: CCNet's perplexity bucketing — per-language head/middle/tail
    // tertiles of t14's bigram-LM score (high score = probable = head).
    // Exact per-language percentile cuts (|langs| rows, broadcast back),
    // tertile fractions as exact 8-digit double literals on both engines.
    "t19_perplexity_buckets" -> ((s, dir) =>
      TA.perplexityBuckets(docs(s, dir), "doc_id", "text", "lang")),


    // t20: the C4 blocklist page filter — any doc containing a
    // blocklisted token is marked drop; occurrences counted as the
    // severity signal. The two-word list hits the synthetic vocabulary
    // so both outcomes are driver-visible; the oracle interpolates the
    // identical VALUES list.
    "t20_blocklist_filter" -> ((s, dir) => {
      import s.implicits._
      val bl = Seq("slow", "merge").toDF("word")
      TA.blocklistFilter(docs(s, dir), "doc_id", "text", bl)
    }),


    // t21: char-diversity (Gini–Simpson) repetitive-garbage filter. Docs
    // = 0 mod 9 are replaced by a two-symbol pad run ("aa " × 60 —
    // diversity 4445 bp) so BOTH flag outcomes are driver-visible against
    // the natural corpus (~9300 bp); the oracle plants the identical run.
    // Entirely row-local — see TextAnalysis.charDiversity.
    "t21_char_diversity" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(9)) === 0, expr("repeat('aa ', 60)"))
          .otherwise(col("text")).as("text"))
      TA.charDiversity(d, "doc_id", "text")
    }),


    // t22: the code-vs-prose router. Docs = 0 mod 7 are replaced by a
    // C-style token stream (sym_bp = 5600) so both routes are
    // driver-visible against the all-prose corpus (sym_bp = 0); the
    // oracle plants the identical stream. Row-local regex filters — no
    // explode, no shuffle.
    "t22_code_detect" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, lit(CodeTokenStream))
          .otherwise(col("text")).as("text"))
      TA.codeSignals(d, "doc_id", "text")
    }),


    // t23: PII detection + redaction (the release scrub). The synthetic
    // corpus is digit-free, so docs = 5 mod 11 get the planted payload
    // appended (one email, one phone, one IP — the d06/t21/t22 planted-
    // signal convention; the oracle plants identically) and every other
    // doc must read clean. Row-local: three regexp_count + the
    // redaction chain on the scan, no shuffle; only the redacted
    // text's md5 leaves the row (the release-audit shape).
    "t23_pii_scrub" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(11)) === 5,
          concat(col("text"), lit(PiiPayload)))
          .otherwise(col("text")).as("text"))
      TA.piiSignals(d, "doc_id", "text")
    }),


    // t24: encoding-anomaly (mojibake) detection — the fix-or-drop
    // routing decision an ingest pipeline makes before any text op
    // (ftfy's catalogue: UTF-8-as-Latin-1 digraphs, U+FFFD replacement
    // chars, raw control bytes). The ASCII corpus contains none of the
    // anomaly codepoints, so docs = 7 mod 13 get the planted accident
    // appended (the t23 convention; the oracle plants identically) and
    // every other doc must read clean. Row-local: three regexp_count +
    // one strip-chain md5 on the scan, zero shuffles.
    "t24_mojibake" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 7,
          concat(col("text"), lit(MojibakePayload)))
          .otherwise(col("text")).as("text"))
      TA.encodingSignals(d, "doc_id", "text")
    }),


    // t18: the corpus card — the dataset-documentation table published
    // with every corpus release (Datasheets/Dataset-Cards practice):
    // per (lang, source) stratum, doc and token counts, mean quality
    // (the shared t02 integer-bp score), exact median length, and the
    // stratum's integer-bp share of all tokens. Two hash aggregates +
    // one broadcast totals join; the exact percentile follows the q38
    // convention (per-group sort of a bounded stratum, never a corpus
    // window).
    "t18_corpus_card" -> ((s, dir) => {
      val q = qualityScored(docs(s, dir), extra = Seq("lang", "source"))
      val g = q.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(sum(col("quality_bp")).cast("double") /
            count(lit(1)).cast("double"), 4).as("avg_quality_bp"),
          round(expr("percentile(n_tokens, 0.5)"), 2).as("med_tokens"))
      // total via a bounded unpartitioned window over the |strata|-row
      // card (round 19): crossJoin(broadcast(g.agg)) carried the whole
      // quality-scored aggregate (exact percentile included) a second
      // time inside the total's subplan.
      g.withColumn("__tot", sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
        .withColumn("token_share_bp",
          expr("CAST(n_tokens * 10000 DIV __tot AS BIGINT)"))
        .drop("__tot")
    }),


    // t17: the GPT-3/PaLM-style seed-vs-raw quality classifier —
    // logistic regression on the SHARED p17 hashed-ngram feature
    // geometry, trained driver-local on the bounded corpus (zero-init
    // full-batch GD, fully deterministic, no RNG), scored through the
    // DSIR probe topology with the sigmoid applied after the per-doc
    // aggregate. Round-11 driver-visible form: the classifier trains on
    // the balanced planted-seed construction ([[memoizedQualityClf]])
    // and scores the WHOLE augmented corpus; each row claims the doc
    // lands on its class's side of the 0.5 decision boundary
    // (clf_side_ok), which the oracle pins at 1 over the recomputed
    // construction — the QualityClassifierSpec separability claim as a
    // hash gate (measured margins: seed min 0.628 vs raw max 0.403 at
    // every SF). QualityClassifierSpec still carries determinism /
    // save-load / plan-ledger ground truth.
    "t17_quality_classifier" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"), col("text"))
        .unionByName(t17PlantedSeeds(s, dir))
      graft.operators.TextAnalysis.scoreQualityClassifier(
          aug, "doc_id", "text", memoizedQualityClf(s, dir))
        .select(col("doc_id"),
          when(col("doc_id") >= 400000L, lit(1L)).otherwise(lit(0L)).as("is_seed"),
          when(col("doc_id") >= 400000L, col("quality") > 0.5)
            .otherwise(col("quality") < 0.5).cast("long").as("clf_side_ok"))
    }),



    // ---- text analysis ----------------------------------------------------
    "t01_token_stats" -> ((s, dir) => {
      val ws = TA.words(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        size(ws).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"),
        round(
          aggregate(transform(ws, w => length(w)), lit(0), (a, x) => a + x).cast("double") /
            size(ws).cast("double"), 4).as("avg_token_len"))
    }),


    "t02_quality_score" -> ((s, dir) => qualityScored(docs(s, dir))),


    "t03_langid" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), TA.words(col("text")).as("ws"))
      base.select(
        col("doc_id"),
        TA.stopwordCount(col("ws"), TA.StopEn).as("en"),
        TA.stopwordCount(col("ws"), TA.StopEs).as("es"),
        TA.stopwordCount(col("ws"), TA.StopFr).as("fr"),
        TA.stopwordCount(col("ws"), TA.StopDe).as("de"))
        .select(col("doc_id"),
          TA.langGuess(col("en"), col("es"), col("fr"), col("de")).as("lang_guess"))
    }),


    "t04_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TA.fingerprint(col("text")).as("fp"))),


    // BPE-ish tokenization: runs of letters, runs of digits, or single
    // punctuation — the pre-tokenizer shape real BPE vocabularies assume.
    // Whitespace is an explicit class, not \s: Java's \s includes \x0B,
    // RE2's (DuckDB) does not — the dialects would disagree on control
    // characters.
    "t05_bpe_tokens" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f]"), lit(0))).cast("long").as("n_bpe_tokens"))),


    // Winnowing fingerprint (Schleimer/Wilkerson/Aiken): the minimum
    // shingle of every sliding window of `w` consecutive positional
    // 3-gram shingles, deduplicated — the classic local fingerprint for
    // plagiarism/overlap detection. Selection here is by lexicographic
    // minimum so the oracle can compare values across engines; at scale
    // the selected shingles would be xxhash64'd to 8-byte fingerprints
    // (engine-specific hashes can't be oracle'd). Both stages are native
    // codegen'd expressions: shingles built POSITIONALLY (distinct=false —
    // winnowing windows must see repeats), window minima + distinct + sort
    // in one pass (the HOF formulation was 5.8s at sf0.1, the top cost in
    // the whole bench; native ~0.4s).
    "t09_winnow_fingerprint" -> ((s, dir) => {
      val w = 4
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.WordShingles
            .wordShingles(col("text"), 3, distinct = false).as("hs"))
        .filter(size(col("hs")) >= w)
        .select(col("doc_id"),
          graft.functions.WinnowShingles.winnowShingles(col("hs"), w).as("fp"))
        // The selected shingles are emitted '|'-joined, not as an array:
        // the driver's oracle compare sorts rows by every output column and
        // array cells are unsortable there (and unhashable in pandas) —
        // scalar columns are the contract for oracle-checked results.
        .select(col("doc_id"),
          array_join(col("fp"), "|").as("fingerprint"),
          size(col("fp")).cast("long").as("n_marks"))
    }),


    // Gopher-style repetition metrics (see TextAnalysis.repetitionMetrics).
    "t10_repetition" -> ((s, dir) =>
      TA.repetitionMetrics(docs(s, dir), "doc_id", "text")),


    // Out-of-vocabulary rate against the corpus top-k vocabulary (the
    // SHARED TA.vocabTopK definition t07 ranks, so the two can't drift) —
    // the tokenizer-coverage stat a vocab/BPE training step reports. k=10
    // here, NOT t07's 100: the synthetic corpus has only ~31 distinct
    // tokens, and a vocabulary that covers everything would make every
    // n_oov zero — the oracle would "verify" an OOV path that never runs.
    // The vocabulary is tiny and broadcast; the corpus explodes once and
    // aggregates back by doc with map-side partials. At a real vocab size
    // (32k-256k) the join is still a broadcast — vocabularies fit in
    // memory by construction.
    "t11_oov_rate" -> ((s, dir) => {
      val vocab = TA.vocabTopK(docs(s, dir), "text", 10)
        .select(col("token"), lit(1).as("in_vocab"))
      docs(s, dir).select(col("doc_id"), explode(TA.words(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, lit(1L)).otherwise(lit(0L))).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          expr("n_oov * 10000 DIV n_tokens").as("oov_bp"))
    }),


    // PII scrubbing: email + long-digit-run redaction. Both regexes avoid
    // Java-vs-RE2 divergent classes (no \s, no lookaround).
    "t06_pii_scrub" -> ((s, dir) => {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
      val num = "[0-9][0-9][0-9][0-9][0-9][0-9]+"
      docs(s, dir).select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"), num, "<NUM>")
          .as("scrubbed"),
        size(regexp_extract_all(col("text"), lit(email), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(num), lit(0))).cast("long").as("n_long_nums"))
    }),


    // Gopher/C4-style rule-based quality filter (see TA.qualityFilter —
    // per-row only, so the same function runs on streams).
    "t08_quality_filter" -> ((s, dir) =>
      TA.qualityFilter(docs(s, dir), "doc_id", "text")),


    // Corpus vocabulary: global top-100 tokens. orderBy+limit is Spark's
    // distributed TakeOrdered (per-partition top-k, then merge) — the
    // ranking window only ever sees the 100 survivors.
    "t07_vocab_topk" -> ((s, dir) => {
      // Global (empty-group) GroupTopK: distributed TakeOrdered that also
      // emits the rank — replaces the old unpartitioned row_number window
      // over the TakeOrdered survivors (and the WindowExec moving-all-data
      // warning that came with it). t11 shares TA.vocabTopK's counts, so
      // the two still agree on what "the vocabulary" is.
      graft.plans.GroupTopK.topK(TA.tokenCounts(docs(s, dir), "text"),
        groupCols = Nil,
        orderBy = Seq(col("n").desc, col("token").asc), k = 100,
        rankName = "rank")
    }),


    // Per-doc top-3 salient keywords: tf·N/df in integer basis points
    // through the GroupTopK tail (see TextAnalysis.keywordSalience for
    // the log-free determinism rationale).
    "t13_keyword_salience" -> ((s, dir) =>
      TA.keywordSalience(docs(s, dir), "doc_id", "text", k = 3)),


    // Corpus-trained bigram-LM likelihood per doc (CCNet-style quality
    // signal, integer-bp probabilities + one exact division).
    "t14_lm_likelihood" -> ((s, dir) =>
      TA.lmLikelihoodScore(docs(s, dir), "doc_id", "text")),


    // Corpus top-50 bigrams: the n-gram census a contamination or
    // memorization audit starts from. Scan-side codegen'd shingling, one
    // hash aggregate, distributed TakeOrdered.
    "t12_bigram_topk" -> ((s, dir) =>
      TA.ngramTopK(docs(s, dir), "text", n = 2, k = 50)
        .select(col("ngram").as("bigram"), col("n"))),


    // t25 (round 15): REAL BPE training — 8 greedy merge rules learned
    // from the top-100 word-count table (the bounded-fit pattern), each
    // step's pair/merged/count driver-visible. The ",a.,b." dual-anchored
    // symbol form makes one literal replace per rule EXACT greedy BPE
    // (see TextAnalysis.bpeTrain), which is what lets DuckDB re-train
    // the same rules through 8 unrolled SQL stages and hash-match.
    "t25_bpe_train" -> ((s, dir) => {
      import s.implicits._
      TA.memoizedBpeMerges(docs(s, dir), "text", topWords = 100,
          merges = 8, cacheKey = dir)
        .map(m => (m.step.toLong, m.pair, m.merged, m.count))
        .toDF("step", "pair", "merged", "n")
    }),


    // t26: the learned tokenizer APPLIED to every document — scan-side
    // codegen'd (regexp word extraction + the literal replace chain),
    // zero shuffles; per doc the word count, post-merge token count, and
    // tokens-per-10k-chars. The oracle re-trains AND re-applies in SQL,
    // so a drift anywhere in the learn-then-apply path hash-mismatches.
    "t26_bpe_apply" -> ((s, dir) => {
      val ms = TA.memoizedBpeMerges(docs(s, dir), "text", topWords = 100,
        merges = 8, cacheKey = dir)
      TA.bpeApply(docs(s, dir), "doc_id", "text", ms)
    }),
  )

  /** The 8 unrolled BPE training stages (t25/t26 oracle prelude): word
    * counts → top-100 → the ",a.,b." dual-anchored form, then per stage the weighted pair
    * census, the (count desc, pair asc) argmax, and the one-replace
    * application — the SQL mirror of [[graft.operators.TextAnalysis
    * .bpeTrain]]. */
  private def bpeTrainCtes: String = {
    // Every stage CTE is MATERIALIZED: DuckDB inlines CTEs referenced
    // more than once, and each w_i is read by both p_{i+1} and w_{i+1}
    // (plus scalar subqueries on m_i), so an inlined chain re-evaluates
    // the corpus word census exponentially in the stage count.
    // ",a.,b." pattern / ",ab." replacement (each symbol wrapped in its
    // own ",." delimiter pair — see TextAnalysis.bpeTrain). The coalesce
    // to the impossible literal ',0.' (tokens are [a-z], '0' never
    // occurs) makes every stage a no-op when training dries up early
    // (m_i empty → scalar subquery NULL → replace(w, NULL, …) would
    // otherwise NULL the whole chain), mirroring the engine's early stop.
    val stages = (1 to 8).map { i =>
      s"""p$i AS MATERIALIZED (SELECT pr, sum(c) AS n FROM (
                  SELECT c, unnest(list_transform(generate_series(1, len(tk) - 1),
                    j -> tk[j] || ',' || tk[j + 1])) AS pr
                  FROM (SELECT regexp_extract_all(w, '[a-z]+') AS tk, c FROM w${i - 1})
                  WHERE len(tk) >= 2) GROUP BY pr),
          m$i AS MATERIALIZED (SELECT pr, n FROM p$i ORDER BY n DESC, pr ASC LIMIT 1),
          w$i AS MATERIALIZED (SELECT replace(w,
                         coalesce((SELECT ',' || replace(pr, ',', '.,') || '.' FROM m$i), ',0.'),
                         coalesce((SELECT ',' || replace(pr, ',', '') || '.' FROM m$i), ',0.')) AS w, c
                  FROM w${i - 1})"""
    }.mkString(",\n")
    s"""wcnt AS MATERIALIZED (
          SELECT w, count(*) AS c
          FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
                FROM documents)
          GROUP BY w ORDER BY c DESC, w ASC LIMIT 100),
        w0 AS MATERIALIZED (
          SELECT regexp_replace(w, '(.)', ',\\1.', 'g') AS w, c FROM wcnt),
        $stages"""
  }

  val oracleSql: Map[String, String] = Map(

    // t21: identical planted pad run; Gini–Simpson in integer bp (list
    // machinery mirrors the engine's row-local higher-order expressions;
    // the collision sum is order-free integer arithmetic).
    "t21_char_diversity" ->
      """WITH d AS (SELECT doc_id,
                           CASE WHEN doc_id % 9 = 0 THEN repeat('aa ', 60)
                                ELSE text END AS text
                    FROM documents),
              c AS (SELECT doc_id,
                           list_filter(string_split(text, ''), x -> x <> '') AS cs
                    FROM d),
              k AS (SELECT doc_id, cs, list_distinct(cs) AS dl,
                           CAST(len(cs) AS BIGINT) AS n
                    FROM c WHERE len(cs) > 0),
              g AS (SELECT doc_id, n,
                           CAST(len(dl) AS BIGINT) AS n_char_kinds,
                           CAST(list_sum(list_transform(dl,
                             ch -> CAST(len(list_filter(cs, x -> x = ch)) AS BIGINT)
                                   * CAST(len(list_filter(cs, x -> x = ch)) AS BIGINT)))
                             AS BIGINT) AS coll
                    FROM k)
         SELECT doc_id, n AS n_chars, n_char_kinds,
                10000 - (coll * 10000) // (n * n) AS diversity_bp,
                (10000 - (coll * 10000) // (n * n)) < 5000 AS low_diversity
         FROM g""",

    // t22: identical planted token stream; full-match regexes anchored
    // on both engines.
    "t22_code_detect" ->
      s"""WITH d AS (SELECT doc_id,
                            CASE WHEN doc_id % 7 = 0 THEN '$CodeTokenStream'
                                 ELSE text END AS text
                     FROM documents),
              t AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM d),
              g AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                           CAST(len(list_filter(ws, w -> regexp_matches(w, '^[^a-z0-9]+$$'))) AS BIGINT) AS n_sym,
                           CAST(len(list_filter(ws, w -> regexp_matches(w, '^[0-9]+$$'))) AS BIGINT) AS n_num
                    FROM t WHERE len(ws) > 0)
         SELECT doc_id, n_tokens,
                (n_sym * 10000) // n_tokens AS sym_bp,
                (n_num * 10000) // n_tokens AS num_bp,
                (n_sym * 10000) // n_tokens >= 1500 AS is_code
         FROM g""",
    // t23: identical planted payload; the shared pattern constants are
    // interpolated so engine and oracle can never drift, and the
    // redaction chain (email → phone → ip, 'g' flag — Spark replaces
    // globally by default) is hashed, not shipped.
    "t23_pii_scrub" ->
      s"""WITH d AS (SELECT doc_id,
                            CASE WHEN doc_id % 11 = 5
                                 THEN text || '${PipelineShared.PiiPayload}'
                                 ELSE text END AS text
                     FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PiiEmailRe}')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PiiPhoneRe}')) AS BIGINT) AS n_phones,
                CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PiiIpRe}')) AS BIGINT) AS n_ips,
                (len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PiiEmailRe}'))
                 + len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PiiPhoneRe}'))
                 + len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PiiIpRe}'))) > 0 AS has_pii,
                md5(regexp_replace(
                      regexp_replace(
                        regexp_replace(text, '${graft.operators.TextAnalysis.PiiEmailRe}', '<EMAIL>', 'g'),
                        '${graft.operators.TextAnalysis.PiiPhoneRe}', '<PHONE>', 'g'),
                      '${graft.operators.TextAnalysis.PiiIpRe}', '<IP>', 'g')) AS redacted_md5
         FROM d""",

    // t24: identical planted accident; the three anomaly patterns are
    // literal-codepoint classes/alternations interpolated from the shared
    // constants (RE2 and Java agree exactly on those), and the strip
    // chain is one alternation with the same leftmost-first semantics in
    // both engines.
    "t24_mojibake" ->
      s"""WITH d AS (SELECT doc_id,
                            CASE WHEN doc_id % 13 = 7
                                 THEN text || '${PipelineShared.MojibakePayload}'
                                 ELSE text END AS text
                     FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.MojibakeRe}')) AS BIGINT) AS n_moji,
                CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.ReplacementRe}')) AS BIGINT) AS n_repl,
                CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.CtrlRe}')) AS BIGINT) AS n_ctrl,
                (len(regexp_extract_all(text, '${graft.operators.TextAnalysis.MojibakeRe}'))
                 + len(regexp_extract_all(text, '${graft.operators.TextAnalysis.ReplacementRe}'))
                 + len(regexp_extract_all(text, '${graft.operators.TextAnalysis.CtrlRe}'))) > 0 AS is_suspect,
                md5(regexp_replace(text,
                      '${graft.operators.TextAnalysis.MojibakeRe}|${graft.operators.TextAnalysis.ReplacementRe}|${graft.operators.TextAnalysis.CtrlRe}',
                      '', 'g')) AS clean_md5
         FROM d""",

    // t17: the augmented corpus rows with clf_side_ok pinned at 1 — the
    // balanced planted-vocabulary classifier must put every doc on its
    // class's side of 0.5 (measured margins 0.628 vs 0.403).
    "t17_quality_classifier" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS is_seed,
                CAST(1 AS BIGINT) AS clf_side_ok
         FROM documents
         UNION ALL
         SELECT CAST(doc_id + 400000 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)
         FROM documents WHERE doc_id < 40""",

    "t13_keyword_salience" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              tok AS (SELECT doc_id, unnest(ws) AS token FROM t),
              tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
              dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT count(*) AS n_docs FROM documents),
              sc AS (SELECT tf.doc_id, tf.token,
                            -- overflow-safe exact identity, mirrored in
                            -- TextAnalysis.keywordSalience:
                            -- tf*N*1e4//df = tf*q + tf*r//df
                            CAST(tf.tf * ((n.n_docs * 10000) // dfq.df)
                                 + (tf.tf * ((n.n_docs * 10000) % dfq.df)) // dfq.df
                                 AS BIGINT) AS salience_bp
                     FROM tf JOIN dfq USING (token) CROSS JOIN n),
              r AS (SELECT doc_id, token, salience_bp,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY salience_bp DESC, token) AS rnk
                    FROM sc)
         SELECT doc_id, token, salience_bp, CAST(rnk AS BIGINT) AS rnk
         FROM r WHERE rnk <= 3""",

    "t14_lm_likelihood" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              u AS (SELECT unnest(ws) AS token FROM t),
              c1 AS (SELECT token, count(*) AS n1 FROM u GROUP BY 1),
              v AS (SELECT count(DISTINCT token) AS vocab FROM u),
              b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                             i -> concat_ws(' ', ws[i], ws[i+1]))) AS bigram
                    FROM t WHERE len(ws) >= 2),
              c2 AS (SELECT bigram, count(*) AS n2 FROM b GROUP BY 1),
              s AS (SELECT b.doc_id,
                           CAST(c2.n2 * 10000 // (c1.n1 + v.vocab) AS BIGINT) AS p_bp
                    FROM b JOIN c2 USING (bigram)
                           JOIN c1 ON c1.token = string_split(b.bigram, ' ')[1]
                           CROSS JOIN v)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                round(CAST(sum(p_bp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS lm_score_bp
         FROM s GROUP BY doc_id""",

    // Seed overlap: d03's 3-gram shingle convention (blank-filtered
    // split, list_distinct); count(s.gram) counts non-null = LEFT-join
    // hits, mirroring count(hit).
    "t15_seed_overlap" ->
      """WITH w AS (SELECT doc_id, source,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              g AS (SELECT doc_id, source,
                           list_distinct(list_transform(generate_series(1, len(ws) - 2),
                             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
                    FROM w WHERE len(ws) >= 3),
              seed AS (SELECT DISTINCT unnest(sh) AS gram FROM g WHERE source = 'src0'),
              e AS (SELECT doc_id, unnest(sh) AS gram FROM g),
              a AS (SELECT e.doc_id,
                           CAST(count(*) AS BIGINT) AS n_grams,
                           CAST(count(s.gram) AS BIGINT) AS n_seed_grams
                    FROM e LEFT JOIN seed s ON e.gram = s.gram
                    GROUP BY 1)
         SELECT doc_id, n_grams, n_seed_grams,
                CAST(n_seed_grams * 10000 // n_grams AS BIGINT) AS overlap_bp
         FROM a""",

    // Blocklist filter: the same two-word VALUES list; count occurrences
    // (duplicates included), keep iff zero.
    "t20_blocklist_filter" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents)
         SELECT doc_id,
                CAST(len(ws) AS BIGINT) AS n_tokens,
                CAST(len(list_filter(ws, w -> w IN ('slow', 'merge'))) AS BIGINT) AS n_flagged,
                len(list_filter(ws, w -> w IN ('slow', 'merge'))) = 0 AS keep
         FROM t""",

    // Perplexity buckets: t14's scoring chain, per-language quantile_cont
    // cuts rounded to 4 (the t18 med_tokens convention), threshold CASE.
    "t19_perplexity_buckets" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              u AS (SELECT unnest(ws) AS token FROM t),
              c1 AS (SELECT token, count(*) AS n1 FROM u GROUP BY 1),
              v AS (SELECT count(DISTINCT token) AS vocab FROM u),
              b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                             i -> concat_ws(' ', ws[i], ws[i+1]))) AS bigram
                    FROM t WHERE len(ws) >= 2),
              c2 AS (SELECT bigram, count(*) AS n2 FROM b GROUP BY 1),
              s AS (SELECT b.doc_id,
                           CAST(c2.n2 * 10000 // (c1.n1 + v.vocab) AS BIGINT) AS p_bp
                    FROM b JOIN c2 USING (bigram)
                           JOIN c1 ON c1.token = string_split(b.bigram, ' ')[1]
                           CROSS JOIN v),
              sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                            round(CAST(sum(p_bp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS lm_score_bp
                     FROM s GROUP BY doc_id),
              sl AS (SELECT sc.doc_id, d.lang, sc.n_bigrams, sc.lm_score_bp
                     FROM sc JOIN documents d USING (doc_id)),
              cuts AS (SELECT lang,
                              round(quantile_cont(lm_score_bp, 0.33333333), 4) AS lo,
                              round(quantile_cont(lm_score_bp, 0.66666667), 4) AS hi
                       FROM sl GROUP BY 1)
         SELECT sl.doc_id, sl.lang, sl.n_bigrams, sl.lm_score_bp,
                CASE WHEN sl.lm_score_bp >= c.hi THEN 'head'
                     WHEN sl.lm_score_bp >= c.lo THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM sl JOIN cuts c USING (lang)""",

    // Corpus card: p08's quality CTE, group aggregates, quantile_cont
    // (the q38 convention), one totals cross join.
    "t18_corpus_card" ->
      """WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents),
              c AS (SELECT doc_id, lang, source, CAST(len(ws) AS BIGINT) AS n_tokens,
                           CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
                           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                    FROM t),
              q AS (SELECT doc_id, lang, source, n_tokens,
                           CAST(n_uniq * 5000 // n_tokens
                                + (n_tokens - n_stop) * 3000 // n_tokens
                                + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
                    FROM c),
              g AS (SELECT lang, source,
                           CAST(count(*) AS BIGINT) AS n_docs,
                           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                           round(CAST(sum(quality_bp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS avg_quality_bp,
                           round(quantile_cont(n_tokens, 0.5), 2) AS med_tokens
                    FROM q GROUP BY 1, 2),
              tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM g)
         SELECT lang, source, n_docs, n_tokens, avg_quality_bp, med_tokens,
                CAST(n_tokens * 10000 // tt AS BIGINT) AS token_share_bp
         FROM g CROSS JOIN tot""",

    // Boilerplate scrub: d08's window CTE verbatim, doc-frequency flag,
    // cuts via the NULL-skipping string_agg (coalesced — an all-
    // boilerplate doc keeps an empty clean_text row, same as the
    // engine's array_join over the empty kept set).
    "t16_boilerplate_scrub" ->
      s"""WITH d AS (SELECT doc_id,
                            CASE WHEN doc_id % 5 = 0
                                 THEN '$BoilerplateBanner ' || text
                                 ELSE text END AS text
                     FROM documents),
              t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM d),
              l AS (SELECT doc_id, unnest(list_transform(generate_series(0, (len(ws) - 1) // 16),
                             i -> {'line_idx': i, 'line': array_to_string(ws[i*16+1 : i*16+16], ' ')})) AS u
                    FROM t WHERE len(ws) >= 1),
              e AS (SELECT doc_id, u.line_idx AS line_idx, u.line AS line FROM l),
              f AS (SELECT md5(line) AS h FROM e
                    GROUP BY 1 HAVING count(DISTINCT doc_id) >= 4)
         SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
                CAST(count(f.h) AS BIGINT) AS n_cut_lines,
                coalesce(string_agg(CASE WHEN f.h IS NULL THEN e.line END,
                                    ' ' ORDER BY e.line_idx), '') AS clean_text
         FROM e LEFT JOIN f ON md5(e.line) = f.h
         GROUP BY 1""",

    "t01_token_stats" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                CAST(length(text) AS BIGINT) AS n_chars_calc,
                round(CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
                      / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS avg_token_len
         FROM documents""",

    "t02_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                           CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
                           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                    FROM t)
         SELECT doc_id, n_tokens, n_uniq, n_stop,
                CAST(n_uniq * 5000 // n_tokens
                     + (n_tokens - n_stop) * 3000 // n_tokens
                     + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
         FROM c""",

    "t03_langid" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              c AS (SELECT doc_id,
                           len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS en,
                           len(list_filter(ws, w -> w IN ('el','la','de','los','que','y'))) AS es,
                           len(list_filter(ws, w -> w IN ('le','les','des','et','un','une'))) AS fr,
                           len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS de
                    FROM t)
         SELECT doc_id,
                CASE WHEN en >= es AND en >= fr AND en >= de THEN 'en'
                     WHEN es >= fr AND es >= de THEN 'es'
                     WHEN fr >= de THEN 'fr'
                     ELSE 'de' END AS lang_guess
         FROM c""",

    "t04_fingerprint" ->
      """SELECT doc_id,
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
         FROM documents""",

    "t05_bpe_tokens" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f]')) AS BIGINT) AS n_bpe_tokens
         FROM documents""",

    "t09_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              s AS (SELECT doc_id, list_transform(generate_series(1, len(ws) - 2),
                             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) AS hs
                    FROM t WHERE len(ws) >= 3),
              f AS (SELECT doc_id, list_sort(list_distinct(
                             list_transform(generate_series(1, len(hs) - 3),
                               i -> list_min(hs[i:i+3])))) AS fingerprint
                    FROM s WHERE len(hs) >= 4)
         SELECT doc_id, array_to_string(fingerprint, '|') AS fingerprint,
                CAST(len(fingerprint) AS BIGINT) AS n_marks FROM f""",

    "t10_repetition" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                             i -> concat_ws(' ', ws[i], ws[i+1]))) AS bigram
                    FROM t WHERE len(ws) >= 2),
              c AS (SELECT doc_id, bigram, count(*) AS n FROM b GROUP BY doc_id, bigram),
              a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
                           CAST(max(n) AS BIGINT) AS top_n,
                           CAST(coalesce(sum(n) FILTER (WHERE n > 1), 0) AS BIGINT) AS dup_n
                    FROM c GROUP BY doc_id)
         SELECT doc_id, n_bigrams, top_n * 10000 // n_bigrams AS top_bigram_bp,
                dup_n * 10000 // n_bigrams AS dup_bigram_bp
         FROM a""",

    "t11_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
              c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
              v AS (SELECT token FROM c ORDER BY n DESC, token LIMIT 10),
              a AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                           CAST(coalesce(sum(CASE WHEN v.token IS NULL THEN 1 END), 0) AS BIGINT) AS n_oov
                    FROM tok t LEFT JOIN v ON t.token = v.token
                    GROUP BY t.doc_id)
         SELECT doc_id, n_tokens, n_oov, n_oov * 10000 // n_tokens AS oov_bp FROM a""",

    "t06_pii_scrub" ->
      """SELECT doc_id,
                regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+', '<EMAIL>', 'g'),
                               '[0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g') AS scrubbed,
                CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(text, '[0-9][0-9][0-9][0-9][0-9][0-9]+')) AS BIGINT) AS n_long_nums
         FROM documents""",

    "t07_vocab_topk" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
              c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
              r AS (SELECT token, n,
                           CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
                    FROM c)
         SELECT token, n, rank FROM r WHERE rank <= 100""",

    "t08_quality_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                           CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len,
                           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                    FROM t),
              r AS (SELECT doc_id, n_tokens,
                           list_concat(
                             list_concat(
                               CASE WHEN n_tokens < 20 THEN ['too_short'] ELSE []::VARCHAR[] END,
                               CASE WHEN n_tokens > 2000 THEN ['too_long'] ELSE []::VARCHAR[] END),
                             list_concat(
                               CASE WHEN sum_len * 100 < n_tokens * 300
                                      OR sum_len * 100 > n_tokens * 1000
                                    THEN ['odd_token_len'] ELSE []::VARCHAR[] END,
                               CASE WHEN n_stop * 10000 < n_tokens * 100
                                    THEN ['low_stopword'] ELSE []::VARCHAR[] END)) AS reasons
                    FROM c)
         SELECT doc_id, n_tokens,
                -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
                coalesce(array_to_string(reasons, ','), '') AS reasons,
                len(reasons) = 0 AS keep FROM r""",

    "t12_bigram_topk" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              b AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                             i -> concat_ws(' ', ws[i], ws[i+1]))) AS bigram
                    FROM t WHERE len(ws) >= 2),
              c AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram),
              r AS (SELECT bigram, n, row_number() OVER (ORDER BY n DESC, bigram) AS rank FROM c)
         SELECT bigram, n FROM r WHERE rank <= 50""",

    // t25: re-train the 8 merges in SQL (the unrolled stages of
    // bpeTrainCtes) and emit the rule table.
    "t25_bpe_train" ->
      s"""WITH $bpeTrainCtes
         ${(1 to 8).map(i =>
        s"SELECT CAST($i AS BIGINT) AS step, pr AS pair, replace(pr, ',', '') AS merged, CAST(n AS BIGINT) AS n FROM m$i")
        .mkString("\n         UNION ALL ")}""",

    // t26: re-train AND re-apply — every doc's words through the same
    // dual-anchored form and the 8-replace chain (the one-row rules CTE is cross
    // joined so the lambda can reference the learned literals).
    "t26_bpe_apply" ->
      s"""WITH $bpeTrainCtes,
              rules AS MATERIALIZED (SELECT
                ${(1 to 8).map(i =>
        s"coalesce((SELECT ',' || replace(pr, ',', '.,') || '.' FROM m$i), ',0.') AS pat$i, coalesce((SELECT ',' || replace(pr, ',', '') || '.' FROM m$i), ',0.') AS rep$i")
        .mkString(",\n                ")}),
              dw AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z]+') AS ws
                     FROM documents)
         SELECT doc_id,
                CAST(len(ws) AS BIGINT) AS n_words,
                CAST(coalesce(list_sum(list_transform(ws,
                  w -> len(${(1 to 8).foldLeft("regexp_replace(w, '(.)', ',\\1.', 'g')")(
        (acc, i) => s"replace($acc, pat$i, rep$i)")})
                     - len(replace(${(1 to 8).foldLeft("regexp_replace(w, '(.)', ',\\1.', 'g')")(
        (acc, i) => s"replace($acc, pat$i, rep$i)")}, ',', '')))), 0) AS BIGINT) AS n_tokens,
                CAST(CASE WHEN coalesce(list_sum(list_transform(ws, w -> len(w))), 0) = 0
                          THEN 0
                          ELSE coalesce(list_sum(list_transform(ws,
                            w -> len(${(1 to 8).foldLeft("regexp_replace(w, '(.)', ',\\1.', 'g')")(
        (acc, i) => s"replace($acc, pat$i, rep$i)")})
                               - len(replace(${(1 to 8).foldLeft("regexp_replace(w, '(.)', ',\\1.', 'g')")(
        (acc, i) => s"replace($acc, pat$i, rep$i)")}, ',', '')))), 0) * 10000
                               // list_sum(list_transform(ws, w -> len(w)))
                     END AS BIGINT) AS ratio_bp
         FROM dw, rules""",
  )
}
