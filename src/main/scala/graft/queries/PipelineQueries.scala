package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Sampling, SimilaritySearch, TextAnalysis => TA}
import graft.sources.Sources

/** LLM-training-data pipeline operators over the `documents` / `embeddings`
  * tables: text analysis (t*), deduplication (d*), similarity search (s*),
  * multimodal binary plumbing (m*). Oracle-able ops carry DuckDB SQL; the
  * sketch-based ops (MinHash-LSH, SimHash, ANN) are exercised by ScalaTest
  * against exact ground truth instead (driver records rows-only).
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "embeddings")

  /** Per-bucket population ceiling for the shipped d03 pair generator.
    * Within-bucket pairs grow quadratically with bucket size, and the
    * length-blocking key puts no ceiling on the population — a corpus of
    * identically-sized boilerplate silently degenerates to all-pairs. The
    * cap truncates each bucket to its first 256 docs by id (≤ ~32k
    * merge-walks per bucket), mirrored verbatim in [[D03Sql]]'s QUALIFY so
    * the capped form stays hash-exact against the oracle. 256 leaves
    * sf0.01 (max bucket 58) untouched and truncates sf0.1's hottest bucket
    * (557) — the bench measures the skew-safe production form. */
  private[graft] val D03BucketCap = 256

  /** Per-(session, dir) memoized d03 pair set + connected components —
    * the [[SimilaritySearch.memoizedIvfIndex]] pattern applied to the
    * dedup family. Five reports share this frame (d03/d07/d09/d10/d11/d12
    * all start from the same pairs, and four of them from the same
    * clustering); at 100 TB nobody re-clusters the corpus per report, so
    * the engine must not either: detect + cluster ONCE, read many.
    *
    * Both frames are localCheckpoint-materialized (connectedComponents
    * already returns a checkpointed frame; the pairs are checkpointed
    * here), so every downstream report reads computed blocks instead of
    * re-running the quadratic merge-walk + iterative clustering. Keys hold
    * the session object itself (identity semantics); stopped-session
    * entries are evicted on access because their checkpoint blocks died
    * with the context. */
  private val componentsCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (DataFrame, DataFrame)]()

  private[graft] def dupPairsAndClusters(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val it = componentsCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) it.remove()
    }
    componentsCache.computeIfAbsent((s, dir), { key =>
      graft.tools.BuildTimer.time("dup_pairs_clusters") {
      val pairs = Dedup.ngramJaccardPairs(docs(key._1, key._2),
          "doc_id", "text", "n_chars", threshold = 0.2,
          maxBucketSize = Some(D03BucketCap))
        .localCheckpoint()
      val clusters = Dedup.connectedComponents(pairs, "a_id", "b_id")
      (pairs, clusters)
      }
    })
  }

  /** Per-(session, dir) memoized dedup-survivors frame — the s1→s2→split
    * prefix that BOTH composed corpus builds (p10 and p13) start from:
    * quality gate, near-dup cluster drop, token count, split stamp, one
    * localCheckpoint. Round 8 built this twice per bench session (once per
    * composed build, byte-identical blocks both times); at 100 TB the
    * deduped corpus is THE artifact a pipeline persists between its dedup
    * and assembly phases, and nobody materializes it once per downstream
    * consumer. Built inside [[graft.tools.BuildTimer]] so the bench prices
    * it in `warmup_build` — sharing must show as an explicit one-time
    * cost, never a silent per-query win. */
  private val survivorsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def memoizedDedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val it = survivorsCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) it.remove()
    }
    survivorsCache.computeIfAbsent((s, dir), { key =>
      // The cluster build times itself (nested BuildTimer spans would
      // double-count); only the survivors checkpoint is timed here.
      val clusters = dupPairsAndClusters(key._1, key._2)._2
      graft.tools.BuildTimer.time("dedup_survivors") {
        dedupSurvivorsWithSplit(docs(key._1, key._2), clusters)
      }
    })
  }

  /** Per-(session, dir) memoized decontaminated + quality-scored
    * survivors — the [[memoizedDedupSurvivors]] pattern one stage later:
    * the p03/p11 anti-joins and the quality scan are IDENTICAL in the v2
    * and v3 composed builds (they differ only from the mixture on), so
    * the engine decontaminates once and both builds read the artifact —
    * at 100 TB the decontaminated corpus is the persisted inter-phase
    * handoff, not a per-build re-derivation. Priced in warmup_build. */
  private val decontamCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def memoizedDecontamSurvivors(s: SparkSession, dir: String): DataFrame = {
    val it = decontamCache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    }
    decontamCache.computeIfAbsent((s, dir), { key =>
      // The survivors build times itself; only the decontamination +
      // scoring checkpoint is timed here (the nested-span convention).
      val surv = memoizedDedupSurvivors(key._1, key._2)
      graft.tools.BuildTimer.time("decontam_scored") {
        decontaminatedScoredSurvivors(surv).localCheckpoint()
      }
    })
  }

  private val dsirModelCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), graft.operators.Sampling.DsirModel]()

  /** The p17 DSIR weight table, memoized per (session, dir) like the
    * other standing artifacts (it is the build half of the build/apply
    * split — two corpus-wide gram passes that the scoring probe should
    * pay once per corpus, not once per call). Cached + materialized so
    * repeat scores are a broadcast probe only; priced in warmup_build. */
  private def memoizedDsirModel(s: SparkSession,
                                dir: String): graft.operators.Sampling.DsirModel = {
    val it = dsirModelCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) it.remove()
    }
    dsirModelCache.computeIfAbsent((s, dir), { key =>
      graft.tools.BuildTimer.time("dsir_model") {
        val m = graft.operators.Sampling.dsirModelTable(
          docs(key._1, key._2), "text",
          isTarget = col("source") === "src0", buckets = 1024)
        m.weights.cache().count()
        m
      }
    })
  }

  private val qualityClfCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), graft.operators.TextAnalysis.QualityClassifier]()

  /** t17's planted-seed vocabulary (the QualityClassifierSpec
    * construction over the real corpus): 6 marker words absent from the
    * synthetic raw vocabulary; each planted seed doc is 12 words cycling
    * the vocabulary from a doc_id-derived offset. Deterministic and
    * DuckDB-recomputable — the whole point. */
  private[graft] val T17MarkerVocab =
    Seq("qalpha", "qbeta", "qgamma", "qdelta", "qepsilon", "qzeta")

  /** The 40 planted seed docs (ids +400000 so they never collide with a
    * corpus id): the synthetic corpus has NO naturally separable "seed"
    * source (measured: per-source mean quality differs by < 0.001), so —
    * the d06/s05/s10 convention — the separability signal is planted,
    * and the oracle recomputes the construction verbatim. */
  private def t17PlantedSeeds(s: SparkSession, dir: String): DataFrame = {
    val marker = array(T17MarkerVocab.map(lit): _*)
    docs(s, dir).filter(col("doc_id") < 40).select(
      (col("doc_id") + 400000L).as("doc_id"),
      array_join(transform(sequence(lit(0), lit(11)),
        i => element_at(marker,
          (pmod(i + pmod(col("doc_id"), lit(6)), lit(6)) + 1).cast("int"))),
        " ").as("text"))
  }

  /** The t17 trained classifier, memoized per (session, dir) — the
    * [[memoizedDsirModel]] convention (train once, score many; the
    * bounded local fit priced in warmup_build). Trained on a BALANCED
    * fit set (40 planted seeds vs the first 40 raw docs): with the
    * 40-vs-500 imbalance the logistic bias drags every score under 0.15
    * and the 0.5 decision boundary is meaningless; balanced, the planted
    * vocabulary separates at 0.5 with wide margins (measured seed min
    * 0.628 / raw max 0.403 at every SF). */
  private def memoizedQualityClf(s: SparkSession, dir: String)
      : graft.operators.TextAnalysis.QualityClassifier = {
    val it = qualityClfCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) it.remove()
    }
    qualityClfCache.computeIfAbsent((s, dir), { key =>
      graft.tools.BuildTimer.time("quality_clf") {
        val fitInput = docs(key._1, key._2).filter(col("doc_id") < 40)
          .select(col("doc_id"), col("text"))
          .unionByName(t17PlantedSeeds(key._1, key._2))
        val clf = graft.operators.TextAnalysis.trainQualityClassifier(
          fitInput, "doc_id", "text",
          isSeed = col("doc_id") >= 400000L, buckets = 1024)
        clf.weights.cache().count()
        clf
      }
    })
  }

  /** Drop EVERY memoized artifact derived from one (session, dir) — the
    * pair/components frame here plus the shared dedup-survivors frame and
    * the MinHash, IVF, and MIPS indexes (whose cacheKeys are all
    * `dir`-rooted: `dir`, `dir + "#aug"`, `dir + "#mhidx"`) — for a
    * long-lived session that re-ingests a corpus directory in place. The
    * checkpoint blocks themselves are reclaimed by the ContextCleaner once
    * the dropped frames become unreachable (localCheckpoint bypasses the
    * CacheManager, so there is nothing to unpersist explicitly); the index
    * caches unpersist their own cached frames on eviction. */
  def invalidateDupCache(s: SparkSession, dir: String): Unit = {
    componentsCache.remove((s, dir))
    survivorsCache.remove((s, dir))
    decontamCache.remove((s, dir))
    Option(dsirModelCache.remove((s, dir))).foreach(_.unpersist())
    Option(qualityClfCache.remove((s, dir))).foreach(_.weights.unpersist())
    Option(lineSetIndexCache.remove((s, dir))).foreach(_.unpersist())
    mediaPairsCache.remove((s, dir))
    Dedup.invalidateMinHashIndexCache(s, dir)
    Dedup.invalidateGramIndexCache(s, dir)
    Dedup.invalidateLshVecIndexCache(s, dir)
    SimilaritySearch.invalidateIndexCaches(s, dir)
    ()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    primaryQueries ++ round4Queries ++ round5Queries ++ round6Queries ++
      round9Queries ++ round10Queries

  /** Round 9: the decontamination family's audit artifact. */
  private def round9Queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-eval-document leak provenance (the GPT-3-appendix-style
    // per-benchmark contamination table): p11 emits the train-side drop
    // list; this reads the SAME match stream from the eval side — which
    // benchmarks are compromised, by how many train docs, and who the
    // worst offender is. The pair aggregate and windows partition on
    // eval_id over the bounded match population.
    "p14_contamination_report" -> ((s, dir) => {
      val withSplit = docs(s, dir).withColumn("split",
        graft.operators.Sampling.assignSplit(col("doc_id")))
      graft.operators.Sampling
        .contaminationProvenance(withSplit, "doc_id", "text", "split", n = 13)
    }),

    // Seed-corpus overlap quality (classifier-free importance signal):
    // fraction of each doc's distinct 3-gram shingles present anywhere in
    // the designated seed source. Spread before the shingle projection —
    // the per-row shingle CPU must not serialize on a compact scan (the
    // d04 pattern).
    "t15_seed_overlap" -> ((s, dir) => {
      val base = Dedup.spreadToParallelism(docs(s, dir))
      TA.seedOverlapScore(base, "doc_id", "text", col("source") === "src0")
    }),

    // ExactSubstr verbatim-run pairs (Lee et al.): docs sharing a
    // >= 10-token verbatim run at ANY offset — the dedup geometry d03's
    // jaccard and d08's fixed chunks both miss. Doc-frequency cap 256
    // bounds the per-gram join quadratics (boilerplate grams dropped).
    "d15_exact_substr" -> ((s, dir) =>
      Dedup.exactSubstrPairs(Dedup.spreadToParallelism(docs(s, dir)),
        "doc_id", "text", k = 10, maxGramDocs = 256)),

    // Target-mixture reweighting: admit the largest corpus whose source
    // token shares hit explicit uniform targets (500 bp × 20 sources) —
    // the stated-weights generalization of p06's sqrt temperature.
    "p15_target_mixture" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        size(TA.words(col("text"))).cast("long").as("n_tokens"))
      val targets = docs(s, dir).select(col("source")).distinct()
        .withColumn("weight_bp", lit(500L))
      graft.operators.Sampling
        .targetMixture(d, "source", "doc_id", "n_tokens", targets)
    }))

  /** Round 10: the ExactSubstr family's APPLY step. */
  /** Exactly 16 words — one full line at the t16 window width, so the
    * planted banner IS line 0 and the original windows stay aligned
    * behind it. The oracle interpolates the same constant. */
  private val BoilerplateBanner =
    "subscribe to our newsletter click here to accept all cookies and terms of service today now"

  /** Exactly 16 words — one full line at the d22 window width (the
    * [[BoilerplateBanner]] alignment argument), but planted at a rate
    * (doc_id % 9 = 4) BELOW t16's document-frequency threshold family so
    * the two planted populations stay distinguishable in the bench. */
  private val ParagraphBanner =
    "this exact same paragraph appears at the top of many crawled pages in the raw dump"

  /** Per-(session, dir) memoized corpus [[Dedup.LineSetIndex]] — the
    * [[Dedup.memoizedGramIndex]] convention for the d23 probe: build the
    * corpus line-hash set once per directory, probe every batch; priced
    * in warmup_build. */
  private val lineSetIndexCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), Dedup.LineSetIndex]()

  private def memoizedLineSetIndex(s: SparkSession, dir: String,
                                   corpus: DataFrame): Dedup.LineSetIndex = {
    val it = lineSetIndexCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) it.remove()
    }
    lineSetIndexCache.computeIfAbsent((s, dir), { _ =>
      graft.tools.BuildTimer.time("line_set_index") {
        Dedup.buildLineSetIndex(corpus, "doc_id", "text", lineTokens = 16)
      }
    })
  }

  private def round10Queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Span-level ExactSubstr apply (Lee et al.): d15 names the duplicated
    // PAIRS; this emits the duplicated SPANS (keep-first: the globally
    // first occurrence of every >= 10-token run survives, every other
    // occurrence is cut) joined with each cut doc's cleaned text. Spans
    // are checkpointed (a tiny frame) so the gram pass isn't paid twice
    // across the spans/apply branches.
    "d16_exact_substr_apply" -> ((s, dir) => {
      val base = Dedup.spreadToParallelism(docs(s, dir))
      val spans = Dedup.exactSubstrSpans(base, "doc_id", "text",
        k = 10, maxGramDocs = 256).localCheckpoint()
      spans.join(
        Dedup.exactSubstrApplyFromSpans(base, spans, "doc_id", "text")
          .select(col("doc_id"), col("n_cut_spans"), col("n_cut_tokens"),
            col("clean_text")),
        Seq("doc_id"))
    }),

    // Index-probing delta ExactSubstr (the d13/d14 ingest shape applied
    // to the verbatim-run geometry): the standing corpus is represented
    // ONLY by its memoized capped gram index (built once per (session,
    // dir), parquet save/load for the offline cycle); the batch's grams
    // probe it — shuffle sized by the batch, corpus text never read.
    "d17_delta_exact_substr" -> ((s, dir) => {
      val all = Dedup.spreadToParallelism(docs(s, dir))
      val delta = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val idx = Dedup.memoizedGramIndex(corpus, "doc_id", "text",
        k = 10, maxGramDocs = 256, cacheKey = dir + "#gidx")
      Dedup.deltaExactSubstrPairs(delta, idx, "text")
    }),

    // Span-level delta ExactSubstr APPLY (d17's cleaning counterpart,
    // sharing its memoized corpus gram index): arriving docs (% 10 = 7)
    // land with every run that verbatim-quotes >= 10 consecutive corpus
    // tokens cut — the cleaned batch an admission pipeline persists.
    // Every delta doc emits (uncut ones pass through space-canonical).
    "d19_delta_substr_apply" -> ((s, dir) => {
      val all = Dedup.spreadToParallelism(docs(s, dir))
      val delta = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val idx = Dedup.memoizedGramIndex(corpus, "doc_id", "text",
        k = 10, maxGramDocs = 256, cacheKey = dir + "#gidx")
      Dedup.deltaExactSubstrApply(delta, idx, "text")
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

    // DSIR importance selection (Xie et al. 2023): the classifier-free
    // "pick raw docs that look like the curated seed" selection step —
    // hashed unigram+bigram models of the seed (src0, the t15 seed
    // convention) and the raw remainder, per-doc importance = integer-bp
    // probability difference summed over gram occurrences, top-100 by
    // the per-gram average (ties to the smaller id). Model table is
    // `buckets` rows (bounded, broadcast); scoring shuffles ≈ one row
    // per doc (the t15 ledger); the top-n is a distributed TakeOrdered.
    // d21: the full ingest-time ExactSubstr clean — d19's corpus-quote
    // cut composed with the d16 within-batch keep-first apply over the
    // corpus-cleaned text (the composition d19's scope note deferred,
    // shipped). Same delta/corpus split and memoized gram index as
    // d17/d19; every delta doc emits with both cut counts.
    "d21_ingest_substr_clean" -> ((s, dir) => {
      val all = Dedup.spreadToParallelism(docs(s, dir))
      val delta = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val idx = Dedup.memoizedGramIndex(corpus, "doc_id", "text",
        k = 10, maxGramDocs = 256, cacheKey = dir + "#gidx")
      Dedup.ingestExactSubstrClean(delta, idx, "text")
    }),

    // d22: corpus-wide paragraph (line) dedup — CCNet's keep-first
    // paragraph dedup at the 16-token line granularity: every line's
    // first occurrence (by (doc_id, line_idx)) survives, every later
    // copy across or within docs is cut, docs rebuild from survivors.
    // Docs % 9 = 4 get a shared 16-word banner planted at line 0 (the
    // oracle plants the identical banner), so exactly one planted copy
    // survives and the cross-doc cuts are driver-visible alongside the
    // corpus' natural duplicate docs.
    "d22_paragraph_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(9)) === 4,
          concat_ws(" ", lit(ParagraphBanner), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.paragraphDedup(d, "doc_id", "text", lineTokens = 16)
    }),

    // d23: ingest-time paragraph clean — the d21 composition at line
    // granularity: arriving docs (% 10 = 7, the delta convention) lose
    // every line already in the corpus line-set index, then the
    // survivors run the within-batch keep-first dedup. Index memoized
    // per (session, dir) like the gram index.
    "d23_ingest_paragraph_clean" -> ((s, dir) => {
      val all = Dedup.spreadToParallelism(docs(s, dir))
      val delta = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val idx = memoizedLineSetIndex(s, dir, corpus)
      Dedup.ingestParagraphClean(delta, idx, "doc_id", "text")
    }),

    // d24: soft dedup — duplication-discounted sampling weights instead
    // of hard drops: every doc in a d07 cluster of size n gets
    // weight_bp = 10000 DIV n, singletons 10000, off the SAME memoized
    // pair+cluster artifact d07/d09/d10/d12 read (soft and hard dedup
    // can never disagree on what is a duplicate). Composes with p12's
    // epochRepeat as a sampling schedule.
    "d24_soft_dedup_weights" -> ((s, dir) =>
      Dedup.softDedupWeights(docs(s, dir),
        dupPairsAndClusters(s, dir)._2, "doc_id")),

    // t19: CCNet's perplexity bucketing — per-language head/middle/tail
    // tertiles of t14's bigram-LM score (high score = probable = head).
    // Exact per-language percentile cuts (|langs| rows, broadcast back),
    // tertile fractions as exact 8-digit double literals on both engines.
    "t19_perplexity_buckets" -> ((s, dir) =>
      TA.perplexityBuckets(docs(s, dir), "doc_id", "text", "lang")),

    // p18: the training-shard manifest — deterministic global shuffle:
    // md5-bucket shard assignment + md5-rank position within the shard;
    // the reproducible permutation contract a trainer reads shards by.
    "p18_shard_manifest" -> ((s, dir) =>
      Packing.shardManifest(docs(s, dir), "doc_id", nShards = 32)),

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

    // s12: sparse lexical cosine pairs — the inverted-index all-pairs
    // similarity join over 3-gram COUNTS (the d03 shingle space with
    // multiplicity): exact integer dots + norms over the df-capped
    // vocabulary, one sqrt/divide, round 4.
    "s12_sparse_cosine" -> ((s, dir) =>
      graft.operators.SimilaritySearch.sparseCosinePairs(
        docs(s, dir), "doc_id", "text",
        threshold = 0.9, maxTermDocs = 256, ngram = 3)),

    // p19: per-shard integrity checksums — p18's manifest sibling: doc
    // count + order-free bit_xor content checksum per shard, the table
    // a release publishes for copy/rewrite verification.
    "p19_shard_checksums" -> ((s, dir) =>
      Packing.shardChecksums(docs(s, dir), "doc_id", "text", nShards = 32)),

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
      val tot = g.agg(sum(col("n_tokens")).as("__tot"))
      g.crossJoin(broadcast(tot))
        .withColumn("token_share_bp",
          expr("CAST(n_tokens * 10000 DIV __tot AS BIGINT)"))
        .drop("__tot")
    }),

    // d20: corpus snapshot diff — the dataset-versioning audit between
    // two corpus versions. Snapshot two is derived deterministically
    // from snapshot one (drop %7=3, revise %5=0, add three docs; the
    // oracle mirrors the construction), so added/removed/changed/
    // unchanged are all exercised. One full-outer hash join on the id,
    // digests only — text never joins.
    "d20_corpus_diff" -> ((s, dir) => {
      val old = docs(s, dir).select(col("doc_id"), col("text"))
      val added = s.createDataFrame(Seq(
        (9000001L, "snapshot two added this document"),
        (9000002L, "and this second brand new document"),
        (9000003L, "plus a third addition"))).toDF("doc_id", "text")
      val newer = old.filter(pmod(col("doc_id"), lit(7)) =!= 3)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit("rev2 "), col("text"))).otherwise(col("text"))
            .as("text"))
        .unionAll(added)
      Dedup.corpusDiff(old, newer, "doc_id", "text")
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

    // Model memoized per (session, dir) — the build/apply split: repeat
    // calls pay the broadcast probe only (the s04/s05 index convention).
    "p17_dsir_select" -> ((s, dir) =>
      graft.operators.Sampling.dsirScoreAgainst(
        docs(s, dir).filter(col("source") =!= "src0"), "doc_id", "text",
        memoizedDsirModel(s, dir))
        .orderBy(col("dsir_w").desc, col("doc_id")).limit(100)),

    // The v3 composed build (see [[corpusBuildV3FromSurvivors]]): v2's
    // chain with the sqrt-temperature mix stage swapped for p15's
    // stated-proportion target-mixture solve (uniform 2000 bp token share
    // per language) — the DoReMi-shaped product story: the mixture the
    // corpus ships with is DECLARED, not an emergent function of corpus
    // counts. Same memoized survivors artifact as p10/p13.
    "p16_corpus_build_v3" -> ((s, dir) =>
      corpusBuildTailFrom(memoizedDecontamSurvivors(s, dir),
        budget = 3000L, materialize = true,
        v3MixStage(memoizedDedupSurvivors(s, dir)))),

    // Perceptual frame-overlap (m04's re-encode-surviving twin): docs < 40
    // are planted back as byte-shifted "re-encodes" (monotone remap — every
    // md5 changes, so m04 would MISS all of them), then frames are
    // fingerprinted with the gradient-sign dHash instead of md5 and joined
    // through the same capped frameOverlap. The oracle hashes the ORIGINAL
    // text for the planted ids — equality across the engines holds exactly
    // because the dHash is monotone-remap-invariant, so the driver compare
    // proves the perceptual property end-to-end, not just the plumbing.
    // Frame-energy gate (the pre-fingerprint "drop silence / black
    // frames" stage): docs < 30 are planted back as constant-byte
    // "silent" media whose every frame scores an integer byte-variance
    // of exactly 0 and must be dropped, while real text frames clear the
    // threshold; per-media live-frame rates are the driver-visible
    // output. The energy compare is pure integer arithmetic
    // (n·Σx² − (Σx)² vs n²·minVar) on both engines — no FP boundary.
    "m06_frame_energy" -> ((s, dir) => {
      val M = graft.multimodal.Multimodal
      val media = M.asMediaTable(docs(s, dir))
      val silent = M.asMediaTable(docs(s, dir).filter(col("doc_id") < 30)
        .select((col("doc_id") + 200000L).as("doc_id"),
          repeat(lit("x"), 256).as("text")))
      val frames = M.sampleFrames(media.unionByName(silent),
        frameBytes = 64, stride = 4).toDF()
      val allCnt = frames.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"))
      val liveCnt = M.frameEnergyFilter(frames, minVariance = 4L)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_live"))
      allCnt.join(liveCnt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_frames"),
          coalesce(col("n_live"), lit(0L)).as("n_live"))
        .withColumn("live_bp", expr("n_live * 10000 DIV n_frames"))
    }),

    "m05_perceptual_overlap" -> ((s, dir) =>
      mediaPairsAndClusters(s, dir)._1),

    // m07: the perceptual dedup APPLY — m05's pair stream clustered
    // (pointer-jumping components over the bounded pair population) and
    // every non-representative member dropped: the re-encoded planted
    // copies (+100000 ids) are removed even though every byte differs,
    // their originals survive. Same planted construction as m05 — pairs
    // and clusters come from the ONE memoized media artifact, so the
    // pair set and the drop set can never drift.
    "m07_perceptual_dedup" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.asMediaTable(docs(s, dir))
      val planted = graft.multimodal.Multimodal.reencodeStub(
        media.filter(col("doc_id") < 40), shift = 1, idOffset = 100000L)
      val pop = media.unionByName(planted).toDF().select(col("doc_id"))
      graft.multimodal.Multimodal.perceptualDedupApplyFromClusters(
        pop, "doc_id", mediaPairsAndClusters(s, dir)._2)
    }),

    // m08: perceptual NEAR-dup pairs — the Hamming-tolerant matcher the
    // exact m05 fingerprint equality cannot be: LOSSY planted re-encodes
    // (+300000 ids, one byte per frame bumped — flips ≤ 2 dHash bits per
    // frame) still pair with their originals through the 4x16-bit
    // banding + popcount verify. Byte-vs-char coupling: the oracle bumps
    // CHARS; equal on the ASCII corpus (the m04 assumption, asserted).
    "m08_perceptual_near" -> ((s, dir) => {
      val M = graft.multimodal.Multimodal
      val media = M.asMediaTable(docs(s, dir))
      val planted = M.reencodeLossyStub(
        media.filter(col("doc_id") < 40), idOffset = 300000L)
      val frames = M.sampleFrames(media.unionByName(planted),
        frameBytes = 64, stride = 4).toDF()
        .select(col("doc_id"),
          graft.functions.DHash64.dhash64(col("frame")).as("fp"))
      M.frameNearOverlap(frames, "doc_id", "fp",
        maxHamming = 3, maxBandDocs = 16)
    }))

  /** The m05 pair build (planted re-encodes + dHash fingerprints +
    * capped frame-hash join) + its connected components, shared by m05
    * (which emits the pairs) and m07 (which applies the clustering) —
    * [[dupPairsAndClusters]] at the media layer: detect + cluster ONCE
    * per (session, dir), read many; both frames checkpoint-materialized,
    * the build priced in warmup_build. */
  private val mediaPairsCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (DataFrame, DataFrame)]()

  private def mediaPairsAndClusters(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val it = mediaPairsCache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    }
    mediaPairsCache.computeIfAbsent((s, dir), { key =>
      graft.tools.BuildTimer.time("media_pairs") {
        val media = graft.multimodal.Multimodal.asMediaTable(docs(key._1, key._2))
        val planted = graft.multimodal.Multimodal.reencodeStub(
          media.filter(col("doc_id") < 40), shift = 1, idOffset = 100000L)
        val frames = graft.multimodal.Multimodal
          .sampleFrames(media.unionByName(planted), frameBytes = 64, stride = 4)
          .toDF()
          .select(col("doc_id"),
            graft.functions.DHash64.dhash64(col("frame")).as("fp"))
        val pairs = graft.multimodal.Multimodal
          .frameOverlap(frames, "doc_id", "fp").localCheckpoint()
        val clusters = Dedup.connectedComponents(pairs, "a_id", "b_id")
        (pairs, clusters)
      }
    })
  }

  /** The end-to-end corpus build — the product story the 50 isolated
    * pipeline ops exist for, composed in the order a training-data team
    * actually runs them (the reference's floorplan shape applied to corpus
    * assembly): quality gate (t08) → near-dup apply (d09, the shared
    * memoized capped clusters) → exact train/eval decontamination (p03) →
    * temperature mix (p06) → per-language token budget (p07) → sequence
    * packing (p02) → hash split (p01).
    *
    * Each stage recomputes its statistics (language histogram, budget
    * order, pack offsets) over the SURVIVORS of the previous stage — the
    * semantics that make ordering matter and that the isolated per-op
    * oracles cannot exercise. Shuffle ledger at 100 TB: the corpus
    * streams through filters/semi-joins keyed on doc_id (the near-dup
    * drop set and contaminated-id set are tiny and broadcast); the only
    * corpus-wide shuffles are p07's (lang, sub-bucket) running sum and
    * p02's pack-bucket scan, both of which bound their window partitions
    * by construction. Dumped through Floorista → PartitionedParquetSink
    * in FlooristaSpec (the reference's product shape).
    *
    * One token definition end-to-end: `TA.words` (plain space split), the
    * p02/p07 convention, so the budget and the packer count the same
    * tokens. */
  private[graft] def corpusBuild(s: SparkSession, dir: String): DataFrame =
    corpusBuildFromSurvivors(memoizedDedupSurvivors(s, dir), budget = 3000L)

  /** The s1→s2→split prefix both composed builds share: t08 quality gate
    * (scan-side predicate — the same rules as the t08 report frame, minus
    * its join-back shuffle), d09 near-dup non-keeper drop, token count,
    * split stamp.
    *
    * EXPLICIT broadcast on the drop set (and on every drop set in the
    * stages below): without the hint the planner's no-stats default is a
    * sort-merge anti join, whose ENSURE_REQUIREMENTS exchange shuffles the
    * whole corpus on doc_id — AQE only demotes it to broadcast AFTER that
    * shuffle is written. The drop sets are bounded (cluster non-keepers of
    * the CAPPED pair set; contaminated train ids ≤ the eval population),
    * so the corpus streams through map-side anti joins and never
    * repartitions on doc_id (Round7Spec pins this ledger). If a corpus
    * ever pushes a drop set past executor broadcast capacity, remove the
    * hint and accept the doc_id co-shuffle.
    *
    * MATERIALIZATION POINT: contamination self-joins this frame (two
    * branches) and the anti join reads it a third time; without a
    * checkpoint every branch re-runs the scan + quality filter + dedup
    * anti join, and the duplication COMPOUNDS through the later
    * two-branch stages (budget, packing) to ~12× the scan. The deduped
    * corpus is also precisely the artifact a 100 TB pipeline persists
    * between its dedup and assembly phases (the reference dumps every
    * intermediate too) — so materialize it once, here, and share it across
    * BOTH composed builds via [[memoizedDedupSurvivors]]. Measured at
    * sf0.1: p10 3.37s → 1.33s (round 6, checkpoint); round 9 removes the
    * second materialization p13 used to pay on top. */
  private[graft] def dedupSurvivorsWithSplit(base: DataFrame, clusters: DataFrame,
                                             materialize: Boolean = true): DataFrame = {
    val s1 = base.filter(TA.qualityKeep(col("text")))
    val drops = clusters
      .filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
    val s2 = s1.join(broadcast(drops), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("text"),
        size(TA.words(col("text"))).cast("long").as("n_tokens"))
    val withSplit = s2.withColumn("split", Sampling.assignSplit(col("doc_id")))
    if (materialize) withSplit.localCheckpoint() else withSplit
  }

  /** [[corpusBuild]] over an INJECTED corpus + near-dup cluster frame —
    * the shape the Stress harness scales (replicated corpus, budget ∝
    * factor) without touching the (session, dir)-memoized artifacts.
    * `materialize = false` skips the localCheckpoint points so the
    * WHOLE composition is one plan tree — the Round7Spec exchange-ledger
    * audit needs that (a checkpoint turns every upstream stage into an
    * opaque RDD scan); production keeps the default. */
  private[graft] def corpusBuildFrom(base: DataFrame, clusters: DataFrame,
                                     budget: Long,
                                     materialize: Boolean = true): DataFrame =
    corpusBuildFromSurvivors(
      dedupSurvivorsWithSplit(base, clusters, materialize), budget, materialize)

  /** The p10 tail over an already-materialized survivors frame
    * (doc_id, lang, text, n_tokens, split): p03 exact decontamination →
    * p06 temperature mix → p07 token budget → p02 packing → p01 labels. */
  private[graft] def corpusBuildFromSurvivors(withSplit: DataFrame,
                                              budget: Long,
                                              materialize: Boolean = true): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    // p03: drop TRAIN docs whose byte-identical twin lands in an eval
    // split — computed over the deduped survivors, split assignment the
    // same pure content hash p01 emits at the end.
    val contaminated = Sampling
      .exactContamination(withSplit, "doc_id", "text", "split")
      .select(col("train_id").as("doc_id")).distinct()
    val s3 = withSplit.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    // p06: temperature-flatten the language mix of the survivors.
    val counts = s3.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val nMin = counts.agg(min(col("n_lang")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("rate_bp", floor(lit(10000.0) *
        sqrt(col("n_min").cast("double") / col("n_lang").cast("double"))))
      .select(col("lang"), col("rate_bp"))
    val s4 = s3.join(broadcast(rates), Seq("lang"))
      .filter(Sampling.hashBucket(col("doc_id"), 10000) < col("rate_bp"))
    // p07: per-language token budget over what survived the mix. The
    // admitted set (budget-bounded, far smaller than the corpus) is the
    // second natural artifact: packing's two-pass scan reads it twice.
    val s5 = cp(Sampling.tokenBudgetPerGroup(
        s4.select(col("doc_id"), col("lang"), col("n_tokens")),
        groupCol = "lang", keyCol = "doc_id", tokensCol = "n_tokens",
        budget = budget)
      .select(col("doc_id"), col("lang"), col("n_tokens")))
    // p02 + p01: pack the admitted docs into fixed-context sequences and
    // stamp the final bucket/split labels.
    Packing.packSequences(s5, "doc_id", "n_tokens", ctxLen = 2048L)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"),
        Sampling.hashBucket(col("doc_id")).as("bucket"),
        Sampling.assignSplit(col("doc_id")).as("split"))
  }

  /** [[corpusBuildFrom]] extended with the round-7 admission ops — v2 of
    * the composed product story. Two new stages, same recompute-over-
    * survivors semantics: after the exact (p03) decontamination, drop
    * train docs sharing any 13-gram with an eval-split SURVIVOR (p11 —
    * the quoted-passage leak p03's whole-doc hash misses); after packing,
    * expand the admitted corpus into epoch-weighted repeats (p12) keyed
    * on the shared t02 quality score computed once over the deduped
    * survivors and carried through budget and packing. Shuffle-ledger
    * delta vs [[corpusBuildFrom]]: the gram stage adds one broadcast
    * probe whose shuffled rows are the matches (bounded by the eval
    * population), and p12 is map-only (scan-side explode) — the
    * corpus-wide shuffles remain p07's bounded scan + p02's pack scan. */
  private[graft] def corpusBuildV2From(base: DataFrame, clusters: DataFrame,
                                       budget: Long,
                                       materialize: Boolean = true): DataFrame =
    corpusBuildV2FromSurvivors(
      dedupSurvivorsWithSplit(base, clusters, materialize), budget, materialize)

  /** The p13 tail over the SAME survivors artifact p10 starts from — round
    * 8 materialized a second, quality-widened copy of the survivors frame
    * just for v2; the quality columns are a per-row pure function of
    * `text`, so they attach map-side over the shared checkpoint blocks
    * AFTER the decontamination anti-joins instead (same values on every
    * surviving row, and rows about to be dropped are never scored). */
  private[graft] def corpusBuildV2FromSurvivors(withSplit: DataFrame,
                                                budget: Long,
                                                materialize: Boolean = true): DataFrame =
    corpusBuildTail(withSplit, budget, materialize, v2MixStage)

  /** The v2 mixture: p06's sqrt temperature over per-language DOC
    * counts — the emergent flattening the stated-proportion v3 replaces. */
  private def v2MixStage(s3b: DataFrame): DataFrame = {
    val counts = s3b.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val nMin = counts.agg(min(col("n_lang")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("rate_bp", floor(lit(10000.0) *
        sqrt(col("n_min").cast("double") / col("n_lang").cast("double"))))
      .select(col("lang"), col("rate_bp"))
    s3b.join(broadcast(rates), Seq("lang"))
      .filter(Sampling.hashBucket(col("doc_id"), 10000) < col("rate_bp"))
  }

  /** The chain v2 and v3 share — decontamination anti-joins, map-side
    * quality scoring, then `mixStage` (THE stage the versions differ in:
    * p06's sqrt temperature vs p15's stated-proportion solve; one
    * definition here so a fix to the shared stages cannot silently leave
    * the other version stale), then the budget/pack/epoch tail. */
  private def corpusBuildTail(withSplit: DataFrame, budget: Long,
                              materialize: Boolean,
                              mixStage: DataFrame => DataFrame): DataFrame =
    corpusBuildTailFrom(decontaminatedScoredSurvivors(withSplit),
      budget, materialize, mixStage)

  /** The decontamination + scoring PREFIX of [[corpusBuildTail]] — every
    * stage up to (not including) the mixture, a pure function of the
    * survivors frame alone: p03 exact decontamination, p11 13-gram
    * decontamination, map-side quality scoring. Split out so the query
    * layer can memoize it ONCE per (session, dir) for both composed
    * builds ([[memoizedDecontamSurvivors]]) — v2 and v3 differ only from
    * the mixture on, and at 100 TB the decontaminated corpus is a
    * persisted inter-phase artifact exactly like the survivors frame,
    * not something each downstream build re-derives. */
  private[graft] def decontaminatedScoredSurvivors(withSplit: DataFrame): DataFrame = {
    val contaminated = Sampling
      .exactContamination(withSplit, "doc_id", "text", "split")
      .select(col("train_id").as("doc_id")).distinct()
    val s3 = withSplit.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    // p11 over the p03 survivors: spread=false — the input is one stage
    // of a composed plan, and the spread helper's partition-count read is
    // eager. Matches are bounded by the eval population; the dropped-id
    // set broadcasts like the other two.
    // No .distinct(): ngramContamination's per-train-doc aggregate already
    // emits unique ids — a redundant distinct after the rename would add a
    // doc_id-keyed exchange the ledger forbids.
    val gramContaminated = Sampling.ngramContamination(
        s3.select(col("doc_id"), col("text"), col("split")),
        "doc_id", "text", "split", n = 13, spread = false)
      .select(col("train_id").as("doc_id"))
    // Quality is computed over the deduped, fully decontaminated
    // survivors and carried through every later stage (budget and packing
    // preserve extra columns) — the epoch weights at the end must reflect
    // the corpus the pipeline actually admitted. Per-row pure in `text`
    // (n_tokens in the shared frame is the same TA.words count), so
    // attaching it here instead of before the split checkpoint changes no
    // value — it just scores map-side over the shared blocks and skips
    // rows the decontamination already dropped.
    s3.join(broadcast(gramContaminated), Seq("doc_id"), "left_anti")
      .withColumn("__ws", TA.words(col("text")))
      .withColumn("__n_uniq", size(array_distinct(col("__ws"))).cast("long"))
      .withColumn("__n_stop", TA.stopwordCount(col("__ws"), TA.StopEn))
      .withColumn("quality_bp",
        expr("""CAST(__n_uniq * 5000 DIV n_tokens
                     + (n_tokens - __n_stop) * 3000 DIV n_tokens
                     + least(n_tokens, 100L) * 20 AS BIGINT)"""))
      .drop("__ws", "__n_uniq", "__n_stop")
  }

  /** The mixture-onward SUFFIX of [[corpusBuildTail]]: `mixStage`, the
    * p07 budget, p02 packing, final labels, p12 epoch repeats. */
  private def corpusBuildTailFrom(s3b: DataFrame, budget: Long,
                                  materialize: Boolean,
                                  mixStage: DataFrame => DataFrame): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val s4 = mixStage(s3b)
    val s5 = cp(Sampling.tokenBudgetPerGroup(
        s4.select(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality_bp")),
        groupCol = "lang", keyCol = "doc_id", tokensCol = "n_tokens",
        budget = budget)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_bp")))
    val packed = Packing.packSequences(s5, "doc_id", "n_tokens", ctxLen = 2048L)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"),
        col("quality_bp"),
        Sampling.hashBucket(col("doc_id")).as("bucket"),
        Sampling.assignSplit(col("doc_id")).as("split"))
    Sampling.epochRepeat(packed, "doc_id", "quality_bp", maxEpochs = 4)
  }

  /** [[corpusBuildV2From]] with the mixture stage swapped: v3 of the
    * composed build, for the Stress harness's injected-corpus shape. */
  private[graft] def corpusBuildV3From(base: DataFrame, clusters: DataFrame,
                                       budget: Long,
                                       materialize: Boolean = true): DataFrame =
    corpusBuildV3FromSurvivors(
      dedupSurvivorsWithSplit(base, clusters, materialize), budget, materialize)

  /** v3 of the composed build: [[corpusBuildV2FromSurvivors]]'s chain with
    * the p06 sqrt-temperature mix replaced by p15's target-mixture solve
    * ([[Sampling.targetMixture]]) over TOKEN shares — every language is
    * admitted toward a STATED uniform 2000 bp share instead of the
    * emergent sqrt-flattened one (the DoReMi/stated-proportions recipe:
    * the training mixture is a declared input, reproducible from the spec
    * sheet, not a function the corpus counts happen to produce).
    *
    * The targets frame derives its language SET from the survivors
    * checkpoint (one cheap scan of the memoized artifact — not from the
    * decontaminated s3b, whose anti-join lineage would re-run just to list
    * languages) with the weight an explicit literal. If decontamination
    * wiped out a targeted language entirely, targetMixture's absent-group
    * guard fails loudly — a stated mixture over a language with zero
    * surviving tokens IS infeasible, same contract as p15 standalone.
    *
    * Shuffle-ledger delta vs v2: none. The solve replaces the doc-count
    * aggregate with a token-sum aggregate (both partial-aggregated to
    * |langs| rows), the closed form is arithmetic over that tiny frame,
    * and the admission stays a broadcast join + content-hash filter — the
    * corpus still never shuffles keyed on doc_id (Round10Spec pins the
    * ledger like Round7Spec does for v2). */
  private[graft] def corpusBuildV3FromSurvivors(withSplit: DataFrame,
                                                budget: Long,
                                                materialize: Boolean = true): DataFrame =
    corpusBuildTail(withSplit, budget, materialize, v3MixStage(withSplit))

  /** The v3 mixture: stated uniform token-share targets, solved by
    * targetMixture's closed form (binding language admits everything,
    * every other downsamples to proportion via the content-hash
    * Bernoulli — the same hashBucket convention p06 used, so only the
    * RATE computation changes between v2 and v3). The target language
    * SET comes from the SURVIVORS frame (one cheap scan of the memoized
    * artifact — not from s3b, whose anti-join lineage would re-run just
    * to list languages). */
  private def v3MixStage(survivors: DataFrame)(s3b: DataFrame): DataFrame = {
    val targets = survivors.select(col("lang")).distinct()
      .withColumn("weight_bp", lit(2000L))
    Sampling.targetMixture(s3b, "lang", "doc_id", "n_tokens", targets)
      .drop("rate_bp")
  }

  /** Round 6: the composed corpus build (see [[corpusBuild]]). */
  private def round6Queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p10_corpus_build" -> ((s, dir) => corpusBuild(s, dir)),

    // The v2 composed build (see [[corpusBuildV2FromSurvivors]]): p10 +
    // the round-7 admission ops (13-gram decontamination stage,
    // epoch-weighted repeat tail), over the SAME memoized survivors
    // artifact p10 reads.
    "p13_corpus_build_v2" -> ((s, dir) =>
      corpusBuildTailFrom(memoizedDecontamSurvivors(s, dir),
        budget = 3000L, materialize = true, v2MixStage)),

    // N-gram-overlap decontamination (13-gram, the GPT-3/PaLM recipe):
    // the third leak class beside p03 (byte-identical docs) and p05
    // (whole-doc near-dups) — an eval passage quoted inside a larger
    // train doc shares a 13-gram run without tripping either. Eval side
    // broadcast (curated benchmark suites are tiny at 100 TB; the
    // assignSplit-derived eval split here is a stand-in corpus).
    "p11_ngram_decontaminate" -> ((s, dir) => {
      val withSplit = docs(s, dir).withColumn("split",
        graft.operators.Sampling.assignSplit(col("doc_id")))
      graft.operators.Sampling
        .ngramContamination(withSplit, "doc_id", "text", "split", n = 13)
    }),

    // Epoch-weighted repeat sampling (the data-constrained-scaling
    // recipe): when the token budget exceeds the unique corpus, repeat
    // documents up to 4 epochs, better documents more often — the shared
    // t02/p08 quality score (integer basis points) is the weight, and the
    // fractional epoch is a content-hash Bernoulli. Map-only: no shuffle
    // anywhere in the plan (the fan-out is a scan-side explode).
    "p12_epoch_repeat" -> ((s, dir) =>
      graft.operators.Sampling.epochRepeat(
        qualityScored(docs(s, dir)).select(col("doc_id"), col("quality_bp")),
        "doc_id", "quality_bp", maxEpochs = 4))
  )

  /** Shared quality computation (t02, p08): integer basis points
    * (0..10000) because FP `round` disagrees between engines at
    * shortest-decimal boundaries (seen at sf0.1). The double variant
    * stays available as TextAnalysis.qualityScore. `extra` columns pass
    * through untouched (p08 keeps the stratum). */
  private def qualityScored(d: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val base = d.select(
      (col("doc_id") +: extra.map(col)) :+ TA.words(col("text")).as("ws"): _*)
    base.select(
      (col("doc_id") +: extra.map(col)) ++ Seq(
        size(col("ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("ws"))).cast("long").as("n_uniq"),
        TA.stopwordCount(col("ws"), TA.StopEn).as("n_stop")): _*)
      .withColumn("quality_bp",
        expr("""CAST(n_uniq * 5000 DIV n_tokens
                     + (n_tokens - n_stop) * 3000 DIV n_tokens
                     + least(n_tokens, 100L) * 20 AS BIGINT)"""))
  }

  private def primaryQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // ---- deduplication ----------------------------------------------------
    "d01_dedup_exact" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dup_count"))),

    "d02_dedup_keep_first" -> ((s, dir) => {
      // Partition the window by md5(text), not the text itself: the shuffle
      // key is 16 bytes instead of the whole document body (same collision
      // model as d01's hash-group dedup).
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      docs(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Exact within the capped buckets (hash-matched against DuckDB, whose
    // oracle applies the identical QUALIFY truncation): the shipped form
    // is skew-safe — see D03BucketCap. Served from the shared memoized
    // pair frame (detect once, report many).
    "d03_ngram_jaccard" -> ((s, dir) => dupPairsAndClusters(s, dir)._1),

    // MinHash-LSH near-dup detection with a DRIVER-VISIBLE recall claim
    // (round-11 conversion of the former no_oracle row): the full LSH
    // pipeline runs at threshold 0.5 (band candidacy + exact-Jaccard
    // verify), and the output enumerates every EXACT >= 0.8 pair (the
    // d03 blocked geometry, DuckDB-recomputable) with a per-pair
    // lsh_found flag the oracle pins at 1 — the DedupSpec recall=1 claim
    // as a hash gate. Per-pair (not aggregate) because banding collision
    // probability at j >= 0.8 with 16 bands × 4 rows is 1 − (1−j⁴)^16
    // ≈ 1 − 1e-13: full recall is the deterministic expectation
    // (measured 23/23, 24/24, 71/71 across SFs).
    "d04_minhash_lsh" -> ((s, dir) => {
      // Spread BEFORE the shingle+signature projection: a compact parquet
      // corpus scans as few partitions (one row group = one task) and the
      // per-row signature CPU would serialize on them; a many-partition
      // corpus passes through untouched (no gratuitous text shuffle).
      val base = Dedup.spreadToParallelism(docs(s, dir))
        .select(col("doc_id"),
          graft.functions.WordShingles.wordShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val mh = Dedup.minhashNearDups(base, "doc_id", "sh", threshold = 0.5)
        .select(col("a_id"), col("b_id")).distinct()
        .withColumn("lsh_found", lit(1L))
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", "n_chars",
          threshold = 0.8, maxBucketSize = Some(D03BucketCap))
        .join(mh, Seq("a_id", "b_id"), "left")
        .select(col("a_id"), col("b_id"), col("jaccard"),
          coalesce(col("lsh_found"), lit(0L)).as("lsh_found"))
    }),

    // SimHash near-dup detection, banded like d04 but with an AGGREGATE
    // floor: a 64-bit simhash at Hamming <= 3 is a coarser sketch than
    // 64-hash MinHash, so per-pair recall at j >= 0.9 is genuinely
    // partial — the DedupSpec claim is "finds at least half", measured
    // 78/61/72% across SFs. Payload rows enumerate the exact >= 0.9
    // pairs (DuckDB-recomputable); simhash_found_half is the aggregate
    // flag the oracle pins at 1.
    "d05_simhash_pairs" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), TA.words(col("text")).as("toks"))
      val sh = Dedup.simhashNearDups(base, "doc_id", "toks", maxHamming = 3)
        .select(col("a_id"), col("b_id")).distinct()
      val exact = Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        "n_chars", threshold = 0.9, maxBucketSize = Some(D03BucketCap))
      val hits = exact.select(col("a_id"), col("b_id"))
        .join(sh, Seq("a_id", "b_id"), "left_semi")
      val flag = exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(when(col("n_hit") * 2 >= col("n_exact"), lit(1L))
          .otherwise(lit(0L)).as("simhash_found_half"))
      exact.select(col("a_id"), col("b_id"), col("jaccard"))
        .crossJoin(broadcast(flag))
    }),

    // Duplicate CLUSTERS from d03's exact near-dup pairs: connected
    // components via distributed min-label propagation (cluster id =
    // smallest member). Oracle recomputes the same components with a
    // recursive CTE over the same pair set.
    "d07_dup_clusters" -> ((s, dir) => dupPairsAndClusters(s, dir)._2),

    // Apply the dedup decision end-to-end: detect (d03 pairs) → cluster
    // (d07 components) → DROP every non-keeper member, emitting the
    // surviving corpus. The anti join is a hash equi-join on doc_id; the
    // drop set is tiny relative to the corpus (near-dup clusters), so at
    // scale it broadcasts.
    "d09_dedup_apply" -> ((s, dir) => {
      val clusters = dupPairsAndClusters(s, dir)._2
      val drops = clusters.filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"))
      docs(s, dir).join(drops, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Embedding-cosine near-duplicate detection: LSH-bucketed candidate
    // generation (equi-join on (table, bucket), no all-pairs theta join)
    // with exact cosine verification; lower vec_id kept as the canonical
    // representative. True near-dup detection needs true near-dups and the
    // synthetic embeddings have no high-cosine twins (max pair ≈ 0.6), so
    // the corpus is augmented with deterministic perturbed copies of the
    // first 25 vectors (ids +100000, per-coordinate scaling ±3% → cosine
    // ≈ 0.9996 to the original). The oracle applies the identical
    // augmentation, so the bucketed pipeline is checked hash-exact against
    // DuckDB's all-pairs SQL.
    "d06_embedding_dedup" -> ((s, dir) => {
      val base = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val aug = Dedup.withPlantedNearDups(base, "vec_id", "v",
        pred = col("vec_id") < 25, idOffset = 100000L)
      Dedup.embeddingNearDups(aug, "vec_id", "v", threshold = 0.9)
        .select(col("a_id").as("keeper"), col("b_id").as("dup"),
          col("cos").as("similarity"))
    }),

    // Index-probing delta dedup for the VECTOR geometry (d13/d14/d17's
    // embedding twin): a pinned ingest batch — the d06 perturbation of
    // vec_id < 25, ids offset out of corpus range — probes the standing
    // corpus LshVecIndex (memoized per dir; buckets scan-side, exact
    // cosine verify against stored vectors). Probe cost tracks the
    // batch, never corpus². The oracle is the exact batch x corpus
    // cosine join (the d06 convention: LSH recall at >= 0.9 cosine is
    // effectively 1, which the hash compare itself verifies).
    "d18_delta_embedding_dedup" -> ((s, dir) => {
      val base = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val index = Dedup.memoizedLshVecIndex(base, "vec_id", "v",
        cacheKey = dir + "#vecidx")
      val batch = base.filter(col("vec_id") < 25)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("v"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 7) - lit(3)))).as("v"))
      Dedup.deltaEmbeddingNearDups(batch, index, threshold = 0.9)
    }),

    // Chunk-level exact-substring dedup (see Dedup.chunkDedup for the
    // skew-safe keep-first shape).
    "d08_chunk_dedup" -> ((s, dir) =>
      Dedup.chunkDedup(docs(s, dir), "doc_id", "text", chunkTokens = 16)),

    // Deterministic stratified sampling: the k docs whose id-hash sorts
    // lowest within each (lang, source) stratum — uniform-without-
    // replacement per stratum, reproducible across engines and cluster
    // layouts (no rand()).
    "p04_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.samplePerGroup(
        docs(s, dir).select(col("doc_id"), col("lang"), col("source")),
        Seq("lang", "source"), "doc_id", k = 5)),

    // ---- similarity search ------------------------------------------------
    "s01_cosine_topk" -> ((s, dir) =>
      SimilaritySearch.bruteForceTopK(emb(s, dir), "vec_id", "embedding",
        isQuery = col("vec_id") < 10, k = 5)),

    "s02_cosine_threshold" -> ((s, dir) =>
      SimilaritySearch.thresholdPairs(emb(s, dir), "vec_id", "embedding",
        threshold = 0.4)),

    // LSH ANN with a DRIVER-VISIBLE recall band (round-11 conversion of
    // the former no_oracle row): the query runs the full LSH plan AND the
    // exact brute-force twin, emits the exact top-3 list per query (rank-
    // order csv — DuckDB recomputes it verbatim) plus an aggregate
    // recall_floor_met flag the oracle pins at 1. Floor 20% — measured
    // 27/43/37% at sf0.001/0.01/0.1 on these near-uniform synthetic
    // vectors (a hard case: tiny neighbour margins; DedupSpec carries the
    // >= 0.8 bound on planted-cluster structure, where recall is the
    // meaningful claim).
    "s03_ann_lsh" -> ((s, dir) => {
      val ann = SimilaritySearch.annTopK(emb(s, dir), "vec_id", "embedding",
        isQuery = col("vec_id") < 10, k = 3)
      val exact = SimilaritySearch.bruteForceTopK(emb(s, dir), "vec_id",
        "embedding", isQuery = col("vec_id") < 10, k = 3)
      SimilaritySearch.recallBand(exact, ann, floorBp = 2000)
    }),

    // Index keyed on the corpus directory: built once per JVM (fit on the
    // coarse-quantizer sample, assignments cached), probed per call.
    // Banded oracle like s03; floor 40% (measured 53/63/60% across SFs).
    "s04_ann_ivf" -> ((s, dir) => {
      val ivf = SimilaritySearch.ivfTopK(emb(s, dir), "vec_id", "embedding",
        isQuery = col("vec_id") < 10, k = 3, cacheKey = Some(dir))
      val exact = SimilaritySearch.bruteForceTopK(emb(s, dir), "vec_id",
        "embedding", isQuery = col("vec_id") < 10, k = 3)
      SimilaritySearch.recallBand(exact, ivf, floorBp = 4000)
    }),

    // s04's two-level (hierarchical coarse quantizer) twin — the build
    // whose cell ASSIGNMENT is n·2√nCells instead of n·nCells, the fix
    // for the one superlinear build-side curve in the round-10 stress
    // sweep (under the IVF sizing rule nCells ∝ corpus, flat assignment
    // is ∝ n²). Identical IvfIndex artifact and probe path; memoized
    // under a "#hier"-suffixed key. No SQL oracle — KMeans isn't
    // expressible in DuckDB (the s03/s04/s05 convention); HierIvfSpec
    // recomputes every assignment driver-side bit-exactly and bounds
    // probe recall vs exact s01 instead.
    // Banded oracle like s03/s04; floor 50% (measured 87/67/87% across
    // SFs — the HierIvfSpec floor at nProbe=8, now driver-visible).
    "s11_ivf_hier" -> ((s, dir) => {
      val hier = SimilaritySearch.ivfTopK(emb(s, dir), "vec_id", "embedding",
        isQuery = col("vec_id") < 10, k = 3, nProbe = 8,
        cacheKey = Some(dir), hier = true)
      val exact = SimilaritySearch.bruteForceTopK(emb(s, dir), "vec_id",
        "embedding", isQuery = col("vec_id") < 10, k = 3)
      SimilaritySearch.recallBand(exact, hier, floorBp = 5000)
    }),

    // SemDeDup-style semantic dedup: IVF-cluster the corpus (memoized
    // index — no KMeans refit per call), within-cluster cosine pairs only,
    // drop to the lowest-id keeper. Corpus augmented with the same planted
    // near-dups as d06 so there is something to drop. Round-11 oracle
    // conversion: at threshold 0.95 the synthetic corpus has NO natural
    // pairs (max natural cosine ≈ 0.6), so the full drop set is exactly
    // the planted construction — every copy dropped with its original as
    // keeper — and the oracle recomputes that construction verbatim. The
    // hash compare is therefore the DedupSpec claim (planted recall = 1,
    // zero false drops) made driver-visible; a 0.9996-cosine twin landing
    // in a different KMeans cell would fail it loudly.
    "s05_semantic_dedup" -> ((s, dir) => {
      val base = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val aug = Dedup.withPlantedNearDups(base, "vec_id", "v",
        pred = col("vec_id") < 25, idOffset = 100000L)
      val index = SimilaritySearch.memoizedIvfIndex(
        aug, "vec_id", "v", nCells = 16, cacheKey = dir + "#aug")
      SimilaritySearch.semanticDedup(index, threshold = 0.95)
        .filter(!col("keep"))
        .select(col("vec_id").as("dup_id"), col("keeper"))
    }),

    // Symmetric int8 quantization of the embedding column — the standard
    // vector-store compression step (scale = max|x|, code = floor(127·x/s)).
    // Map-only, one pass, no shuffle; codes are summarized as integer stats
    // so the oracle compares exactly (floor of identically-computed doubles
    // is engine-stable, unlike half-way rounding). maxabs is computed in a
    // SEPARATE projection: referencing it inside the code lambda would
    // re-evaluate the array_max per element (the HOF re-evaluation trap).
    "s06_quantize" -> ((s, dir) => {
      // Codes clamp at -127: for x = -maxabs the double arithmetic can land
      // one ulp below -127 and floor to -128, outside the symmetric int8
      // range the contract promises. Empty vectors are excluded up front —
      // Spark's aggregate(.., 0L, ..) and DuckDB's list_sum([]) (NULL)
      // disagree on them.
      val base = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .filter(size(col("v")) > 0)
        .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      base
        .withColumn("codes",
          when(col("maxabs") === 0d,
            transform(col("v"), _ => lit(0L)))
          .otherwise(
            transform(col("v"),
              x => greatest(floor(x * lit(127.0) / col("maxabs")).cast("long"), lit(-127L)))))
        .select(col("vec_id"),
          floor(col("maxabs") * 10000).cast("long").as("scale_fp"),
          expr("aggregate(codes, 0L, (a, x) -> a + x)").as("code_sum"),
          expr("aggregate(codes, 0L, (a, x) -> a + abs(x))").as("code_l1"),
          array_min(col("codes")).as("code_min"),
          array_max(col("codes")).as("code_max"))
    }),

    // ---- multimodal (binary payload metadata; decode is stubbed) ----------
    "m01_binary_meta" -> ((s, dir) => {
      val media = encode(col("text"), "UTF-8")
      docs(s, dir).select(
        col("doc_id"),
        length(media).cast("long").as("byte_len"),
        sha2(media, 256).as("sha"))
    }),

    // Per-source binary storage accounting (the capacity-planning query of
    // a multimodal corpus): payload volume, largest object, and the
    // share of oversized payloads, in one map-side-partial aggregate.
    "m03_payload_stats" -> ((s, dir) => {
      val media = encode(col("text"), "UTF-8")
      docs(s, dir)
        .select(col("source"), length(media).cast("long").as("bytes"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bytes")).as("total_bytes"),
          max(col("bytes")).as("max_bytes"),
          sum(when(col("bytes") > 1024, 1L).otherwise(0L)).as("n_over_1k"))
    }),

    // Frame sampling over the binary media table: every 4th 64-byte chunk,
    // one output row per sampled frame (the explode-shaped demux contract).
    // Frames are reported by md5 so the oracle can compare payload bytes as
    // scalars (the corpus is ASCII, so DuckDB's character substr sees the
    // same bytes Spark slices).
    "m02_frame_sample" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.asMediaTable(docs(s, dir))
      graft.multimodal.Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
        .toDF()
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(col("frame")).as("frame_md5"))
    }),

    // ---- dataset assembly ------------------------------------------------
    // Deterministic content-hash split: stable across runs/engines/cluster
    // sizes (no rand(), no placement dependence).
    "p01_hash_split" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"),
        graft.operators.Sampling.assignSplit(col("doc_id")).as("split"))),

    // Concat-and-chunk sequence packing via the distributed prefix scan.
    "p02_pack_sequences" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.Packing.packSequences(base, "doc_id", "n_tokens", ctxLen = 2048L)
        .select(col("doc_id"), col("n_tokens"), col("pack_id"))
    }),

    // Train/eval decontamination. The corpus has no byte-identical dup
    // pairs, so (like d06) it is augmented with exact copies of the first
    // 50 docs under new ids — their independent hash-split assignments put
    // some copies in eval splits while the original trains, which is
    // precisely the leak this op detects. Oracle applies the identical
    // augmentation.
    "p03_decontamination" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val aug = base.unionAll(
        base.filter(col("doc_id") < 50)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")))
      val withSplit = aug.withColumn("split",
        graft.operators.Sampling.assignSplit(col("doc_id")))
      graft.operators.Sampling
        .exactContamination(withSplit, "doc_id", "text", "split")
    }),

    // NEAR-duplicate decontamination: the near-dup analogue of p03 — a
    // training document whose near-duplicate (exact n-gram Jaccard >= 0.2,
    // d03's similarity) lands in an eval split is a fuzzy leak.
    //
    // Decontamination is RECALL-critical, so unlike the dedup reports this
    // path must not inherit D03BucketCap truncation (a leaked pair whose
    // doc ranks past the cap in a hot length bucket would go silently
    // unreported — a missed train/eval leak is worse than extra compute).
    // Cross-split pairs are exactly the delta×corpus shape: the eval side
    // is a small fixed fraction of the corpus (~20% under assignSplit, and
    // a curated sliver in practice), so the per-bucket join is
    // |train_bkt|×|eval_bkt| — bounded by the eval population, never the
    // uncapped self-join's quadratic bucket². At 100 TB the same query
    // swaps deltaJaccardPairs for the MinHash index probe
    // (Dedup.deltaNearDupsIndexed) — identical downstream shape.
    "p05_near_decontamination" -> ((s, dir) => {
      val splits = docs(s, dir).withColumn("split",
        graft.operators.Sampling.assignSplit(col("doc_id")))
      val evalSide = splits.filter(col("split") =!= "train")
      val trainSide = splits.filter(col("split") === "train")
      Dedup.deltaJaccardPairs(evalSide, trainSide, "doc_id", "text",
          "n_chars", threshold = 0.2, maxBucketSize = None)
        .join(evalSide.select(col("doc_id").as("new_id"),
          col("split").as("eval_split")), Seq("new_id"))
        .select(col("old_id").as("train_id"), col("new_id").as("eval_id"),
          col("eval_split"), col("jaccard"))
    }),

    // Temperature-flattened mixture sampling (the multinomial-sampling step
    // of multi-source training sets), flattening the skewed language
    // distribution: per-stratum keep rate ∝ sqrt(n_min/n_s) (α = 0.5),
    // applied as a deterministic content-hash Bernoulli — so the mix is
    // reproducible and any doc's fate is placement-independent. The stratum
    // histogram is tiny (broadcast); the corpus streams through one filter.
    // floor(10000·sqrt(r)) is engine-stable: IEEE division and sqrt are
    // correctly rounded in both Spark and DuckDB.
    "p06_temperature_mix" -> ((s, dir) => {
      val counts = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_lang"))
      val nMin = counts.agg(min(col("n_lang")).as("n_min"))
      val rates = counts.crossJoin(broadcast(nMin))
        .withColumn("rate_bp",
          floor(lit(10000.0) * sqrt(col("n_min").cast("double") / col("n_lang").cast("double"))))
      docs(s, dir).select(col("doc_id"), col("lang"))
        .join(broadcast(rates), Seq("lang"))
        .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 10000) < col("rate_bp"))
        .select(col("doc_id"), col("lang"), col("n_lang"), col("rate_bp"))
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
    })
  )

  /** Round 5: incremental (delta-vs-corpus) dedup — the ingest-batch shape.
    * The 10%-of-ids slice `doc_id % 10 = 7` plays the incoming batch; the
    * other 90% is the standing corpus. */
  private def round5Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact delta dedup: drop every incoming doc with a same-length-bucket
    // Jaccard >= 0.2 twin in the corpus; emit the batch's survivors. The
    // delta x corpus join is bounded by the batch size, never corpus² —
    // this is the operator an ingest pipeline actually runs at 100 TB
    // (d01/d03 re-examine the whole corpus; this examines one batch).
    "d13_delta_dedup" -> ((s, dir) => {
      val all = docs(s, dir)
      val delta = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val matched = Dedup.deltaJaccardPairs(delta, corpus, "doc_id", "text",
          "n_chars", threshold = 0.2, maxBucketSize = Some(D03BucketCap))
        .select(col("new_id").as("doc_id")).distinct()
      delta.join(matched, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Index-probing delta dedup (the sketch scale path): the corpus is
    // represented ONLY by its memoized MinHash band index (built once per
    // (session, dir), parquet save/load for the offline cycle); the batch
    // probes it and verifies candidates against stored signatures — the
    // corpus text is never read on the probe path. No SQL oracle
    // (signature estimation isn't expressible in DuckDB); Round5Spec
    // bounds recall/precision against the exact d13 pair set.
    // Round-11 banded conversion (the d04 shape on the delta geometry):
    // the batch probes the standing MinHash index at threshold 0.5, and
    // the output enumerates every exact j >= 0.9 batch×corpus pair (no
    // length blocking — DuckDB recomputes the full cross Jaccard) with a
    // per-pair index_found flag pinned at 1. Full recall is the
    // deterministic expectation (Round5Spec: the cross-slice near-dups
    // sit at j >= 0.96, where band collision ≈ 1 and the 64-hash
    // estimate cannot fall below 0.5; measured 4/4, 6/6, 45/45 across
    // SFs).
    "d14_delta_minhash" -> ((s, dir) => {
      val withSh = Dedup.spreadToParallelism(docs(s, dir))
        .select(col("doc_id"), pmod(col("doc_id"), lit(10)).as("m"),
          graft.functions.WordShingles.wordShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val delta = withSh.filter(col("m") === 7).select(col("doc_id"), col("sh"))
      val corpus = withSh.filter(col("m") =!= 7).select(col("doc_id"), col("sh"))
      val idx = Dedup.memoizedMinHashIndex(corpus, "doc_id", "sh",
        cacheKey = dir + "#mhidx")
      val probed = Dedup.deltaNearDupsIndexed(delta, idx, "doc_id", "sh",
          threshold = 0.5)
        .select(col("new_id"), col("old_id")).distinct()
        .withColumn("index_found", lit(1L))
      val all = docs(s, dir)
      Dedup.deltaJaccardPairs(
          all.filter(pmod(col("doc_id"), lit(10)) === 7),
          all.filter(pmod(col("doc_id"), lit(10)) =!= 7),
          "doc_id", "text", "n_chars", threshold = 0.9,
          lengthBucketWidth = Int.MaxValue)
        .join(probed, Seq("new_id", "old_id"), "left")
        .select(col("new_id"), col("old_id"), col("jaccard"),
          coalesce(col("index_found"), lit(0L)).as("index_found"))
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

    // Cross-media copy detection: media pairs sharing sampled-frame
    // fingerprints (m02's demux + the dedup family's hash-equi-join
    // discipline; boilerplate frames capped out before the self-join).
    "m04_frame_overlap" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.asMediaTable(docs(s, dir))
      val frames = graft.multimodal.Multimodal
        .sampleFrames(media, frameBytes = 64, stride = 4).toDF()
        .select(col("doc_id"), md5(col("frame")).as("frame_md5"))
      graft.multimodal.Multimodal.frameOverlap(frames, "doc_id", "frame_md5")
    })
  )

  /** Round-4 additions, split out so the primary map literal stays under
    * scalac's method-size comfort zone. */
  private def round4Queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-language token-budget selection (the "sample 1B tokens per
    // language" step of corpus assembly): admit docs in deterministic
    // hash order until each language's budget is spent. One shuffle on
    // lang; the running sum shares it.
    "p07_token_budget" -> ((s, dir) =>
      graft.operators.Sampling.tokenBudgetPerGroup(
        docs(s, dir).select(col("doc_id"), col("lang"),
          size(TA.words(col("text"))).cast("long").as("n_tokens")),
        groupCol = "lang", keyCol = "doc_id", tokensCol = "n_tokens",
        budget = 3000L)),

    // Maximum-inner-product top-k (dot-product retrieval; see
    // SimilaritySearch.mipsTopK for the norm-augmentation scale path).
    "s07_mips_topk" -> ((s, dir) =>
      SimilaritySearch.mipsTopK(emb(s, dir), "vec_id", "embedding",
        isQuery = col("vec_id") < 10, k = 5)),

    // Approximate MIPS: norm-augmentation reduction + LSH bucketing +
    // exact dot-product verify (the sublinear path whose exact twin is
    // s07). Round-11 banded oracle (the s03 shape on the inner-product
    // ranking): exact top-3 by raw inner product per query as the
    // payload, aggregate recall floor 20% (measured 37/43/27% across SFs
    // on the near-uniform corpus; Round4Spec carries the >= 0.8 bound on
    // planted high-IP structure). cacheKey memoizes the MipsIndex (the
    // corpus max norm) per (session, dir): the probe path itself runs
    // zero driver actions.
    "s09_ann_mips" -> ((s, dir) => {
      val ann = SimilaritySearch.annMipsTopK(emb(s, dir), "vec_id", "embedding",
        isQuery = col("vec_id") < 10, k = 3, cacheKey = Some(dir))
      val exact = SimilaritySearch.mipsTopK(emb(s, dir), "vec_id", "embedding",
        isQuery = col("vec_id") < 10, k = 3)
      SimilaritySearch.recallBand(exact, ann, floorBp = 2000)
    }),

    // IVF-PQ: the coarse quantizer prunes to nProbe cells, product-
    // quantized code words (16 small ints per vector vs 64 floats) score
    // the survivors by ADC table lookups — the memory-and-cost-compressed
    // production ANN shape (both index halves memoized per (session,
    // dir)). Corpus augmented with byte-identical twins of the queries so
    // the approximate path has a deterministic signal: Round10Spec proves
    // every twin ranks top-1 and bounds raw-corpus recall vs exact s01.
    // Round-11 driver-visible form: one row per query claiming its twin
    // appears in the IVF-PQ top-3 — deterministic because a byte-
    // identical twin gets identical PQ codes (minimal ADC distance) and
    // an identical cell assignment (the query's own-cell probe always
    // covers it); the oracle recomputes the twin construction and pins
    // twin_in_top3 at 1 (measured 10/10 at every SF). Sized m=8/k=64
    // here (the twin signal is codebook-size-invariant — identical inputs
    // get identical codes at any k — and the warmup index build is 8x
    // cheaper); Round10Spec carries the full m=16/k=256 recall evidence.
    "s10_ivf_pq" -> ((s, dir) => {
      val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      SimilaritySearch.ivfPqTopK(base.unionByName(twins), "vec_id",
          "embedding", isQuery = col("vec_id") < 10, k = 3,
          nCells = 16, nProbe = 8, m = 8, kCodes = 64,
          cacheKey = Some(dir + "#pqtwin"))
        .groupBy(col("q_id"))
        .agg(max(when(col("n_id") === col("q_id") + 100000L, lit(1L))
          .otherwise(lit(0L))).as("twin_in_top3"))
        .select(col("q_id"), (col("q_id") + 100000L).as("twin_id"),
          col("twin_in_top3"))
    }),

    // Corpus top-50 bigrams: the n-gram census a contamination or
    // memorization audit starts from. Scan-side codegen'd shingling, one
    // hash aggregate, distributed TakeOrdered.
    "t12_bigram_topk" -> ((s, dir) =>
      TA.ngramTopK(docs(s, dir), "text", n = 2, k = 50)
        .select(col("ngram").as("bigram"), col("n"))),

    // Curriculum binning: quality quartiles within each language stratum
    // (the ordering step of curriculum/annealing data schedules). ntile
    // over a total order (quality desc, id) — engine-portable because no
    // peer ties can straddle a bin boundary.
    "p08_curriculum_bins" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality_bp").desc, col("doc_id"))
      qualityScored(docs(s, dir), extra = Seq("lang"))
        .select(col("doc_id"), col("lang"), col("quality_bp"),
          ntile(4).over(w).cast("long").as("bin"))
    }),

    // Metadata-filtered vector search: top-k within the query's label
    // group; the filter is the hash-join key, not a post-filter (see
    // SimilaritySearch.filteredTopK).
    "s08_filtered_topk" -> ((s, dir) =>
      SimilaritySearch.filteredTopK(emb(s, dir), "vec_id", "embedding",
        filterCol = "label", isQuery = col("vec_id") < 10, k = 5)),

    // Overlapping token windows (64 tokens, stride 48 — 25% overlap): the
    // chunking step before embedding or context assembly. Map-only:
    // sequence + posexplode + slice run scan-side, no shuffle at all.
    "p09_chunk_windows" -> ((s, dir) => {
      val ws = filter(TA.words(col("text")), w => w =!= "")
      docs(s, dir)
        .select(col("doc_id"), ws.as("ws"))
        .filter(size(col("ws")) >= 1)
        .select(col("doc_id"), col("ws"),
          posexplode(sequence(lit(1), size(col("ws")), lit(48)))
            .as(Seq("win_idx", "win_start")))
        .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
          col("win_start").cast("long").as("win_start"),
          size(slice(col("ws"), col("win_start"), lit(64))).cast("long").as("win_len"),
          md5(concat_ws(" ", slice(col("ws"), col("win_start"), lit(64)))).as("win_md5"))
    }),

    // Cross-source duplication matrix: for every unordered source pair,
    // how many near-dup pairs straddle it (who copies from whom). Reuses
    // the d03 pair set; two broadcast-size id->source joins + one
    // aggregate.
    "d11_source_overlap" -> ((s, dir) => {
      val pairs = dupPairsAndClusters(s, dir)._1
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), Seq("a_id"))
        .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), Seq("b_id"))
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
                 greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // Quality-aware keeper election: within each near-dup cluster, keep
    // the HIGHEST-QUALITY member (production dedup keeps the best copy,
    // not the lowest id). Clusters from d07's components; quality is
    // t02's shared integer score; the per-cluster argmax runs through the
    // custom GroupTopK operator (k=1 per cluster — the map side reduces
    // each cluster to one candidate per partition before the shuffle).
    "d12_quality_keeper" -> ((s, dir) => {
      val clusters = dupPairsAndClusters(s, dir)._2
      val quality = qualityScored(docs(s, dir))
        .select(col("doc_id").as("id"), col("quality_bp"))
      val members = clusters.join(quality, Seq("id"))
      graft.plans.GroupTopK.topK(members, groupCols = Seq("cluster"),
          orderBy = Seq(col("quality_bp").desc, col("id")), k = 1)
        .select(col("cluster"), col("id").as("keeper_id"),
          col("quality_bp").as("keeper_quality"))
        .join(clusters.groupBy(col("cluster")).agg(count(lit(1)).as("n_members")),
          Seq("cluster"))
    }),

    // Per-source duplication report: what fraction of each source's docs
    // are non-keeper members of a near-dup cluster (d03 pairs → d07
    // components → left join + conditional count). The measurement that
    // decides whether a source needs dedup before mixing.
    "d10_dup_rate" -> ((s, dir) => {
      val dups = dupPairsAndClusters(s, dir)._2
        .filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"), lit(1L).as("is_dup"))
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(dups, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dups"))
        .select(col("source"), col("n_docs"), col("n_dups"),
          expr("n_dups * 10000 DIV n_docs").as("dup_rate_bp"))
    })
  )

  /** d03's oracle, shared: d07's recursive-CTE components run over exactly
    * this pair set so the two can never drift apart. The QUALIFY mirrors
    * the engine's [[D03BucketCap]] truncation (first 256 docs per length
    * bucket by id, ranked over the same ≥3-word population) so the
    * skew-safe shipped form stays hash-exact. */
  /** The d03 exact blocked-Jaccard pair SQL at an arbitrary threshold —
    * shared by d03 (0.2) and the round-11 band payloads d04 (0.8) /
    * d05 (0.9), so the engine and every banded claim compute pairs over
    * ONE geometry. */
  private def d03SqlAt(threshold: String): String =
    s"""WITH w AS (SELECT doc_id, n_chars // 50 AS bkt,
                         list_filter(string_split(text, ' '), t -> t <> '') AS ws
                  FROM documents),
            s AS (SELECT doc_id, bkt,
                         list_distinct(list_transform(generate_series(1, len(ws) - 2),
                           i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
                  FROM w WHERE len(ws) >= 3
                  QUALIFY row_number() OVER (PARTITION BY bkt ORDER BY doc_id) <= $D03BucketCap)
       SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE), 4) AS jaccard
       FROM s a JOIN s b ON a.bkt = b.bkt AND a.doc_id < b.doc_id
       WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= $threshold"""

  private val D03Sql: String = d03SqlAt("0.2")

  /** Connected components over [[D03Sql]]'s pair set as recursive CTEs
    * ending in `comp(id, cluster)` — shared by d07 (which emits it) and
    * d09 (which anti-joins it away), so the two oracles can never compute
    * different clusters. Embed as `WITH RECURSIVE $ComponentsCte ...`. */
  private val ComponentsCte: String =
    s"""sym AS (
            SELECT a_id AS id, b_id AS nb FROM ($D03Sql) p
            UNION
            SELECT b_id AS id, a_id AS nb FROM ($D03Sql) p2),
          reach AS (
            SELECT id, nb FROM sym
            UNION
            SELECT r.id, s.nb FROM reach r JOIN sym s ON r.nb = s.id),
          comp AS (SELECT id, least(id, min(nb)) AS cluster FROM reach GROUP BY id)"""

  /** d13's oracle: the same per-side length-bucket blocking, per-side
    * QUALIFY cap, and exact trigram Jaccard as [[Dedup.deltaJaccardPairs]],
    * with `doc_id % 10 = 7` as the incoming batch. */
  private val D13Sql: String =
    s"""WITH w AS (SELECT doc_id, n_chars // 50 AS bkt, doc_id % 10 = 7 AS is_new,
                          list_filter(string_split(text, ' '), t -> t <> '') AS ws
                   FROM documents),
             s AS (SELECT doc_id, bkt, is_new,
                          list_distinct(list_transform(generate_series(1, len(ws) - 2),
                            i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
                   FROM w WHERE len(ws) >= 3
                   QUALIFY row_number() OVER (PARTITION BY bkt, is_new ORDER BY doc_id) <= $D03BucketCap),
             m AS (SELECT DISTINCT a.doc_id AS new_id
                   FROM s a JOIN s b ON a.bkt = b.bkt AND a.is_new AND NOT b.is_new
                   WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                         / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= 0.2)
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id % 10 = 7 AND doc_id NOT IN (SELECT new_id FROM m)"""

  /** Shared exact-top-3 band payload for the ANN cosine family
    * (s03/s04/s11): DuckDB recomputes the exact twin verbatim (the s01
    * ranking at k=3, rank-order csv) and pins recall_floor_met at 1 —
    * the engine computes its own flag from its approximate plan. */
  private val AnnCosBandSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
            scored AS (SELECT q_id, e.vec_id AS n_id,
                              list_inner_product(qv, e.v)
                              / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(e.v, e.v))) AS cos
                       FROM q JOIN e ON e.vec_id <> q_id),
            ranked AS (SELECT q_id, n_id,
                              row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
                       FROM scored)
       SELECT q_id, string_agg(CAST(n_id AS VARCHAR), ',' ORDER BY rnk) AS exact_ids,
              CAST(1 AS BIGINT) AS recall_floor_met
       FROM ranked WHERE rnk <= 3 GROUP BY q_id"""

  val oracleSql: Map[String, String] = Map(
    // ---- round-11 banded conversions of the former no_oracle rows ----
    "s03_ann_lsh" -> AnnCosBandSql,
    "s04_ann_ivf" -> AnnCosBandSql,
    "s11_ivf_hier" -> AnnCosBandSql,
    // s09: the same band over the INNER-PRODUCT ranking (s07's order).
    "s09_ann_mips" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
              scored AS (SELECT q_id, e.vec_id AS n_id,
                                list_inner_product(qv, e.v) AS ip
                         FROM q JOIN e ON e.vec_id <> q_id),
              ranked AS (SELECT q_id, n_id,
                                row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, n_id) AS rnk
                         FROM scored)
         SELECT q_id, string_agg(CAST(n_id AS VARCHAR), ',' ORDER BY rnk) AS exact_ids,
                CAST(1 AS BIGINT) AS recall_floor_met
         FROM ranked WHERE rnk <= 3 GROUP BY q_id""",
    // s10: the planted byte-identical twin construction, twin-in-top-3
    // pinned at 1 (identical PQ codes => minimal ADC distance; identical
    // cell => always probed).
    "s10_ivf_pq" ->
      """SELECT CAST(vec_id AS BIGINT) AS q_id,
                CAST(vec_id + 100000 AS BIGINT) AS twin_id,
                CAST(1 AS BIGINT) AS twin_in_top3
         FROM embeddings WHERE vec_id < 10""",
    // s05: at threshold 0.95 the corpus has no natural pairs (max
    // natural cosine ~ 0.6), so the semantic-dedup drop set IS the
    // planted construction — recomputed verbatim here. The hash compare
    // is the planted-recall-1 / zero-false-drops claim.
    "s05_semantic_dedup" ->
      """SELECT CAST(vec_id + 100000 AS BIGINT) AS dup_id,
                CAST(vec_id AS BIGINT) AS keeper
         FROM embeddings WHERE vec_id < 25""",
    // d04: every exact >= 0.8 pair (the d03 geometry), lsh_found pinned
    // at 1 — full recall is the deterministic expectation at 16x4 bands.
    "d04_minhash_lsh" ->
      s"""SELECT a_id, b_id, jaccard, CAST(1 AS BIGINT) AS lsh_found
          FROM (${d03SqlAt("0.8")}) t""",
    // d05: exact >= 0.9 pairs as payload; the found-at-least-half claim
    // is the aggregate flag, pinned at 1.
    "d05_simhash_pairs" ->
      s"""SELECT a_id, b_id, jaccard, CAST(1 AS BIGINT) AS simhash_found_half
          FROM (${d03SqlAt("0.9")}) t""",
    // d14: exact batch x corpus pairs at j >= 0.9, no length blocking
    // (mirrors deltaJaccardPairs with lengthBucketWidth = MaxValue);
    // index_found pinned at 1 per the Round5Spec determinism argument.
    "d14_delta_minhash" ->
      """WITH w AS (SELECT doc_id, doc_id % 10 = 7 AS is_new,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              s AS (SELECT doc_id, is_new,
                           list_distinct(list_transform(generate_series(1, len(ws) - 2),
                             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
                    FROM w WHERE len(ws) >= 3)
         SELECT a.doc_id AS new_id, b.doc_id AS old_id,
                round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                      / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE), 4) AS jaccard,
                CAST(1 AS BIGINT) AS index_found
         FROM s a JOIN s b ON a.is_new AND NOT b.is_new
         WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= 0.9""",
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
    // BYTE-vs-CHAR coupling: the engine (Multimodal.sampleFrames) slices
    // the UTF-8 BYTE payload into 64-byte frames; this oracle slices
    // CHARACTERS (substr over text) because DuckDB 1.0 cannot substring a
    // BLOB. The two agree iff the corpus is pure ASCII (1 byte = 1 char) —
    // asserted by Round6Spec."m04 oracle ASCII assumption" against the
    // test corpus, and guarded here by the octet_length-based frame count
    // (which would disagree with a char-based count on any non-ASCII doc).
    "m04_frame_overlap" ->
      """WITH f AS (SELECT doc_id, text,
                           unnest(generate_series(0, octet_length(encode(text)) // 64 - 1)) AS i
                    FROM documents),
              s AS (SELECT doc_id, md5(substr(text, i * 64 + 1, 64)) AS frame_md5
                    FROM f WHERE i % 4 = 0),
              d AS (SELECT DISTINCT doc_id, frame_md5 FROM s),
              keep AS (SELECT frame_md5 FROM d GROUP BY 1
                       HAVING count(*) BETWEEN 2 AND 16),
              k AS (SELECT d.doc_id, d.frame_md5 FROM d
                    JOIN keep USING (frame_md5))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
         FROM k a JOIN k b ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    // m05: same frame slicing (and the m04 ASCII coupling note), but the
    // fingerprint is the 63-comparison gradient-sign dHash — bit i-1 set
    // iff char i > char i+1, summed as shifted BIGINTs (DuckDB's `<<`,
    // never power(): doubles lose bits past 2^53). The planted re-encodes
    // (doc_id+100000 for doc_id < 40) hash the ORIGINAL text: the +1 byte
    // shift the engine applies is monotone, so dHash equality with the
    // unshifted mirror IS the perceptual-invariance claim under test.
    "m05_perceptual_overlap" ->
      """WITH f AS (SELECT doc_id, text,
                           unnest(generate_series(0, octet_length(encode(text)) // 64 - 1)) AS i
                    FROM documents),
              fr AS (SELECT doc_id, substr(text, i * 64 + 1, 64) AS frame
                     FROM f WHERE i % 4 = 0),
              allf AS (SELECT doc_id, frame FROM fr
                       UNION ALL
                       SELECT doc_id + 100000, frame FROM fr WHERE doc_id < 40),
              h AS (SELECT doc_id,
                           CAST(list_sum(list_transform(generate_series(1, 63),
                                i -> CASE WHEN ascii(substr(frame, i, 1))
                                               > ascii(substr(frame, i + 1, 1))
                                          THEN (CAST(1 AS BIGINT) << (i - 1))
                                          ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
                    FROM allf),
              d AS (SELECT DISTINCT doc_id, fp FROM h),
              keep AS (SELECT fp FROM d GROUP BY 1
                       HAVING count(*) BETWEEN 2 AND 16),
              k AS (SELECT d.doc_id, d.fp FROM d JOIN keep USING (fp))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
         FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    // m07: m05's pair chain feeding the d07 recursive components, then
    // the d09 anti-join — keep the cluster representative (min id), drop
    // every other member of the media population.
    "m07_perceptual_dedup" ->
      """WITH RECURSIVE f AS (SELECT doc_id, text,
                           unnest(generate_series(0, octet_length(encode(text)) // 64 - 1)) AS i
                    FROM documents),
              fr AS (SELECT doc_id, substr(text, i * 64 + 1, 64) AS frame
                     FROM f WHERE i % 4 = 0),
              allf AS (SELECT doc_id, frame FROM fr
                       UNION ALL
                       SELECT doc_id + 100000, frame FROM fr WHERE doc_id < 40),
              h AS (SELECT doc_id,
                           CAST(list_sum(list_transform(generate_series(1, 63),
                                i -> CASE WHEN ascii(substr(frame, i, 1))
                                               > ascii(substr(frame, i + 1, 1))
                                          THEN (CAST(1 AS BIGINT) << (i - 1))
                                          ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
                    FROM allf),
              d AS (SELECT DISTINCT doc_id, fp FROM h),
              keep AS (SELECT fp FROM d GROUP BY 1
                       HAVING count(*) BETWEEN 2 AND 16),
              k AS (SELECT d.doc_id, d.fp FROM d JOIN keep USING (fp)),
              p AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                    FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id),
              sym AS (SELECT a_id AS id, b_id AS nb FROM p
                      UNION
                      SELECT b_id AS id, a_id AS nb FROM p),
              reach AS (SELECT id, nb FROM sym
                        UNION
                        SELECT r.id, s.nb FROM reach r JOIN sym s ON r.nb = s.id),
              comp AS (SELECT id, least(id, min(nb)) AS cluster FROM reach GROUP BY id),
              pop AS (SELECT doc_id FROM documents
                      UNION ALL
                      SELECT doc_id + 100000 FROM documents WHERE doc_id < 40)
         SELECT doc_id FROM pop
         WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)""",
    // m08: m05's dHash chain over the LOSSY planted construction (chars
    // at (i-1)%64=31 bumped +2 — the byte perturbation's char mirror,
    // ASCII-coupled like m04), 4x16-bit banding with the band-key cap,
    // xor+bit_count verify, distinct-a_fp count per pair.
    "m08_perceptual_near" ->
      """WITH base AS (SELECT doc_id, text FROM documents
                       UNION ALL
                       SELECT doc_id + 300000,
                              list_aggregate(list_transform(generate_series(1, len(text)),
                                i -> CASE WHEN (i - 1) % 64 = 31
                                          THEN chr(ascii(substr(text, i, 1)) + 2)
                                          ELSE substr(text, i, 1) END),
                                'string_agg', '') AS text
                       FROM documents WHERE doc_id < 40),
              f AS (SELECT doc_id, text,
                           unnest(generate_series(0, octet_length(encode(text)) // 64 - 1)) AS i
                    FROM base),
              fr AS (SELECT doc_id, substr(text, i * 64 + 1, 64) AS frame
                     FROM f WHERE i % 4 = 0),
              h AS (SELECT doc_id,
                           CAST(list_sum(list_transform(generate_series(1, 63),
                                i -> CASE WHEN ascii(substr(frame, i, 1))
                                               > ascii(substr(frame, i + 1, 1))
                                          THEN (CAST(1 AS BIGINT) << (i - 1))
                                          ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
                    FROM fr),
              d AS (SELECT DISTINCT doc_id, fp FROM h),
              bands AS (SELECT doc_id, fp, b.band AS band,
                               (fp >> (16 * b.band)) & 65535 AS bk
                        FROM d, (SELECT unnest([0, 1, 2, 3]) AS band) b),
              keep AS (SELECT band, bk FROM bands GROUP BY 1, 2
                       HAVING count(*) <= 16),
              kb AS (SELECT bands.* FROM bands JOIN keep USING (band, bk)),
              cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                              a.fp AS a_fp, b.fp AS b_fp
                       FROM kb a JOIN kb b
                         ON a.band = b.band AND a.bk = b.bk
                            AND a.doc_id < b.doc_id)
         SELECT a_id, b_id, CAST(count(DISTINCT a_fp) AS BIGINT) AS n_near
         FROM cand
         WHERE bit_count(xor(a_fp, b_fp)) <= 3
         GROUP BY 1, 2""",
    // m06: same frame slicing (and the m04 ASCII coupling note); energy is
    // the integer variance numerator 64·Σx² − (Σx)² over the frame's byte
    // values, compared against 64²·4 — all BIGINT (list_sum yields
    // HUGEINT, cast back), mirroring the engine's exact-integer contract.
    // The planted silence (doc_id+200000 for doc_id < 30, repeat('x'))
    // scores exactly 0 per frame and drops to live_bp = 0.
    "m06_frame_energy" ->
      """WITH base AS (SELECT doc_id, text FROM documents
                       UNION ALL
                       SELECT doc_id + 200000, repeat('x', 256)
                       FROM documents WHERE doc_id < 30),
              f AS (SELECT doc_id, text,
                           unnest(generate_series(0, octet_length(encode(text)) // 64 - 1)) AS i
                    FROM base),
              fr AS (SELECT doc_id, substr(text, i * 64 + 1, 64) AS frame
                     FROM f WHERE i % 4 = 0),
              e AS (SELECT doc_id,
                           CAST(64 AS BIGINT)
                             * CAST(list_sum(list_transform(generate_series(1, 64),
                                 i -> ascii(substr(frame, i, 1)) * ascii(substr(frame, i, 1)))) AS BIGINT)
                           - CAST(list_sum(list_transform(generate_series(1, 64),
                               i -> ascii(substr(frame, i, 1)))) AS BIGINT)
                             * CAST(list_sum(list_transform(generate_series(1, 64),
                                 i -> ascii(substr(frame, i, 1)))) AS BIGINT) AS energy
                    FROM fr),
              allcnt AS (SELECT doc_id, count(*) AS n_frames FROM e GROUP BY 1),
              livecnt AS (SELECT doc_id, count(*) AS n_live FROM e
                          WHERE energy >= CAST(64 AS BIGINT) * 64 * 4 GROUP BY 1)
         SELECT a.doc_id, a.n_frames,
                coalesce(l.n_live, 0) AS n_live,
                CAST(coalesce(l.n_live, 0) * 10000 // a.n_frames AS BIGINT) AS live_bp
         FROM allcnt a LEFT JOIN livecnt l USING (doc_id)""",
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
    "d13_delta_dedup" -> D13Sql,
    "d07_dup_clusters" ->
      s"""WITH RECURSIVE $ComponentsCte
          SELECT id, cluster FROM comp""",
    "d09_dedup_apply" ->
      s"""WITH RECURSIVE $ComponentsCte
          SELECT doc_id, lang, source FROM documents
          WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)""",
    // 13-gram decontamination: n-grams as strings (p05's word-list
    // convention — literal-space split, empty tokens dropped, per-doc
    // list_distinct matches the engine's array_distinct), split CASE as
    // p01/p03. count(DISTINCT) cast to BIGINT to match count_distinct.
    "p11_ngram_decontaminate" ->
      s"""WITH w AS (SELECT doc_id,
                            list_filter(string_split(text, ' '), t -> t <> '') AS ws
                     FROM documents),
              g AS (SELECT doc_id,
                           list_distinct(list_transform(generate_series(1, len(ws) - 12),
                             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4],
                                            ws[i+5], ws[i+6], ws[i+7], ws[i+8], ws[i+9],
                                            ws[i+10], ws[i+11], ws[i+12]))) AS gs
                    FROM w WHERE len(ws) >= 13),
              sp AS (SELECT doc_id,
                            CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                 ELSE 'test' END AS split
                     FROM documents),
              eg AS (SELECT unnest(gs) AS gram, g.doc_id AS eval_id
                     FROM g JOIN sp USING (doc_id) WHERE sp.split <> 'train'),
              tg AS (SELECT g.doc_id AS train_id, unnest(gs) AS gram
                     FROM g JOIN sp USING (doc_id) WHERE sp.split = 'train')
         SELECT t.train_id,
                CAST(count(DISTINCT t.gram) AS BIGINT) AS n_shared_grams,
                min(e.eval_id) AS first_eval_id
         FROM tg t JOIN eg e ON t.gram = e.gram
         GROUP BY t.train_id""",
    // p11's match stream read from the eval side: per-(eval, train) pair
    // distinct-gram counts, then one window per eval picks the worst
    // offender (most shared grams, ties to the smallest train id — the
    // same deterministic order the engine's row_number uses).
    "p14_contamination_report" ->
      s"""WITH w AS (SELECT doc_id,
                            list_filter(string_split(text, ' '), t -> t <> '') AS ws
                     FROM documents),
              g AS (SELECT doc_id,
                           list_distinct(list_transform(generate_series(1, len(ws) - 12),
                             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4],
                                            ws[i+5], ws[i+6], ws[i+7], ws[i+8], ws[i+9],
                                            ws[i+10], ws[i+11], ws[i+12]))) AS gs
                    FROM w WHERE len(ws) >= 13),
              sp AS (SELECT doc_id,
                            CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                 ELSE 'test' END AS split
                     FROM documents),
              eg AS (SELECT unnest(gs) AS gram, g.doc_id AS eval_id
                     FROM g JOIN sp USING (doc_id) WHERE sp.split <> 'train'),
              tg AS (SELECT g.doc_id AS train_id, unnest(gs) AS gram
                     FROM g JOIN sp USING (doc_id) WHERE sp.split = 'train'),
              pairs AS (SELECT e.eval_id, t.train_id,
                               CAST(count(DISTINCT t.gram) AS BIGINT) AS n_shared
                        FROM tg t JOIN eg e ON t.gram = e.gram
                        GROUP BY 1, 2),
              ranked AS (SELECT eval_id, train_id, n_shared,
                                row_number() OVER (PARTITION BY eval_id
                                  ORDER BY n_shared DESC, train_id ASC) AS rn,
                                CAST(count(*) OVER (PARTITION BY eval_id) AS BIGINT)
                                  AS n_leaky_train_docs
                         FROM pairs)
         SELECT eval_id, n_leaky_train_docs, n_shared AS max_shared_grams,
                train_id AS worst_train_id
         FROM ranked WHERE rn = 1""",
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
    // ExactSubstr: 10-token runs via inclusive list slice + string_agg
    // (equality semantics identical to the engine's space-joined grams);
    // per-doc list_distinct makes (doc, gram) unique, so count(*) is both
    // the doc frequency (cap CTE) and the distinct shared-run count.
    "d15_exact_substr" ->
      """WITH w AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              g AS (SELECT doc_id,
                           unnest(list_distinct(list_transform(
                             generate_series(1, len(ws) - 9),
                             i -> list_aggregate(ws[i:i+9], 'string_agg', ' ')))) AS gram
                    FROM w WHERE len(ws) >= 10),
              keep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 256),
              gg AS (SELECT g.doc_id, g.gram FROM g JOIN keep USING (gram))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(count(*) AS BIGINT) AS n_shared_runs
         FROM gg a JOIN gg b ON a.gram = b.gram AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    // ExactSubstr APPLY: positional 10-gram instances, keep-first by
    // (doc_id, pos) per duplicated gram (row_number mirrors the engine's
    // min(struct) ownership), cut instances merged into maximal spans
    // (adjacent/overlapping coalesce via the running-max-end island
    // trick), cleaned text re-joined by single space over the surviving
    // token positions. Cap semantics identical to d15: grams in > 256
    // docs are exempt boilerplate.
    "d16_exact_substr_apply" ->
      """WITH w AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              inst AS (SELECT doc_id, i AS pos,
                              list_aggregate(ws[i:i+9], 'string_agg', ' ') AS g
                       FROM w, UNNEST(generate_series(1, len(ws) - 9)) AS t(i)
                       WHERE len(ws) >= 10),
              stats AS (SELECT g, count(DISTINCT doc_id) AS df, count(*) AS n_inst
                        FROM inst GROUP BY g),
              keepg AS (SELECT g FROM stats WHERE n_inst >= 2 AND df <= 256),
              ranked AS (SELECT i.doc_id, i.pos,
                                row_number() OVER (PARTITION BY i.g
                                                   ORDER BY i.doc_id, i.pos) AS rn
                         FROM inst i JOIN keepg USING (g)),
              cut AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
              flag AS (SELECT doc_id, pos, pos + 9 AS e,
                              CASE WHEN pos > coalesce(max(pos + 9) OVER (
                                     PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                     -2) + 1
                                   THEN 1 ELSE 0 END AS ns
                       FROM cut),
              isl AS (SELECT doc_id, pos, e,
                             sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                                           ROWS UNBOUNDED PRECEDING) AS island
                      FROM flag),
              spans AS (SELECT doc_id, island,
                               CAST(min(pos) AS BIGINT) AS cut_start,
                               CAST(max(e) - min(pos) + 1 AS BIGINT) AS cut_len
                        FROM isl GROUP BY doc_id, island),
              perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut_spans,
                                CAST(sum(cut_len) AS BIGINT) AS n_cut_tokens
                         FROM spans GROUP BY doc_id),
              cutpos AS (SELECT DISTINCT doc_id, pos + off AS p
                         FROM cut, UNNEST(generate_series(0, 9)) AS o(off)),
              tok AS (SELECT doc_id, i AS tp, ws[i] AS tok
                      FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
              clean AS (SELECT t.doc_id,
                               string_agg(t.tok, ' ' ORDER BY t.tp) AS clean_text
                        FROM tok t LEFT JOIN cutpos c
                          ON t.doc_id = c.doc_id AND t.tp = c.p
                        WHERE c.doc_id IS NULL
                        GROUP BY t.doc_id)
         SELECT s.doc_id, s.cut_start, s.cut_len, p.n_cut_spans,
                p.n_cut_tokens, coalesce(cl.clean_text, '') AS clean_text
         FROM spans s JOIN perdoc p USING (doc_id)
         LEFT JOIN clean cl USING (doc_id)""",
    // d19: the delta APPLY mirror — delta docs' positional gram instances
    // (d16's inst machinery restricted to doc_id % 10 = 7) join the
    // CAPPED corpus gram set (the index build's 256-doc cap, d17's
    // convention); matched instances merge into spans and cut (d16's
    // flag/island/clean machinery over the delta side); every delta doc
    // emits, uncut ones space-canonical.
    "d19_delta_substr_apply" ->
      """WITH w AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              inst AS (SELECT doc_id, i AS pos,
                              list_aggregate(ws[i:i+9], 'string_agg', ' ') AS g
                       FROM w, UNNEST(generate_series(1, len(ws) - 9)) AS t(i)
                       WHERE len(ws) >= 10 AND doc_id % 10 = 7),
              gcorp AS (SELECT DISTINCT doc_id, gram FROM (
                          SELECT doc_id,
                                 unnest(list_distinct(list_transform(
                                   generate_series(1, len(ws) - 9),
                                   i -> list_aggregate(ws[i:i+9], 'string_agg', ' ')))) AS gram
                          FROM w WHERE len(ws) >= 10 AND doc_id % 10 <> 7)),
              member AS (SELECT gram FROM gcorp GROUP BY gram
                         HAVING count(*) <= 256),
              cut AS (SELECT i.doc_id, i.pos
                      FROM inst i JOIN member m ON i.g = m.gram),
              flag AS (SELECT doc_id, pos, pos + 9 AS e,
                              CASE WHEN pos > coalesce(max(pos + 9) OVER (
                                     PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                     -2) + 1
                                   THEN 1 ELSE 0 END AS ns
                       FROM cut),
              isl AS (SELECT doc_id, pos, e,
                             sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                                           ROWS UNBOUNDED PRECEDING) AS island
                      FROM flag),
              spans AS (SELECT doc_id, island,
                               CAST(min(pos) AS BIGINT) AS cut_start,
                               CAST(max(e) - min(pos) + 1 AS BIGINT) AS cut_len
                        FROM isl GROUP BY doc_id, island),
              perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut_spans,
                                CAST(sum(cut_len) AS BIGINT) AS n_cut_tokens
                         FROM spans GROUP BY doc_id),
              cutpos AS (SELECT DISTINCT doc_id, pos + off AS p
                         FROM cut, UNNEST(generate_series(0, 9)) AS o(off)),
              tok AS (SELECT doc_id, i AS tp, ws[i] AS tok
                      FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)
                      WHERE doc_id % 10 = 7),
              clean AS (SELECT t.doc_id,
                               string_agg(t.tok, ' ' ORDER BY t.tp) AS clean_text
                        FROM tok t LEFT JOIN cutpos c
                          ON t.doc_id = c.doc_id AND t.tp = c.p
                        WHERE c.doc_id IS NULL
                        GROUP BY t.doc_id)
         SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tokens,
                coalesce(p.n_cut_spans, 0) AS n_cut_spans,
                coalesce(p.n_cut_tokens, 0) AS n_cut_tokens,
                coalesce(cl.clean_text, '') AS clean_text
         FROM (SELECT doc_id, ws FROM w WHERE doc_id % 10 = 7) d
         LEFT JOIN perdoc p USING (doc_id)
         LEFT JOIN clean cl USING (doc_id)""",
    // Delta ExactSubstr: d15's gram convention split delta-vs-corpus
    // (doc_id % 10 = 7 plays the batch). BOTH caps mirrored: the corpus
    // side's 256-doc cap is the INDEX build (capGramDf over corpus df
    // only), the delta side's is the batch-side probe cap.
    "d17_delta_exact_substr" ->
      """WITH w AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              g AS (SELECT doc_id,
                           unnest(list_distinct(list_transform(
                             generate_series(1, len(ws) - 9),
                             i -> list_aggregate(ws[i:i+9], 'string_agg', ' ')))) AS gram
                    FROM w WHERE len(ws) >= 10),
              gc AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 7),
              gd AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 = 7),
              keepc AS (SELECT gram FROM gc GROUP BY gram HAVING count(*) <= 256),
              keepd AS (SELECT gram FROM gd GROUP BY gram HAVING count(*) <= 256),
              idx AS (SELECT gc.doc_id, gc.gram FROM gc JOIN keepc USING (gram)),
              bat AS (SELECT gd.doc_id, gd.gram FROM gd JOIN keepd USING (gram))
         SELECT b.doc_id AS new_id, i.doc_id AS old_id,
                CAST(count(*) AS BIGINT) AS n_shared_runs
         FROM bat b JOIN idx i USING (gram)
         GROUP BY 1, 2""",
    // Target mixture: the closed-form solve in DOUBLE arithmetic written
    // operation-for-operation as the engine computes it (min of
    // n*10000/w, then floor(w*t/n)) so IEEE754 agreement is exact; plain
    // string_split length matches the engine's split-on-space token count.
    "p15_target_mixture" ->
      """WITH d AS (SELECT doc_id, source,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
              tgt AS (SELECT DISTINCT source, CAST(500 AS BIGINT) AS weight_bp
                      FROM documents),
              c AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_toks
                    FROM d GROUP BY 1),
              j AS (SELECT c.source, n_toks, weight_bp FROM c JOIN tgt USING (source)),
              tm AS (SELECT min(CAST(n_toks AS DOUBLE) * 10000.0
                                / CAST(weight_bp AS DOUBLE)) AS t_max FROM j),
              r AS (SELECT source,
                           CAST(floor(CAST(weight_bp AS DOUBLE) * t_max
                                      / CAST(n_toks AS DOUBLE) + 1e-7) AS BIGINT) AS rate_bp
                    FROM j, tm)
         SELECT d.doc_id, d.source, d.n_tokens, r.rate_bp
         FROM d JOIN r USING (source)
         WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
               < rate_bp""",
    // Epoch repeats: the t02/p08 quality CTE is the weight; repeats =
    // (10000 + q*3) DIV 10000 plus a hash Bernoulli on the remainder;
    // lateral unnest(generate_series) mirrors explode(sequence).
    "p12_epoch_repeat" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                           CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
                           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                    FROM t),
              q AS (SELECT doc_id,
                           CAST(n_uniq * 5000 // n_tokens
                                + (n_tokens - n_stop) * 3000 // n_tokens
                                + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
                    FROM c),
              r AS (SELECT doc_id, quality_bp,
                           CAST((10000 + quality_bp * 3) // 10000
                                + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                                            < (10000 + quality_bp * 3) % 10000
                                       THEN 1 ELSE 0 END AS BIGINT) AS repeats
                    FROM q)
         SELECT doc_id, quality_bp, repeats,
                CAST(unnest(generate_series(1, repeats)) AS BIGINT) AS epoch_idx
         FROM r""",
    // The composed corpus build: every stage recomputes over the previous
    // stage's survivors, so the CTE chain mirrors corpusBuild stage for
    // stage (same capped components as d09 for the dedup drop, same split
    // CASE as p01/p03, same mix/budget/pack arithmetic as p06/p07/p02).
    "p10_corpus_build" ->
      s"""WITH RECURSIVE $ComponentsCte,
              tok AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws
                      FROM documents),
              qual AS (SELECT doc_id FROM (
                        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                               CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len,
                               CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                        FROM tok)
                       WHERE NOT (n_tokens < 20 OR n_tokens > 2000
                              OR sum_len * 100 < n_tokens * 300 OR sum_len * 100 > n_tokens * 1000
                              OR n_stop * 10000 < n_tokens * 100)),
              s2 AS (SELECT t.doc_id, t.lang, t.text, CAST(len(t.ws) AS BIGINT) AS n_tokens
                     FROM tok t JOIN qual USING (doc_id)
                     WHERE t.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)),
              spl AS (SELECT doc_id,
                             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                  ELSE 'test' END AS split
                      FROM documents),
              s3 AS (SELECT s2.*, spl.split FROM s2 JOIN spl USING (doc_id)
                     WHERE NOT (spl.split = 'train' AND md5(s2.text) IN (
                         SELECT md5(b.text) FROM s2 b JOIN spl spb ON b.doc_id = spb.doc_id
                         WHERE spb.split <> 'train'))),
              mixc AS (SELECT lang, count(*) AS n_lang FROM s3 GROUP BY lang),
              mixm AS (SELECT min(n_lang) AS n_min FROM mixc),
              mixr AS (SELECT lang, CAST(floor(10000.0 * sqrt(CAST(n_min AS DOUBLE) / n_lang)) AS BIGINT) AS rate_bp
                       FROM mixc, mixm),
              s4 AS (SELECT s3.* FROM s3 JOIN mixr USING (lang)
                     WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < mixr.rate_bp),
              bud AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum FROM s4),
              s5 AS (SELECT doc_id, lang, n_tokens FROM bud WHERE cum - n_tokens < 3000),
              s6 AS (SELECT doc_id, lang, n_tokens,
                            CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT) AS pack_id
                     FROM s5)
         SELECT doc_id, lang, n_tokens, pack_id,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
                CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                     WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                     ELSE 'test' END AS split
         FROM s6""",
    // The v2 composed build: p10's CTE chain with quality carried from the
    // deduped survivors (t02 formula), a 13-gram decontamination stage
    // (p11's gram convention — filtered word list, per-doc list_distinct)
    // between p03 and the mix, and the p12 epoch-repeat tail.
    "p13_corpus_build_v2" ->
      s"""WITH RECURSIVE $ComponentsCte,
              tok AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws
                      FROM documents),
              qual AS (SELECT doc_id FROM (
                        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                               CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len,
                               CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                        FROM tok)
                       WHERE NOT (n_tokens < 20 OR n_tokens > 2000
                              OR sum_len * 100 < n_tokens * 300 OR sum_len * 100 > n_tokens * 1000
                              OR n_stop * 10000 < n_tokens * 100)),
              s2c AS (SELECT t.doc_id, t.lang, t.text, t.ws,
                             CAST(len(t.ws) AS BIGINT) AS n_tokens,
                             CAST(len(list_distinct(t.ws)) AS BIGINT) AS n_uniq,
                             CAST(len(list_filter(t.ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                      FROM tok t JOIN qual USING (doc_id)
                      WHERE t.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)),
              s2 AS (SELECT doc_id, lang, text, n_tokens,
                            CAST(n_uniq * 5000 // n_tokens
                                 + (n_tokens - n_stop) * 3000 // n_tokens
                                 + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
                     FROM s2c),
              spl AS (SELECT doc_id,
                             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                  ELSE 'test' END AS split
                      FROM documents),
              s3 AS (SELECT s2.*, spl.split FROM s2 JOIN spl USING (doc_id)
                     WHERE NOT (spl.split = 'train' AND md5(s2.text) IN (
                         SELECT md5(b.text) FROM s2 b JOIN spl spb ON b.doc_id = spb.doc_id
                         WHERE spb.split <> 'train'))),
              gw AS (SELECT doc_id, split,
                            list_filter(string_split(text, ' '), t -> t <> '') AS fws
                     FROM s3),
              gg AS (SELECT doc_id, split,
                            list_distinct(list_transform(generate_series(1, len(fws) - 12),
                              i -> concat_ws(' ', fws[i], fws[i+1], fws[i+2], fws[i+3], fws[i+4],
                                             fws[i+5], fws[i+6], fws[i+7], fws[i+8], fws[i+9],
                                             fws[i+10], fws[i+11], fws[i+12]))) AS gs
                     FROM gw WHERE len(fws) >= 13),
              ge AS (SELECT unnest(gs) AS gram FROM gg WHERE split <> 'train'),
              gt AS (SELECT doc_id, unnest(gs) AS gram FROM gg WHERE split = 'train'),
              gc AS (SELECT DISTINCT gt.doc_id FROM gt JOIN ge USING (gram)),
              s3b AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM gc)),
              mixc AS (SELECT lang, count(*) AS n_lang FROM s3b GROUP BY lang),
              mixm AS (SELECT min(n_lang) AS n_min FROM mixc),
              mixr AS (SELECT lang, CAST(floor(10000.0 * sqrt(CAST(n_min AS DOUBLE) / n_lang)) AS BIGINT) AS rate_bp
                       FROM mixc, mixm),
              s4 AS (SELECT s3b.* FROM s3b JOIN mixr USING (lang)
                     WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < mixr.rate_bp),
              bud AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum FROM s4),
              s5 AS (SELECT doc_id, lang, n_tokens, quality_bp FROM bud WHERE cum - n_tokens < 3000),
              s6 AS (SELECT doc_id, lang, n_tokens, quality_bp,
                            CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT) AS pack_id
                     FROM s5),
              rep AS (SELECT doc_id, lang, n_tokens, pack_id, quality_bp,
                             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
                             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                  ELSE 'test' END AS split,
                             CAST((10000 + quality_bp * 3) // 10000
                                  + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                                              < (10000 + quality_bp * 3) % 10000
                                         THEN 1 ELSE 0 END AS BIGINT) AS repeats
                      FROM s6)
         SELECT doc_id, lang, n_tokens, pack_id, quality_bp, bucket, split, repeats,
                CAST(unnest(generate_series(1, repeats)) AS BIGINT) AS epoch_idx
         FROM rep""",
    // d21: d19's CTE chain (stage 1, corpus precedence) feeding d16's
    // chain (stage 2, within-batch keep-first) re-tokenized from the
    // stage-1 clean text — the composed mirror, both caps preserved.
    "d21_ingest_substr_clean" ->
      """WITH w AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              inst AS (SELECT doc_id, i AS pos,
                              list_aggregate(ws[i:i+9], 'string_agg', ' ') AS g
                       FROM w, UNNEST(generate_series(1, len(ws) - 9)) AS t(i)
                       WHERE len(ws) >= 10 AND doc_id % 10 = 7),
              gcorp AS (SELECT DISTINCT doc_id, gram FROM (
                          SELECT doc_id,
                                 unnest(list_distinct(list_transform(
                                   generate_series(1, len(ws) - 9),
                                   i -> list_aggregate(ws[i:i+9], 'string_agg', ' ')))) AS gram
                          FROM w WHERE len(ws) >= 10 AND doc_id % 10 <> 7)),
              member AS (SELECT gram FROM gcorp GROUP BY gram
                         HAVING count(*) <= 256),
              cut AS (SELECT i.doc_id, i.pos
                      FROM inst i JOIN member m ON i.g = m.gram),
              cutpos AS (SELECT DISTINCT doc_id, pos + off AS p
                         FROM cut, UNNEST(generate_series(0, 9)) AS o(off)),
              perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut_tokens
                         FROM cutpos GROUP BY doc_id),
              tok AS (SELECT doc_id, i AS tp, ws[i] AS tok
                      FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)
                      WHERE doc_id % 10 = 7),
              clean AS (SELECT t.doc_id,
                               string_agg(t.tok, ' ' ORDER BY t.tp) AS clean_text
                        FROM tok t LEFT JOIN cutpos c
                          ON t.doc_id = c.doc_id AND t.tp = c.p
                        WHERE c.doc_id IS NULL
                        GROUP BY t.doc_id),
              s1 AS (SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tokens,
                            coalesce(p.n_cut_tokens, 0) AS n_cut_corpus_tokens,
                            coalesce(cl.clean_text, '') AS clean_text
                     FROM (SELECT doc_id, ws FROM w WHERE doc_id % 10 = 7) d
                     LEFT JOIN perdoc p USING (doc_id)
                     LEFT JOIN clean cl USING (doc_id)),
              w2 AS (SELECT doc_id,
                            list_filter(string_split(clean_text, ' '), t -> t <> '') AS ws
                     FROM s1),
              inst2 AS (SELECT doc_id, i AS pos,
                               list_aggregate(ws[i:i+9], 'string_agg', ' ') AS g
                        FROM w2, UNNEST(generate_series(1, len(ws) - 9)) AS t(i)
                        WHERE len(ws) >= 10),
              stats2 AS (SELECT g, count(DISTINCT doc_id) AS df, count(*) AS n_inst
                         FROM inst2 GROUP BY g),
              keepg2 AS (SELECT g FROM stats2 WHERE n_inst >= 2 AND df <= 256),
              ranked2 AS (SELECT i.doc_id, i.pos,
                                 row_number() OVER (PARTITION BY i.g
                                                    ORDER BY i.doc_id, i.pos) AS rn
                          FROM inst2 i JOIN keepg2 USING (g)),
              cut2 AS (SELECT doc_id, pos FROM ranked2 WHERE rn > 1),
              cutpos2 AS (SELECT DISTINCT doc_id, pos + off AS p
                          FROM cut2, UNNEST(generate_series(0, 9)) AS o(off)),
              perdoc2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut_tokens
                          FROM cutpos2 GROUP BY doc_id),
              tok2 AS (SELECT doc_id, i AS tp, ws[i] AS tok
                       FROM w2, UNNEST(generate_series(1, len(ws))) AS t(i)),
              clean2 AS (SELECT t.doc_id,
                                string_agg(t.tok, ' ' ORDER BY t.tp) AS clean_text
                         FROM tok2 t LEFT JOIN cutpos2 c
                           ON t.doc_id = c.doc_id AND t.tp = c.p
                         WHERE c.doc_id IS NULL
                         GROUP BY t.doc_id)
         SELECT s1.doc_id, s1.n_tokens, s1.n_cut_corpus_tokens,
                coalesce(p2.n_cut_tokens, 0) AS n_cut_batch_tokens,
                coalesce(cl2.clean_text, '') AS clean_text
         FROM s1
         LEFT JOIN perdoc2 p2 USING (doc_id)
         LEFT JOIN clean2 cl2 USING (doc_id)""",
    // Paragraph dedup: t16's line geometry (16-token windows) with the
    // keep-first winner decided by row_number over (doc_id, line_idx) —
    // the CCNet semantics, first copy survives (vs t16's all-copies-die).
    "d22_paragraph_dedup" ->
      s"""WITH d AS (SELECT doc_id,
                            CASE WHEN doc_id % 9 = 4
                                 THEN '$ParagraphBanner ' || text
                                 ELSE text END AS text
                     FROM documents),
              t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM d),
              l AS (SELECT doc_id, unnest(list_transform(generate_series(0, (len(ws) - 1) // 16),
                             i -> {'line_idx': i, 'line': array_to_string(ws[i*16+1 : i*16+16], ' ')})) AS u
                    FROM t WHERE len(ws) >= 1),
              e AS (SELECT doc_id, u.line_idx AS line_idx, u.line AS line FROM l),
              r AS (SELECT doc_id, line_idx, line,
                           row_number() OVER (PARTITION BY line
                                              ORDER BY doc_id, line_idx) AS rn
                    FROM e)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cut_lines,
                coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
                                    ' ' ORDER BY line_idx), '') AS clean_text
         FROM r GROUP BY 1""",
    // Ingest paragraph clean: the same line geometry split into corpus
    // (% 10 <> 7) and batch (% 10 = 7); corpus membership cuts first,
    // the within-batch keep-first runs over the survivors only.
    "d23_ingest_paragraph_clean" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              l AS (SELECT doc_id, unnest(list_transform(generate_series(0, (len(ws) - 1) // 16),
                             i -> {'line_idx': i, 'line': array_to_string(ws[i*16+1 : i*16+16], ' ')})) AS u
                    FROM t WHERE len(ws) >= 1),
              e AS (SELECT doc_id, u.line_idx AS line_idx, u.line AS line FROM l),
              corp AS (SELECT DISTINCT line FROM e WHERE doc_id % 10 <> 7),
              f AS (SELECT e.doc_id, e.line_idx, e.line,
                           (corp.line IS NOT NULL) AS corpus_cut
                    FROM e LEFT JOIN corp ON e.line = corp.line
                    WHERE e.doc_id % 10 = 7),
              k AS (SELECT doc_id, line_idx FROM (
                      SELECT doc_id, line_idx,
                             row_number() OVER (PARTITION BY line
                                                ORDER BY doc_id, line_idx) AS rn
                      FROM f WHERE NOT corpus_cut)
                    WHERE rn = 1)
         SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN f.corpus_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cut_corpus_lines,
                CAST(sum(CASE WHEN NOT f.corpus_cut AND k.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cut_batch_lines,
                coalesce(string_agg(CASE WHEN k.doc_id IS NOT NULL THEN f.line END,
                                    ' ' ORDER BY f.line_idx), '') AS clean_text
         FROM f LEFT JOIN k ON f.doc_id = k.doc_id AND f.line_idx = k.line_idx
         GROUP BY 1""",
    // Sparse cosine: trigram multiset counts, df-capped vocabulary,
    // integer dot/norms, sqrt+divide+round(4) — both engines IEEE.
    "s12_sparse_cosine" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
                             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS term
                    FROM w WHERE len(ws) >= 3),
              tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                     FROM g GROUP BY 1, 2),
              voc AS (SELECT term FROM tf GROUP BY 1 HAVING count(*) <= 256),
              k AS (SELECT tf.* FROM tf JOIN voc USING (term)),
              n AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
                    FROM k GROUP BY 1),
              d AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                           CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
                    FROM k a JOIN k b ON a.term = b.term AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
         SELECT a_id, b_id,
                round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 4) AS cos
         FROM d JOIN n na ON d.a_id = na.doc_id
                JOIN n nb ON d.b_id = nb.doc_id
         WHERE round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 4) >= 0.9""",
    // Shard checksums: p18's md5-bucket shard (recomputed scan-side),
    // 60-bit md5-prefix digest, order-free bit_xor.
    "p19_shard_checksums" ->
      """SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS BIGINT) AS shard,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS BIGINT) AS checksum
         FROM documents
         GROUP BY 1""",
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
    // Shard manifest: the p01 md5-bucket shard + md5-rank position.
    "p18_shard_manifest" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS shard
                    FROM documents)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard,
                CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1 AS BIGINT) AS shard_pos
         FROM h""",
    // Soft dedup: d07's recursive-CTE components, cluster sizes, and the
    // integer-bp discount 10000 // n with singletons at 10000.
    "d24_soft_dedup_weights" ->
      s"""WITH RECURSIVE $ComponentsCte,
              sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
                     FROM comp GROUP BY 1),
              w AS (SELECT comp.id AS doc_id, sz.cluster_size
                    FROM comp JOIN sz USING (cluster))
         SELECT d.doc_id,
                CAST(coalesce(w.cluster_size, 1) AS BIGINT) AS cluster_size,
                CAST(10000 // coalesce(w.cluster_size, 1) AS BIGINT) AS weight_bp
         FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id""",
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
    // Snapshot diff: the same derived snapshot-two construction, one
    // FULL OUTER join on the id, md5-digest equality for the status.
    "d20_corpus_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
              new AS (SELECT doc_id,
                             CASE WHEN doc_id % 5 = 0 THEN 'rev2 ' || text
                                  ELSE text END AS text
                      FROM documents WHERE doc_id % 7 <> 3
                      UNION ALL
                      SELECT CAST(v.doc_id AS BIGINT), v.text
                      FROM (VALUES (9000001, 'snapshot two added this document'),
                                   (9000002, 'and this second brand new document'),
                                   (9000003, 'plus a third addition'))
                           v(doc_id, text)),
              j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                           md5(o.text) AS oh, md5(n.text) AS nh
                    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
         SELECT doc_id,
                CASE WHEN oh IS NULL THEN 'added'
                     WHEN nh IS NULL THEN 'removed'
                     WHEN oh = nh THEN 'unchanged'
                     ELSE 'changed' END AS status
         FROM j""",
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
    // DSIR selection: hashed unigram+bigram multisets (no DISTINCT — the
    // paper's raw counts), the p01 md5-bucket mirror, Laplace-smoothed
    // integer-bp probabilities with `//` (all operands positive, so
    // DuckDB floor-div == Spark DIV), and t14's one
    // final division-then-round(4).
    "p17_dsir_select" ->
      """WITH w AS (SELECT doc_id, source,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              g AS (SELECT doc_id, source, unnest(ws) AS gram FROM w
                    UNION ALL
                    SELECT doc_id, source,
                           unnest(list_transform(generate_series(1, len(ws) - 1),
                             i -> concat_ws(' ', ws[i], ws[i+1]))) AS gram
                    FROM w WHERE len(ws) >= 2),
              h AS (SELECT doc_id, source = 'src0' AS t,
                           CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 1024 AS bucket
                    FROM g),
              c AS (SELECT bucket,
                           CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
                           CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS r_cnt
                    FROM h GROUP BY 1),
              tt AS (SELECT CAST(sum(t_cnt) AS BIGINT) AS t_total,
                            CAST(sum(r_cnt) AS BIGINT) AS r_total FROM c),
              m AS (SELECT bucket,
                           CAST((t_cnt + 1) * 10000 // (t_total + 1024) AS BIGINT)
                         - CAST((r_cnt + 1) * 10000 // (r_total + 1024) AS BIGINT) AS w_bp
                    FROM c CROSS JOIN tt),
              s AS (SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                           CAST(sum(m.w_bp) AS BIGINT) AS sum_w_bp
                    FROM h JOIN m USING (bucket) WHERE NOT h.t
                    GROUP BY 1)
         SELECT doc_id, n_grams, sum_w_bp,
                round(CAST(sum_w_bp AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) AS dsir_w
         FROM s
         ORDER BY dsir_w DESC, doc_id
         LIMIT 100""",
    // The v3 composed build: p13's CTE chain verbatim except the mixture
    // CTEs — doc-count sqrt temperature becomes the p15 token-share solve
    // (uniform stated 2000 bp per language; binding language admits all,
    // rate = floor(w*T/n_toks + 1e-7) in doubles, the targetMixture
    // arithmetic verbatim). Targets' language set comes from the s2
    // survivors (the engine reads it off the survivors checkpoint).
    "p16_corpus_build_v3" ->
      s"""WITH RECURSIVE $ComponentsCte,
              tok AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws
                      FROM documents),
              qual AS (SELECT doc_id FROM (
                        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                               CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len,
                               CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                        FROM tok)
                       WHERE NOT (n_tokens < 20 OR n_tokens > 2000
                              OR sum_len * 100 < n_tokens * 300 OR sum_len * 100 > n_tokens * 1000
                              OR n_stop * 10000 < n_tokens * 100)),
              s2c AS (SELECT t.doc_id, t.lang, t.text, t.ws,
                             CAST(len(t.ws) AS BIGINT) AS n_tokens,
                             CAST(len(list_distinct(t.ws)) AS BIGINT) AS n_uniq,
                             CAST(len(list_filter(t.ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                      FROM tok t JOIN qual USING (doc_id)
                      WHERE t.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)),
              s2 AS (SELECT doc_id, lang, text, n_tokens,
                            CAST(n_uniq * 5000 // n_tokens
                                 + (n_tokens - n_stop) * 3000 // n_tokens
                                 + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
                     FROM s2c),
              spl AS (SELECT doc_id,
                             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                  ELSE 'test' END AS split
                      FROM documents),
              s3 AS (SELECT s2.*, spl.split FROM s2 JOIN spl USING (doc_id)
                     WHERE NOT (spl.split = 'train' AND md5(s2.text) IN (
                         SELECT md5(b.text) FROM s2 b JOIN spl spb ON b.doc_id = spb.doc_id
                         WHERE spb.split <> 'train'))),
              gw AS (SELECT doc_id, split,
                            list_filter(string_split(text, ' '), t -> t <> '') AS fws
                     FROM s3),
              gg AS (SELECT doc_id, split,
                            list_distinct(list_transform(generate_series(1, len(fws) - 12),
                              i -> concat_ws(' ', fws[i], fws[i+1], fws[i+2], fws[i+3], fws[i+4],
                                             fws[i+5], fws[i+6], fws[i+7], fws[i+8], fws[i+9],
                                             fws[i+10], fws[i+11], fws[i+12]))) AS gs
                     FROM gw WHERE len(fws) >= 13),
              ge AS (SELECT unnest(gs) AS gram FROM gg WHERE split <> 'train'),
              gt AS (SELECT doc_id, unnest(gs) AS gram FROM gg WHERE split = 'train'),
              gc AS (SELECT DISTINCT gt.doc_id FROM gt JOIN ge USING (gram)),
              s3b AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM gc)),
              tc AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS n_toks
                     FROM s3b GROUP BY 1),
              tgt AS (SELECT DISTINCT lang, CAST(2000 AS BIGINT) AS weight_bp
                      FROM s2),
              tj AS (SELECT tc.lang, n_toks, weight_bp FROM tc JOIN tgt USING (lang)),
              tmx AS (SELECT min(CAST(n_toks AS DOUBLE) * 10000.0
                                 / CAST(weight_bp AS DOUBLE)) AS t_max FROM tj),
              mixr AS (SELECT lang,
                              CAST(floor(CAST(weight_bp AS DOUBLE) * t_max
                                         / CAST(n_toks AS DOUBLE) + 1e-7) AS BIGINT) AS rate_bp
                       FROM tj, tmx),
              s4 AS (SELECT s3b.* FROM s3b JOIN mixr USING (lang)
                     WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < mixr.rate_bp),
              bud AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum FROM s4),
              s5 AS (SELECT doc_id, lang, n_tokens, quality_bp FROM bud WHERE cum - n_tokens < 3000),
              s6 AS (SELECT doc_id, lang, n_tokens, quality_bp,
                            CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT) AS pack_id
                     FROM s5),
              rep AS (SELECT doc_id, lang, n_tokens, pack_id, quality_bp,
                             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
                             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                  ELSE 'test' END AS split,
                             CAST((10000 + quality_bp * 3) // 10000
                                  + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                                              < (10000 + quality_bp * 3) % 10000
                                         THEN 1 ELSE 0 END AS BIGINT) AS repeats
                      FROM s6)
         SELECT doc_id, lang, n_tokens, pack_id, quality_bp, bucket, split, repeats,
                CAST(unnest(generate_series(1, repeats)) AS BIGINT) AS epoch_idx
         FROM rep""",
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
    "d08_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              ch AS (SELECT doc_id, unnest(list_transform(generate_series(0, (len(ws) - 1) // 16),
                              i -> {'chunk_idx': i, 'chunk': array_to_string(ws[i*16+1 : i*16+16], ' ')})) AS u
                     FROM t WHERE len(ws) >= 1),
              e AS (SELECT doc_id, u.chunk_idx AS chunk_idx, u.chunk AS chunk FROM ch),
              r AS (SELECT doc_id, chunk_idx,
                           row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) AS rn
                    FROM e)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                CAST(coalesce(sum(CASE WHEN rn > 1 THEN 1 END), 0) AS BIGINT) AS n_dup_chunks,
                (CAST(count(*) AS BIGINT)
                 - CAST(coalesce(sum(CASE WHEN rn > 1 THEN 1 END), 0) AS BIGINT)) * 10000
                // CAST(count(*) AS BIGINT) AS uniq_bp
         FROM r GROUP BY doc_id""",
    "p04_stratified_sample" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
                  row_number() OVER (PARTITION BY lang, source
                                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents) WHERE rn <= 5""",
    "t11_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
              c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
              v AS (SELECT token FROM c ORDER BY n DESC, token LIMIT 10),
              a AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                           CAST(coalesce(sum(CASE WHEN v.token IS NULL THEN 1 END), 0) AS BIGINT) AS n_oov
                    FROM tok t LEFT JOIN v ON t.token = v.token
                    GROUP BY t.doc_id)
         SELECT doc_id, n_tokens, n_oov, n_oov * 10000 // n_tokens AS oov_bp FROM a""",
    "d01_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS dup_count
         FROM documents GROUP BY md5(text)""",
    "d02_dedup_keep_first" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""",
    "d03_ngram_jaccard" -> D03Sql,
    // d18: exact batch x corpus mirror of the index probe (the d06
    // convention — the LSH candidate stage has ~unit recall at the 0.9
    // verify threshold, so the exact join IS the expected output; the
    // hash compare is itself the recall proof).
    "d18_delta_embedding_dedup" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              batch AS (SELECT vec_id + 100000 AS new_id,
                               list_transform(v, (x, i) -> x * (1.0 + 0.01 * (((i - 1) % 7) - 3))) AS av
                        FROM base WHERE vec_id < 25)
         SELECT b.new_id, c.vec_id AS old_id,
                round(list_inner_product(b.av, c.v)
                      / (sqrt(list_inner_product(b.av, b.av)) * sqrt(list_inner_product(c.v, c.v))), 4) AS cos
         FROM batch b JOIN base c
           ON list_inner_product(b.av, c.v)
              / (sqrt(list_inner_product(b.av, b.av)) * sqrt(list_inner_product(c.v, c.v))) > 0.9""",
    "d06_embedding_dedup" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              aug AS (SELECT vec_id, v FROM base
                      UNION ALL
                      SELECT vec_id + 100000,
                             list_transform(v, (x, i) -> x * (1.0 + 0.01 * (((i - 1) % 7) - 3)))
                      FROM base WHERE vec_id < 25)
         SELECT a.vec_id AS keeper, b.vec_id AS dup,
                round(list_inner_product(a.v, b.v)
                      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) AS similarity
         FROM aug a JOIN aug b ON a.vec_id < b.vec_id
         WHERE list_inner_product(a.v, b.v)
               / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) > 0.9""",
    "s01_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
              scored AS (SELECT q_id, e.vec_id AS n_id,
                                list_inner_product(qv, e.v)
                                / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(e.v, e.v))) AS cos
                         FROM q JOIN e ON e.vec_id <> q_id),
              ranked AS (SELECT q_id, n_id, cos,
                                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rnk
                         FROM scored)
         SELECT q_id, n_id, round(cos, 4) AS cos, rnk FROM ranked WHERE rnk <= 5""",
    "s02_cosine_threshold" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                round(list_inner_product(a.v, b.v)
                      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_inner_product(a.v, b.v)
               / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) > 0.4""",
    "m03_payload_stats" ->
      """WITH b AS (SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS bytes
                    FROM documents)
         SELECT source, count(*) AS n_docs,
                CAST(sum(bytes) AS BIGINT) AS total_bytes,
                CAST(max(bytes) AS BIGINT) AS max_bytes,
                CAST(sum(CASE WHEN bytes > 1024 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_1k
         FROM b GROUP BY source""",
    "m01_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                sha256(text) AS sha
         FROM documents""",
    "s06_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                    WHERE len(embedding) > 0),
              m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
              q AS (SELECT vec_id, maxabs,
                           CASE WHEN maxabs = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                                ELSE list_transform(v, x -> greatest(CAST(floor(x * 127.0 / maxabs) AS BIGINT), -127))
                           END AS codes
                    FROM m)
         SELECT vec_id, CAST(floor(maxabs * 10000) AS BIGINT) AS scale_fp,
                CAST(list_sum(codes) AS BIGINT) AS code_sum,
                CAST(list_sum(list_transform(codes, x -> abs(x))) AS BIGINT) AS code_l1,
                CAST(list_min(codes) AS BIGINT) AS code_min,
                CAST(list_max(codes) AS BIGINT) AS code_max
         FROM q""",
    "m02_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
                           unnest(generate_series(0, octet_length(encode(text)) // 64 - 1)) AS i
                    FROM documents)
         SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
                md5(substr(text, i * 64 + 1, 64)) AS frame_md5
         FROM f WHERE i % 4 = 0""",
    "p01_hash_split" ->
      """SELECT doc_id,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
                CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                     WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                     ELSE 'test' END AS split
         FROM documents""",
    "p02_pack_sequences" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents)
         SELECT doc_id, n_tokens,
                CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)
                     // 2048 AS BIGINT) AS pack_id
         FROM t""",
    "p03_decontamination" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
                      UNION ALL
                      SELECT doc_id + 500000, text FROM documents WHERE doc_id < 50),
              s AS (SELECT doc_id, md5(text) AS h,
                           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                ELSE 'test' END AS split
                    FROM aug)
         SELECT a.doc_id AS train_id, b.doc_id AS eval_id, b.split AS eval_split
         FROM s a JOIN s b ON a.h = b.h
         WHERE a.split = 'train' AND b.split <> 'train'""",
    // UNCAPPED, unlike the D03Sql-derived dedup oracles: decontamination
    // recall must not be bounded by the bucket cap, so both sides carry
    // every ≥3-word doc and the cross-split join replaces the capped
    // self-join (mirrors the engine's deltaJaccardPairs(eval, train, None)).
    "p05_near_decontamination" ->
      """WITH w AS (SELECT doc_id, n_chars // 50 AS bkt,
                           list_filter(string_split(text, ' '), t -> t <> '') AS ws
                    FROM documents),
              s AS (SELECT doc_id, bkt,
                           list_distinct(list_transform(generate_series(1, len(ws) - 2),
                             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
                    FROM w WHERE len(ws) >= 3),
              sp AS (SELECT doc_id,
                            CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                                 ELSE 'test' END AS split
                     FROM documents),
              e AS (SELECT s.doc_id, s.bkt, s.sh, sp.split FROM s
                    JOIN sp USING (doc_id) WHERE sp.split <> 'train'),
              t AS (SELECT s.doc_id, s.bkt, s.sh FROM s
                    JOIN sp USING (doc_id) WHERE sp.split = 'train')
         SELECT t.doc_id AS train_id, e.doc_id AS eval_id, e.split AS eval_split,
                round(CAST(len(list_intersect(e.sh, t.sh)) AS DOUBLE)
                      / CAST(len(list_distinct(e.sh || t.sh)) AS DOUBLE), 4) AS jaccard
         FROM e JOIN t ON e.bkt = t.bkt
         WHERE CAST(len(list_intersect(e.sh, t.sh)) AS DOUBLE)
               / CAST(len(list_distinct(e.sh || t.sh)) AS DOUBLE) >= 0.2""",
    "p06_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
              m AS (SELECT min(n_lang) AS n_min FROM c),
              r AS (SELECT lang, CAST(n_lang AS BIGINT) AS n_lang,
                           CAST(floor(10000.0 * sqrt(CAST(n_min AS DOUBLE) / n_lang)) AS BIGINT) AS rate_bp
                    FROM c, m)
         SELECT d.doc_id, d.lang, r.n_lang, r.rate_bp
         FROM documents d JOIN r ON d.lang = r.lang
         WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < r.rate_bp""",
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
    "p07_token_budget" ->
      """WITH t AS (SELECT doc_id, lang,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
              o AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
                    FROM t)
         SELECT doc_id, lang, n_tokens, CAST(cum - n_tokens AS BIGINT) AS cum_before
         FROM o WHERE cum - n_tokens < 3000""",
    "s07_mips_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
              s AS (SELECT q_id, e.vec_id AS n_id, list_inner_product(qv, e.v) AS ip
                    FROM q JOIN e ON e.vec_id <> q_id),
              r AS (SELECT q_id, n_id, ip,
                           CAST(row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, n_id) AS BIGINT) AS rnk
                    FROM s)
         SELECT q_id, n_id, round(ip, 4) AS ip, rnk FROM r WHERE rnk <= 5""",
    "t12_bigram_topk" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              b AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                             i -> concat_ws(' ', ws[i], ws[i+1]))) AS bigram
                    FROM t WHERE len(ws) >= 2),
              c AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram),
              r AS (SELECT bigram, n, row_number() OVER (ORDER BY n DESC, bigram) AS rank FROM c)
         SELECT bigram, n FROM r WHERE rank <= 50""",
    "p08_curriculum_bins" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
              c AS (SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_tokens,
                           CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
                           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                    FROM t),
              q AS (SELECT doc_id, lang,
                           CAST(n_uniq * 5000 // n_tokens
                                + (n_tokens - n_stop) * 3000 // n_tokens
                                + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
                    FROM c)
         SELECT doc_id, lang, quality_bp,
                CAST(ntile(4) OVER (PARTITION BY lang ORDER BY quality_bp DESC, doc_id) AS BIGINT) AS bin
         FROM q""",
    "s08_filtered_topk" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e WHERE vec_id < 10),
              s AS (SELECT q_id, e.vec_id AS n_id, e.label AS label,
                           list_inner_product(qv, e.v)
                           / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(e.v, e.v))) AS cos
                    FROM q JOIN e ON e.label = q_label AND e.vec_id <> q_id),
              r AS (SELECT q_id, n_id, label, cos,
                           CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rnk
                    FROM s)
         SELECT q_id, n_id, label, round(cos, 4) AS cos, rnk FROM r WHERE rnk <= 5""",
    "p09_chunk_windows" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
              w AS (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws), 48)) AS win_start
                    FROM t WHERE len(ws) >= 1)
         SELECT doc_id, CAST((win_start - 1) // 48 AS BIGINT) AS win_idx,
                CAST(win_start AS BIGINT) AS win_start,
                CAST(len(ws[win_start:win_start+63]) AS BIGINT) AS win_len,
                md5(array_to_string(ws[win_start:win_start+63], ' ')) AS win_md5
         FROM w""",
    "d11_source_overlap" ->
      s"""WITH p AS ($D03Sql),
              src AS (SELECT doc_id, source FROM documents)
          SELECT least(a.source, b.source) AS source_a,
                 greatest(a.source, b.source) AS source_b,
                 count(*) AS n_pairs
          FROM p JOIN src a ON p.a_id = a.doc_id
                 JOIN src b ON p.b_id = b.doc_id
          GROUP BY 1, 2""",
    "d12_quality_keeper" ->
      s"""WITH RECURSIVE $ComponentsCte,
              t2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              c2 AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                            CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
                            CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                     FROM t2),
              q2 AS (SELECT doc_id,
                            CAST(n_uniq * 5000 // n_tokens
                                 + (n_tokens - n_stop) * 3000 // n_tokens
                                 + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
                     FROM c2),
              m AS (SELECT comp.cluster, comp.id, q2.quality_bp,
                           row_number() OVER (PARTITION BY comp.cluster
                             ORDER BY q2.quality_bp DESC, comp.id) AS rn
                    FROM comp JOIN q2 ON comp.id = q2.doc_id),
              n AS (SELECT cluster, count(*) AS n_members FROM comp GROUP BY cluster)
          SELECT m.cluster, m.id AS keeper_id, m.quality_bp AS keeper_quality,
                 n.n_members
          FROM m JOIN n ON m.cluster = n.cluster WHERE m.rn = 1""",
    "d10_dup_rate" ->
      s"""WITH RECURSIVE $ComponentsCte
          SELECT d.source, count(*) AS n_docs,
                 CAST(sum(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
                 CAST(sum(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END) * 10000
                      // count(*) AS BIGINT) AS dup_rate_bp
          FROM documents d
          LEFT JOIN (SELECT id FROM comp WHERE id <> cluster) c ON d.doc_id = c.id
          GROUP BY d.source"""
  )
}
