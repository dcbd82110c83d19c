package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Sampling, SimilaritySearch, TextAnalysis => TA}
import graft.queries.PipelineShared._

/** d-family query registry — deduplication: exact / MinHash-LSH / SimHash / embedding / ExactSubstr span geometry, delta-ingest admission, clusters and apply.
  * Split out of the monolithic PipelineQueries in round 11 (pure
  * re-grouping: every entry verbatim; shared machinery lives in
  * [[PipelineShared]], aggregation in [[PipelineQueries]]). */
private[queries] object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // d25: host-cap selection (the RefinedWeb/C4 per-host limit — an
    // over-represented site must not dominate the corpus regardless of
    // per-doc quality). Host = source × a stable md5 bucket (the
    // synthetic corpus has no URL column; the bucketing is the
    // deterministic stand-in and the oracle recomputes it). Keep the
    // top-3 docs per host by (quality DESC, doc_id) through the
    // GroupTopK bounded-heap plan — per partition only k rows per host
    // reach the shuffle, the same scale contract as q44, so the cap
    // costs one k-bounded shuffle at any corpus size.
    "d25_host_cap" -> ((s, dir) => {
      val scored = qualityScored(docs(s, dir), extra = Seq("source"))
        .select(col("doc_id"), col("source"), col("quality_bp"))
        .withColumn("host",
          concat(col("source"), lit("/"),
            Sampling.hashBucket(col("doc_id"), 10).cast("string")))
      graft.plans.GroupTopK.topK(
        scored.select(col("doc_id"), col("host"), col("quality_bp")),
        groupCols = Seq("host"),
        orderBy = Seq(col("quality_bp").desc, col("doc_id")),
        k = 3)
    }),


    // d26: templated-document dedup — the near-dup family Jaccard misses
    // (same page template, different volatile slots). Docs = 3 mod 9 are
    // REPLACED by a planted order-confirmation template instantiated
    // with doc-specific numbers (the oracle plants identically), so the
    // whole planted population masks to ONE structural hash; the
    // digit-free natural corpus masks to itself, and any natural exact-
    // dup cluster that reaches the threshold is (correctly) templated
    // too. One map-side-combined aggregate + a broadcast verdict join —
    // the corpus never exchanges (see Dedup.templateDedup's ledger).
    "d26_template_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(9)) === 3,
          concat(lit("order "), col("doc_id").cast("string"),
            lit(" confirmed for user "), (col("doc_id") * 3).cast("string"),
            lit(" thank you for shopping")))
          .otherwise(col("text")).as("text"))
      // No spreadToParallelism: the per-row work is one regex + md5
      // (cheap, unlike the shingle HOFs), and the mask must stay a pure
      // scan-side projection — spreading would put TWO extra round-robin
      // exchanges of the full corpus ahead of the aggregate.
      Dedup.templateDedup(d, "doc_id", "text")
    }),


    // ExactSubstr verbatim-run pairs (Lee et al.): docs sharing a
    // >= 10-token verbatim run at ANY offset — the dedup geometry d03's
    // jaccard and d08's fixed chunks both miss. Doc-frequency cap 256
    // bounds the per-gram join quadratics (boilerplate grams dropped).
    "d15_exact_substr" -> ((s, dir) =>
      Dedup.exactSubstrPairs(Dedup.spreadToParallelism(docs(s, dir)),
        "doc_id", "text", k = 10, maxGramDocs = 256)),


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


    // d27 (round 18): the TAKEDOWN verb on the text side, driver-visible
    // (s20 proved it for vectors) — d17's probe after corpus docs with
    // doc_id % 4 = 1 are tombstoned out of the SAME memoized gram-index
    // artifact d17/d19/d21 share: `delete` returns a copy, the shared
    // artifact is untouched (the cachedLeaves ownership story), and the
    // probe excludes the deleted docs with a broadcast anti-join —
    // map-side, no rebuild. Tombstone-at-probe semantics EXACTLY: the
    // build-time doc-frequency cap was computed over the full corpus
    // (re-zeroing happens only at compact), so the oracle filters the
    // capped index AFTER the cap CTE, not before — an engine that
    // re-capped at probe time would hash-mismatch.
    "d27_delta_substr_takedown" -> ((s, dir) => {
      val all = Dedup.spreadToParallelism(docs(s, dir))
      val delta = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val idx = Dedup.memoizedGramIndex(corpus, "doc_id", "text",
        k = 10, maxGramDocs = 256, cacheKey = dir + "#gidx")
      val takedown = idx.delete(
        corpus.filter(pmod(col("doc_id"), lit(4)) === 1)
          .select(col("doc_id")))
      Dedup.deltaExactSubstrPairs(delta, takedown, "text")
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
    }),
  )

  /** Production-plan sides of the entries whose oracle form enumerates
    * the exact pair set in-query (the [[SimilarityQueries
    * .productionOverrides]] convention): the sketch/index pipelines ship;
    * the exact blocked/unblocked Jaccard walks are the oracle's recall
    * apparatus. Bench headline times these; the oracle form is priced
    * separately. */
  val productionOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d04_minhash_lsh" -> ((s, dir) => {
      val base = Dedup.spreadToParallelism(docs(s, dir))
        .select(col("doc_id"),
          graft.functions.WordShingles.wordShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      Dedup.minhashNearDups(base, "doc_id", "sh", threshold = 0.5)
        .select(col("a_id"), col("b_id")).distinct()
    }),
    "d05_simhash_pairs" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), TA.words(col("text")).as("toks"))
      Dedup.simhashNearDups(base, "doc_id", "toks", maxHamming = 3)
        .select(col("a_id"), col("b_id")).distinct()
    }),
    "d14_delta_minhash" -> ((s, dir) => {
      val withSh = Dedup.spreadToParallelism(docs(s, dir))
        .select(col("doc_id"), pmod(col("doc_id"), lit(10)).as("m"),
          graft.functions.WordShingles.wordShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val delta = withSh.filter(col("m") === 7).select(col("doc_id"), col("sh"))
      val corpus = withSh.filter(col("m") =!= 7).select(col("doc_id"), col("sh"))
      val idx = Dedup.memoizedMinHashIndex(corpus, "doc_id", "sh",
        cacheKey = dir + "#mhidx")
      Dedup.deltaNearDupsIndexed(delta, idx, "doc_id", "sh", threshold = 0.5)
        .select(col("new_id"), col("old_id")).distinct()
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // d26: identical planted template; the structural mask (digit runs →
    // '0', whitespace collapsed) and the >= 3 cluster rule are mirrored
    // verbatim; DuckDB takes the group-then-left-join form of the same
    // verdict.
    "d26_template_dedup" ->
      """WITH d AS (SELECT doc_id,
                           CASE WHEN doc_id % 9 = 3
                                THEN 'order ' || CAST(doc_id AS VARCHAR)
                                     || ' confirmed for user ' || CAST(doc_id * 3 AS VARCHAR)
                                     || ' thank you for shopping'
                                ELSE text END AS text
                    FROM documents),
              m AS (SELECT doc_id,
                           md5(regexp_replace(regexp_replace(text, '[0-9]+', '0', 'g'),
                                              ' +', ' ', 'g')) AS template_hash
                    FROM d),
              g AS (SELECT template_hash, count(*) AS n_docs, min(doc_id) AS keeper_id
                    FROM m GROUP BY 1 HAVING count(*) >= 3)
         SELECT m.doc_id, m.template_hash,
                g.keeper_id IS NOT NULL AS is_templated,
                (g.keeper_id IS NULL OR g.keeper_id = m.doc_id) AS keep
         FROM m LEFT JOIN g USING (template_hash)""",

    // d25: t02 quality CTE + the md5 host bucket + a per-host window cap
    // (the oracle's window IS the semantics; GroupTopK is the scale
    // plan).
    "d25_host_cap" ->
      """WITH t AS (SELECT doc_id, source, list_filter(string_split(text, ' '), w -> w <> '') AS ws
                    FROM documents),
              c AS (SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS n_tokens,
                           CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
                           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','is'))) AS BIGINT) AS n_stop
                    FROM t),
              q AS (SELECT doc_id,
                           source || '/' || CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS VARCHAR) AS host,
                           CAST(n_uniq * 5000 // n_tokens
                                + (n_tokens - n_stop) * 3000 // n_tokens
                                + least(n_tokens, 100) * 20 AS BIGINT) AS quality_bp
                    FROM c),
              r AS (SELECT doc_id, host, quality_bp,
                           CAST(row_number() OVER (PARTITION BY host
                                ORDER BY quality_bp DESC, doc_id) AS BIGINT) AS rnk
                    FROM q)
         SELECT doc_id, host, quality_bp, rnk FROM r WHERE rnk <= 3""",
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

    "d13_delta_dedup" -> D13Sql,

    "d07_dup_clusters" ->
      s"""WITH RECURSIVE $ComponentsCte
          SELECT id, cluster FROM comp""",

    "d09_dedup_apply" ->
      s"""WITH RECURSIVE $ComponentsCte
          SELECT doc_id, lang, source FROM documents
          WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)""",

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

    // d27: d17's chain with the tombstone filter applied to the capped
    // index AT PROBE — after keepc (the cap was computed over the full
    // corpus at build; re-zeroing is compact's job, not the probe's).
    "d27_delta_substr_takedown" ->
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
              live AS (SELECT doc_id, gram FROM idx WHERE doc_id % 4 <> 1),
              bat AS (SELECT gd.doc_id, gd.gram FROM gd JOIN keepd USING (gram))
         SELECT b.doc_id AS new_id, i.doc_id AS old_id,
                CAST(count(*) AS BIGINT) AS n_shared_runs
         FROM bat b JOIN live i USING (gram)
         GROUP BY 1, 2""",

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
          GROUP BY d.source""",
  )
}
