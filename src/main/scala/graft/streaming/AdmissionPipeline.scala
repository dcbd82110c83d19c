package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable ingest admission — the engine's ~27 per-modality gate twins
  * (quality, langid, blocklist, decode gate, bloom decontamination,
  * fingerprint/index probes of standing tables, token budget) unified
  * behind ONE chaining discipline instead of ad-hoc per-deployment
  * wiring. A real curation deployment runs arrivals through a SEQUENCE
  * of gates; what it needs from the harness is (a) sequential semantics
  * — a document dropped at stage i is never evaluated (or charged) at
  * stage i+1, (b) per-stage drop accounting (the m27 admission report
  * generalized to the live path), and (c) a single state discipline:
  * stages themselves add NO state store, so the composition runs
  * identically on a batch frame and a streaming one, and any
  * watermark/pair-dedup exactly-once machinery is applied ONCE by the
  * caller on the composed output — never per stage (the one-watermark
  * rule; per-stage state multiplies store sizes and makes replay
  * semantics path-dependent).
  *
  * Scale shape: [[Stage.rowLocal]] stages are pure `withColumn`s — they
  * fuse into the surviving scan with zero extra exchanges.
  * [[Stage.verdict]] stages stitch an id-keyed verdict frame back with
  * one equi-join — the shape of the gate family's existing operators
  * (e.g. [[graft.operators.TextAnalysis.blocklistFilter]]'s
  * explode+aggregate); the join keys on the id the stage already
  * aggregated by, so no NEW shuffle geometry is introduced. Probes of
  * standing artifacts (fingerprint tables, bloom bits, indexes) are
  * stream-static joins/filters and remain stateless. */
object AdmissionPipeline {

  /** One admission stage: `decide` takes the current survivors (ALL
    * input columns) and returns them with `admit` (boolean) + `reason`
    * (string, "" on admit) appended. Build with [[Stage.rowLocal]] /
    * [[Stage.verdict]] unless a custom shape is needed. */
  final case class Stage(name: String, decide: DataFrame => DataFrame)

  object Stage {
    /** A row-local gate: admit/reason are pure column expressions over
      * the surviving rows — no join, no shuffle, fuses into the scan
      * (the dsirScoreStream/qualityScoreStream discipline). */
    def rowLocal(name: String, admit: Column, reason: Column): Stage =
      Stage(name, df => df.withColumn("admit", admit)
        .withColumn("reason", reason))

    /** An id-keyed verdict gate: `f` maps the survivors to one
      * (idCol, admit, reason) row each (the shape of the existing gate
      * operators); the combinator stitches the verdict back with one
      * equi-join on `idCol`. BATCH-side glue: on a streaming frame the
      * stitch-back would be a stream-stream self-join (not append-safe)
      * — and the gates that need this shape (explode+aggregate like
      * [[graft.operators.TextAnalysis.blocklistFilter]]) are not
      * append-stream-safe to begin with. Stream topologies use
      * [[rowLocal]] stages or a bare [[Stage]] whose decide performs a
      * stream-STATIC join against a standing artifact. */
    def verdict(name: String, idCol: String)(f: DataFrame => DataFrame): Stage =
      Stage(name, df => df.join(
        f(df).select(col(idCol), col("admit"), col("reason")), Seq(idCol)))
  }

  /** Chain `stages` over `input` with sequential semantics: stage i+1
    * sees only stage i's admits (verdict columns stripped between
    * stages). Returns ONE row per input row — the original columns plus
    * (admitted, stage, reason), where stage/reason name the FIRST
    * dropping stage ("" on full admission). Composes on batch and
    * streaming frames alike (stages are stateless by contract).
    *
    * Plan shape: the disposition is a union of per-stage drop branches
    * plus the final survivors. On a BATCH frame each stage's decided
    * frame is localCheckpoint-materialized before it fans out: a
    * decided frame feeds BOTH its drop branch and the next stage's
    * survivors, and a [[Stage.verdict]] stage additionally reads its
    * survivors twice (join left side + the verdict subplan), so without
    * the checkpoint the stage-1 work is re-evaluated once per
    * DOWNSTREAM BRANCH — ~2^k copies of an expensive gate decode by
    * stage k (measured on m37's three-stage media chain: 5.9 s median /
    * 19.3 s worst vs 1.9 s for the single-pass m27 gate). The
    * checkpoint bounds every stage to exactly one evaluation — the same
    * thing landing the per-stage disposition table does in a real
    * deployment. (At 100 TB the swap is exactly that: land each stage's
    * disposition as a table instead of executor-local checkpoint blocks
    * — localCheckpoint pins the decided frame in block storage and does
    * not survive executor loss.) Streaming frames cannot checkpoint
    * mid-plan; there the branch-union shape stands, ENFORCED cheap by a
    * structural guard (round 19): a stream-legal stage must read its
    * survivors exactly once (rowLocal columns, or a stream-STATIC
    * join/filter against a standing artifact). A stage whose decide
    * re-reads the streaming input — the [[Stage.verdict]] stitch-back
    * shape — would re-evaluate every upstream stage once per downstream
    * branch (the same ~2^k blowup the batch path checkpoints away, with
    * no checkpoint available to stop it), so it is rejected at
    * CONSTRUCTION with a require instead of discovered at 100 TB.
    *
    * EAGER AT CONSTRUCTION on batch frames: the per-stage
    * localCheckpoint executes k Spark jobs while the disposition is
    * being BUILT — run() is not a lazy plan assembly. Callers composing
    * plans they may never execute should be aware they pay the stage
    * work up front. */
  def run(input: DataFrame, stages: Seq[Stage]): DataFrame = {
    require(stages.nonEmpty, "admission pipeline needs at least one stage")
    require(stages.map(_.name).distinct.size == stages.size,
      s"stage names must be unique: ${stages.map(_.name).mkString(", ")}")
    val inCols = input.columns.toSeq
    require(!inCols.contains("admit") && !inCols.contains("reason") &&
      !inCols.contains("admitted") && !inCols.contains("stage"),
      "input must not already carry admit/reason/admitted/stage columns")
    var survivors = input
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    stages.foreach { st =>
      val decidedPlan = st.decide(survivors)
      require(decidedPlan.columns.contains("admit") &&
        decidedPlan.columns.contains("reason"),
        s"stage ${st.name} must emit admit + reason columns")
      val decided =
        if (decidedPlan.isStreaming) {
          // the stream-stage cost guard (see scaladoc): survivors' plan
          // must appear ONCE in the decided plan. Counting streaming
          // leaves catches the re-read structurally — a rowLocal stage
          // or a stream-static join keeps the count; a decide that
          // self-joins its input doubles it.
          val inLeaves = survivors.queryExecution.analyzed
            .collectLeaves().count(_.isStreaming)
          val outLeaves = decidedPlan.queryExecution.analyzed
            .collectLeaves().count(_.isStreaming)
          require(outLeaves <= inLeaves,
            s"stage ${st.name}: a stream-legal stage must read its " +
              s"survivors exactly once (rowLocal, or a stream-static " +
              s"join against a standing artifact) — this decide reads " +
              s"the streaming input $outLeaves times, which re-evaluates " +
              s"every upstream stage once per downstream branch " +
              s"(~2^k; the batch path checkpoints that away, a stream " +
              s"cannot). Use Stage.rowLocal or land the verdict with " +
              s"foreachBatch instead.")
          decidedPlan
        } else decidedPlan.localCheckpoint()
      parts += decided.filter(!col("admit"))
        .select(inCols.map(col) ++ Seq(lit(false).as("admitted"),
          lit(st.name).as("stage"), col("reason")): _*)
      survivors = decided.filter(col("admit")).select(inCols.map(col): _*)
    }
    parts += survivors.select(inCols.map(col) ++ Seq(
      lit(true).as("admitted"), lit("").as("stage"), lit("").as("reason")): _*)
    parts.reduce(_.unionByName(_))
  }

  /** The m27 admission report over [[run]]'s disposition: one row per
    * (stage, admitted, reason) class with integer-bp shares of the input
    * population. Batch-side reporting (one hash aggregate over the
    * disposition; on a stream, report over the landed disposition
    * table). */
  def report(disposition: DataFrame): DataFrame = {
    val g = disposition.groupBy(col("stage"), col("admitted"), col("reason"))
      .agg(count(lit(1)).as("n_docs"))
    // One evaluation of the aggregate (round 19): the former
    // crossJoin(broadcast(g.agg(sum))) re-ran the whole disposition
    // aggregate a second time inside the total's subplan — measured
    // ~0.6 s of the m37 bench time at sf0.1. The total now rides an
    // unpartitioned window over the REPORT frame, which is bounded by
    // construction (≤ stages × distinct reasons rows — the p02
    // bounded-window convention), so the disposition is aggregated
    // exactly once at any scale.
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    g.withColumn("__tot", sum(col("n_docs")).over(w))
      .withColumn("share_bp",
        expr("CAST(n_docs * 10000 DIV __tot AS BIGINT)"))
      .drop("__tot")
  }
}
