package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: consecutive events of the
  * same key belong to one session while the event-time gap stays within
  * `maxGap`; a larger gap starts a new session.
  *
  * Plan shape (the one you want at 100 TB): ONE shuffle on the session key
  * feeds every stage — the `lag` window, the running-sum session counter,
  * and the final per-session aggregate all share the same hash partitioning
  * on `keyCol`, so Catalyst reuses the single Exchange (EnsureRequirements
  * sees compatible `HashPartitioning`; `.explain` shows one shuffle). No
  * self-join formulation (the naive SQL alternative) and no driver-side
  * state.
  *
  * Gap comparison is in microseconds (`unix_micros`) — event timestamps
  * carry sub-second precision and a seconds-granularity cast would merge
  * sessions that straddle a whole-second boundary differently across
  * engines.
  *
  * The streaming twin of this operator is
  * [[graft.streaming.EventStreams]]'s event-time session windows — same
  * semantics, incremental state instead of a window scan.
  */
object Sessionize {

  /** One row per (key, session): session bounds, size, and value sum.
    *
    * `sess_idx` is the per-key session ordinal (1-based, in event-time
    * order) — deterministic because the window orders by (ts, tiebreak).
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               tieBreak: String, valueCol: String,
               maxGap: Column): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieBreak))
    val gapUs = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(byKey))
    val newSession = when(gapUs.isNull || gapUs > maxGap, 1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("sess_idx",
        sum(col("__new")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("sess_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
  }

  /** q48: funnel analysis — the ClickHouse-`windowFunnel`-shaped ordered
    * sequence match: for each user, the furthest step of `steps` reached
    * IN ORDER, with every post-anchor step landing within `windowMicros`
    * of the FIRST step's event. Semantics are the deterministic greedy
    * scan (anchor = the user's first step-1 event; a later step-1 event
    * never re-anchors — documented, and mirrored verbatim in the
    * oracle): walking events in (ts, tiebreak) order, state (stage,
    * anchor) advances on `code = stage + 1` within the window.
    *
    * Plan shape: the filter to funnel-relevant events is scan-side
    * (pushed to the source); ONE shuffle on the user key feeds the
    * per-user sorted collect; the scan itself is a codegen'd
    * `aggregate` HOF over the per-user array — per-user state is two
    * fields, never a cross-user structure, and a user's event list is
    * session-sized (the q38 bounded-group argument; a user with
    * pathological event counts would need the d03-style cap, noted).
    * Output: (userCol, funnel_stage) for every user with ≥ 1 relevant
    * event — stage 0 is unreachable by construction (their first
    * relevant event either starts the funnel or is a later step that
    * leaves stage 0... which IS stage 0: emitted, the mirror agrees). */
  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   tieBreak: String, typeCol: String,
                   steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMicros > 0, "window must be positive")
    val code = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (st, i)) =>
      when(col(typeCol) === st, lit(i + 1)).otherwise(acc)
    }
    val n = steps.size
    events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), unix_micros(col(tsCol)).as("t"),
        col(tieBreak).as("tb"), code.as("code"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col("t"), col("tb"), col("code")))).as("evs"))
      .select(col(userCol), expr(
        s"""aggregate(evs,
              named_struct('stage', 0, 'anchor', CAST(0 AS BIGINT)),
              (a, x) -> CASE
                WHEN x.code = a.stage + 1
                     AND (a.stage = 0 OR x.t - a.anchor <= ${windowMicros}L)
                  THEN named_struct('stage', a.stage + 1,
                                    'anchor', IF(a.stage = 0, x.t, a.anchor))
                ELSE a END,
              a -> a.stage)""").cast("long").as("funnel_stage"))
  }
}
