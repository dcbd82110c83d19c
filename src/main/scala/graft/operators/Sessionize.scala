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
}
