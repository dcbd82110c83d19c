package graft.core

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.slf4j.LoggerFactory

import graft.sink.{PartitionedParquetSink, WriteResult}

/** Executes one floorplan dump with the reference's retry semantics
  * (`src/floorist/floorist.py:180-256`):
  *
  *  - run query → write chunks; success commits the dump;
  *  - on a retryable error: sleep `5·2^attempt`s, wipe the partial target,
  *    re-run the whole dump (idempotence via wipe-and-redo,
  *    `tests/test_floorist_standalone.py:162-200`);
  *  - if the cleanup itself fails, abort the dump — no further retries
  *    (`floorist.py:209-213`, `tests/test_floorist_standalone.py:75-113`);
  *  - non-retryable errors fail immediately; the caller keeps running later
  *    dumps (error isolation, A10).
  *
  * `sleeper` is injectable so tests assert the 5s/10s backoff without
  * wall-clock waits.
  */
class DumpExecutor(
    sink: PartitionedParquetSink,
    runQuery: String => DataFrame,
    maxRetries: Int = RetryPolicy.MaxRetries,
    retryDelaySeconds: Long = RetryPolicy.RetryDelaySeconds,
    sleeper: Long => Unit = s => Thread.sleep(s * 1000),
    today: () => LocalDate = () => LocalDate.now(),
    /** Wraps each ATTEMPT (query + write) and supplies the query runner
      * for it. The default runs `runQuery` with no per-attempt state; the
      * JDBC deployment passes [[graft.sources.SnapshotJdbcSource
      * .dumpAttemptScope]], which pins a FRESH exported snapshot per
      * attempt (the reference opens a fresh transaction per attempt,
      * `floorist.py:148-152` + the retry loop at `:199-256`) and releases
      * the anchor after the write — inside the retry classifier's reach,
      * so pin-time connection errors retry like query-time ones. */
    attemptScope: DumpExecutor.AttemptScope = null) {

  private val scope: DumpExecutor.AttemptScope =
    if (attemptScope != null) attemptScope else (_, body) => body(runQuery)

  private val log = LoggerFactory.getLogger(classOf[DumpExecutor])

  /** @return true iff the dump succeeded. Never throws — any defect in one
    * floorplan row fails that dump only (reference error isolation, A10). */
  def execute(raw: Map[String, Any], dumpNo: Int): Boolean = {
    val row =
      try FloorplanParser.toRow(raw)
      catch {
        case e: InvalidFloorplanRow =>
          log.error(s"[Dump #$dumpNo] Invalid floorplan row: ${e.getMessage}")
          return false
        case scala.util.control.NonFatal(e) =>
          log.error(s"[Dump #$dumpNo] Unreadable floorplan row: $e")
          return false
      }
    execute(row, dumpNo)
  }

  def execute(row: FloorplanRow, dumpNo: Int): Boolean = {
    val date = today()
    var attempt = 0
    while (true) {
      try {
        if (attempt > 0) {
          // Wipe partial output from the failed attempt before redoing.
          try sink.delete(row.prefix, date)
          catch {
            case scala.util.control.NonFatal(cleanupEx) =>
              log.error(s"[Dump #$dumpNo] Cleanup of partial output failed, " +
                s"aborting dump: $cleanupEx")
              return false
          }
        }
        scope(row, { run =>
          val df = run(row.query)
          sink.write(df, row.prefix, row.rowsPerFile, date)
        }) match {
          case WriteResult.Written =>
            log.info(s"[Dump #$dumpNo] Written parquet to ${row.prefix}")
          case WriteResult.EmptyMarker =>
            log.info(s"[Dump #$dumpNo] Empty result, wrote folder marker for ${row.prefix}")
        }
        return true
      } catch {
        // NonFatal only: an OutOfMemoryError/LinkageError means the JVM is
        // no longer trustworthy — converting it into a per-dump failure and
        // carrying on would keep writing from a corrupted process. The
        // reference's `except Exception` has the same fatal/non-fatal line.
        case scala.util.control.NonFatal(ex) =>
          RetryPolicy.evaluate(ex, attempt, maxRetries) match {
            case RetryPolicy.Failure =>
              log.error(s"[Dump #$dumpNo] Failed: $ex")
              return false
            case RetryPolicy.Exhausted =>
              log.error(s"[Dump #$dumpNo] Retries exhausted after ${attempt + 1} attempts: $ex")
              return false
            case RetryPolicy.Retry =>
              val backoff = RetryPolicy.backoffSeconds(attempt, retryDelaySeconds)
              log.warn(s"[Dump #$dumpNo] Retryable error (attempt ${attempt + 1}), " +
                s"sleeping ${backoff}s: $ex")
              sleeper(backoff)
              attempt += 1
          }
      }
    }
    false // unreachable
  }
}

object DumpExecutor {
  /** Runs one dump attempt: receives the dump's [[FloorplanRow]] (so a
    * deployment can honor per-dump options like the parallel-read
    * partitioning block) and the attempt body (query → write →
    * [[WriteResult]]), and must invoke the body exactly once with the
    * query runner to use for that attempt. Lets a deployment scope
    * per-attempt resources (a pinned snapshot's anchor connection)
    * around the body. */
  type AttemptScope =
    (FloorplanRow, (String => DataFrame) => WriteResult) => WriteResult
}
