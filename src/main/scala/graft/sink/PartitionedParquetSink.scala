package graft.sink

import java.time.LocalDate

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-partitioned gzip-parquet sink — the floorist output contract.
  *
  * Reference semantics reproduced
  * (`src/floorist/floorist.py:94-110,165-178`):
  *  - target path `<root>/<prefix>/year_created=Y/month_created=M/day_created=D`
  *    with **unpadded** month/day (`%-m`/`%-d`);
  *  - gzip parquet, append mode (re-runs the same day add files);
  *  - `chunksize` rows per output file — floorist writes one file per
  *    fetched chunk; we reproduce the exact file count with
  *    `spark.sql.files.maxRecordsPerFile` (77 files for 1000 rows @ 13,
  *    `tests/test_floorist.py:170-178`);
  *  - empty result → zero-byte "folder marker" so downstream consumers see
  *    the partition exists (`floorist.py:102-110`).
  *
  * Scale note ([[FileContract]]): `Exact` coalesces to one task to match the
  * reference's sequential chunk loop file-for-file — correct but single
  * threaded, like the reference. `Scalable` keeps the natural partitioning
  * (every executor writes its own chunk files, still ≤ chunksize rows each)
  * — that's the 100 TB path, trading the exact-count contract for
  * parallelism. Default `Scalable`; tests pin `Exact`.
  */
sealed trait FileContract
object FileContract {
  /** Exactly ceil(rows/chunksize) files, like the reference's chunk loop. */
  case object Exact extends FileContract
  /** ≤ chunksize rows per file, file count = Σ per-partition ceil. */
  case object Scalable extends FileContract
}

sealed trait WriteResult
object WriteResult {
  case object Written extends WriteResult
  case object EmptyMarker extends WriteResult
}

class PartitionedParquetSink(
    spark: SparkSession,
    rootUrl: String,
    contract: FileContract = FileContract.Scalable) {

  /** `<prefix>/year_created=2026/month_created=8/day_created=12` — month and
    * day deliberately unpadded (Java has no `%-m`; render via `toString`). */
  def datePath(prefix: String, date: LocalDate): String =
    s"$prefix/year_created=${date.getYear}" +
      s"/month_created=${date.getMonthValue}" +
      s"/day_created=${date.getDayOfMonth}"

  def targetUrl(prefix: String, date: LocalDate): String =
    s"${rootUrl.stripSuffix("/")}/${datePath(prefix, date)}"

  private def fs(url: String): FileSystem =
    FileSystem.get(new java.net.URI(url), spark.sparkContext.hadoopConfiguration)

  /** Write `df` under the dated target. Empty input → folder marker only.
    *
    * The source plan executes exactly ONCE: the result is staged into a
    * scratch directory, and the staged files are then either renamed into
    * the target (non-empty) or replaced by the folder marker (empty). An
    * up-front `df.isEmpty` probe would run the query twice — a different
    * snapshot on a live JDBC source, and double cost everywhere. */
  def write(df: DataFrame, prefix: String, rowsPerFile: Option[Int],
            date: LocalDate = LocalDate.now()): WriteResult = {
    val target = targetUrl(prefix, date)
    val staging = s"${rootUrl.stripSuffix("/")}/.graft_staging/${java.util.UUID.randomUUID()}"
    val shaped = (rowsPerFile, contract) match {
      case (None, _)                        => df.coalesce(1)
      case (Some(_), FileContract.Exact)    => df.coalesce(1)
      case (Some(_), FileContract.Scalable) => df
    }
    val writer = shaped.write.mode("overwrite").option("compression", "gzip")
    val sized = rowsPerFile match {
      case Some(n) => writer.option("maxRecordsPerFile", n.toLong)
      case None    => writer
    }
    sized.parquet(staging)

    val f = fs(target)
    val stagingPath = new Path(staging)
    try {
      val parts = f.listStatus(stagingPath)
        .filter(_.getPath.getName.startsWith("part-"))
      // Footer-only row count of the staged output (no recompute).
      val written = spark.read.parquet(staging).count()
      f.mkdirs(new Path(target))
      if (written == 0) {
        WriteResult.EmptyMarker
      } else {
        parts.foreach { p =>
          // Part names embed the job UUID, so appends never collide. A
          // false return (Hadoop reports some failures without throwing)
          // must fail the dump — the staging dir is deleted in the finally
          // block, so a silently skipped rename would commit a truncated
          // dump; throwing engages the executor's wipe-and-retry instead.
          val dest = new Path(target, p.getPath.getName)
          if (!f.rename(p.getPath, dest))
            throw new java.io.IOException(s"rename ${p.getPath} -> $dest failed")
        }
        WriteResult.Written
      }
    } finally {
      f.delete(stagingPath, true)
    }
  }

  /** Wipe a (possibly partial) dump target before a retry — the analogue of
    * `wr.s3.delete_objects(target)` (`floorist.py:209-213`). Failures
    * propagate: the caller must abort the dump, not retry (A9). */
  def delete(prefix: String, date: LocalDate): Unit = {
    val target = targetUrl(prefix, date)
    fs(target).delete(new Path(target), true)
  }

  /** Startup connectivity check, analogue of the reference's bucket listing
    * with its AccessDenied fallback (`floorist.py:81-92`): some bucket
    * policies deny a status probe on the root itself but allow LIST beneath
    * it — the reference retries `ls` with a trailing slash; the Hadoop
    * analogue is a `listStatus` (LIST with trailing-slash prefix) after a
    * denied `exists` probe. Any other failure (no such bucket, bad
    * credentials, unreachable endpoint) reports false and the run aborts
    * before any dump. */
  def verify(): Boolean = {
    val root = new Path(new java.net.URI(rootUrl).getPath match {
      case "" => "/"
      case p  => p
    })
    val f = fs(rootUrl)
    try f.exists(root)
    catch {
      case e: java.io.IOException if isAccessDenied(e) =>
        try { f.listStatus(root); true }
        catch { case scala.util.control.NonFatal(_) => false }
      case scala.util.control.NonFatal(_) => false
    }
  }

  private def isAccessDenied(e: Throwable): Boolean =
    e.isInstanceOf[org.apache.hadoop.security.AccessControlException] || {
      val m = Option(e.getMessage).getOrElse("")
      m.contains("AccessDenied") || m.contains("Access Denied") || m.contains("403")
    }
}
