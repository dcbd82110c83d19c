package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver's parquet testdata (TESTDATA.md).
  *
  * Registers each `<dir>/<table>.parquet` as a temp view so the engine's
  * floorplan SQL (reference: opaque SQL strings shipped to Postgres,
  * `src/floorist/floorist.py:142`) runs natively on Spark via `spark.sql`.
  *
  * Scale notes: a temp view over a parquet path is just a logical plan —
  * Catalyst prunes columns and pushes filters into the scan. The plan is
  * memoized per (session, dir, table): `spark.read.parquet` lists files and
  * reads footers for schema inference, which on object storage is a LIST +
  * GET per call — a catalog would do that once, so the cache restores
  * catalog-like behavior. The testdata files are immutable, so a cached
  * plan never goes stale.
  */
object Sources {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** (session, dir, table) -> resolved plan. Only POSITIVE lookups are
    * memoized: caching "file absent" would make a table created later in
    * the session permanently invisible. Entries for stopped sessions are
    * evicted on access so test suites that churn sessions don't accumulate
    * dead plans.
    */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def cached(spark: SparkSession, dir: String, name: String): Option[DataFrame] = {
    cache.keysIterator
      .filter(_._1.sparkContext.isStopped)
      .foreach(cache.remove)
    val key = (spark, dir, name)
    cache.get(key).orElse {
      val loaded = load(spark, dir, name)
      loaded.foreach(cache.put(key, _))
      loaded
    }
  }

  /** Read one table as a DataFrame (no view registration).
    *
    * `events.ts` has shipped in two physical encodings across testdata
    * generations: INT64 TIMESTAMP(NANOS) (Spark rejects by default —
    * PARQUET_TYPE_ILLEGAL — so we read raw nanos via the legacy conf and
    * downcast), and plain `timestamp[us]` without UTC adjustment (Spark
    * infers TIMESTAMP_NTZ). Both normalize to Spark's native microsecond
    * TimestampType here so every downstream query sees one stable type;
    * with the session timezone pinned to UTC the NTZ→TZ cast is
    * value-preserving. Sub-microsecond truncation on the nanos path is
    * invisible to every query (all bucket to >= 1s granularity or never
    * emit the raw timestamp).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cached(spark, dir, name).getOrElse(
      throw new java.io.FileNotFoundException(s"$dir/$name.parquet"))

  private def load(spark: SparkSession, dir: String, name: String): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$name.parquet"))) None
    else if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ts = raw.schema("ts").dataType match {
        case LongType => timestamp_micros(expr("ts div 1000")) // legacy INT64 nanos
        case TimestampNTZType => col("ts").cast(TimestampType) // UTC session tz: value-preserving
        case TimestampType => col("ts")
        case other => throw new IllegalStateException(
          s"events.ts: unsupported physical type $other")
      }
      Some(raw.withColumn("ts", ts))
    } else Some(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Register every testdata table that exists under `dir` as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      cached(spark, dir, t).foreach(_.createOrReplaceTempView(t))
    }

  /** Read a non-parquet lake file. `schema` is REQUIRED for csv/json:
    * schema inference runs a full extra pass over the data (at 100 TB, a
    * second 100 TB scan) and silently widens types; an explicit schema
    * makes the read single-pass and deterministic. ORC/parquet carry their
    * own schema. CSV reads are header-aware and `PERMISSIVE` with a
    * `_corrupt_record` column only when the caller's schema declares one —
    * malformed rows otherwise become nulls, never a job abort (same
    * isolation contract as the floorplan scan).
    */
  def readFormat(spark: SparkSession, path: String, format: String,
                 schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    format.toLowerCase match {
      case "parquet" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      case "csv" =>
        val s = schema.getOrElse(throw new IllegalArgumentException(
          "csv needs an explicit schema (inference = extra full-data pass)"))
        spark.read.schema(s).option("header", "true").option("mode", "PERMISSIVE").csv(path)
      case "json" =>
        val s = schema.getOrElse(throw new IllegalArgumentException(
          "json needs an explicit schema (inference = extra full-data pass)"))
        spark.read.schema(s).option("mode", "PERMISSIVE").json(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
}
