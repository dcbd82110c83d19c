package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver's parquet testdata (TESTDATA.md).
  *
  * Registers each `<dir>/<table>.parquet` as a temp view so the engine's
  * floorplan SQL (reference: opaque SQL strings shipped to Postgres,
  * `src/floorist/floorist.py:142`) runs natively on Spark via `spark.sql`.
  *
  * Scale notes: a temp view over a parquet path is just a logical plan —
  * Catalyst prunes columns and pushes filters into the scan, so
  * re-registering per query is free. On a real cluster these would be
  * catalog tables over partitioned directories; the API below is the same.
  */
object Sources {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table as a DataFrame (no view registration).
    *
    * `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark rejects by
    * default (PARQUET_TYPE_ILLEGAL). We read it as raw nanos via the legacy
    * conf and downcast to Spark's native microsecond TimestampType; the
    * sub-microsecond truncation is invisible to every query (all bucket to
    * >= 1s granularity or never emit the raw timestamp).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every testdata table that exists under `dir` as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    tableNames.foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      if (fs.exists(p)) table(spark, dir, t).createOrReplaceTempView(t)
    }
  }
}
