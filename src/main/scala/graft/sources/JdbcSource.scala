package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.JdbcConfig

/** Postgres JDBC source — the Spark-native analogue of the reference's
  * streaming server-side cursor (`src/floorist/floorist.py:123-146`).
  *
  *  - `fetchsize` = floorplan chunksize reproduces the bounded-memory
  *    streaming read (`stream_results=True`);
  *  - `customSchema` maps `uuid` columns to STRING, replacing the psycopg2
  *    OID-2950 adapter (`floorist.py:27-29,117-139`) — Spark's Postgres
  *    dialect otherwise surfaces uuid as an unsupported OTHER type;
  *  - `numPartitions` defaults to 1: a single-partition read is the only way
  *    to keep the reference's one-snapshot-per-dump transaction semantics
  *    (SURVEY.md §7.4 risk #3). Callers opt into parallel reads by passing a
  *    partition column, accepting per-partition snapshots.
  */
object JdbcSource {

  def read(
      spark: SparkSession,
      jdbc: JdbcConfig,
      query: String,
      fetchSize: Int = 1000,
      uuidColumns: Seq[String] = Nil,
      partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    GraftPostgresDialect.register()
    var reader = spark.read.format("jdbc")
      .option("url", jdbc.url)
      .option("user", jdbc.user)
      .option("password", jdbc.password)
      .option("driver", "org.postgresql.Driver")
      .option("query", query)
      .option("fetchsize", fetchSize)
    if (uuidColumns.nonEmpty)
      reader = reader.option("customSchema", uuidColumns.map(c => s"$c STRING").mkString(", "))
    partitioning match {
      case Some((col, lower, upper, n)) =>
        reader = reader.option("partitionColumn", col)
          .option("lowerBound", lower).option("upperBound", upper)
          .option("numPartitions", n)
      case None => // single partition: reference-faithful snapshot semantics
    }
    reader.load()
  }
}
