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
    readUrl(spark, jdbc.url, JdbcDrivers.resolve(jdbc.url),
      Map("user" -> jdbc.user, "password" -> jdbc.password),
      query, fetchSize, uuidColumns, partitioning)
  }

  /** Driver-agnostic option wiring (separated so the read path is testable
    * against an embedded database — no Postgres exists in CI).
    * `sessionInit` runs on EVERY data connection right after it opens and
    * before the query (Spark's public `sessionInitStatement` hook) — the
    * seam [[SnapshotJdbcSource]] uses to pin all partitions to one
    * exported snapshot. */
  private[graft] def readUrl(
      spark: SparkSession,
      url: String,
      driver: String,
      connProps: Map[String, String],
      query: String,
      fetchSize: Int = 1000,
      stringColumns: Seq[String] = Nil,
      partitioning: Option[(String, Long, Long, Int)] = None,
      sessionInit: Option[String] = None): DataFrame = {
    var reader = spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("fetchsize", fetchSize)
    sessionInit.foreach(s => reader = reader.option("sessionInitStatement", s))
    connProps.foreach { case (k, v) => reader = reader.option(k, v) }
    if (stringColumns.nonEmpty)
      reader = reader.option("customSchema", stringColumns.map(c => s"$c STRING").mkString(", "))
    partitioning match {
      case Some((col, lower, upper, n)) =>
        // Spark rejects `query` + `partitionColumn` together: a partitioned
        // read must come in as a derived table so the split predicates can
        // be pushed into it.
        reader = reader.option("dbtable", s"($query) AS graft_subq")
          .option("partitionColumn", col)
          .option("lowerBound", lower).option("upperBound", upper)
          .option("numPartitions", n)
      case None =>
        // single partition: reference-faithful snapshot semantics
        reader = reader.option("query", query)
    }
    reader.load()
  }
}
