package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 8: events.ts physical-encoding adaptivity.
  *
  * The driver's testdata generator has shipped `events.ts` in two physical
  * parquet encodings across rounds: INT64 TIMESTAMP(NANOS) (read as raw
  * longs via the legacy conf) and plain `timestamp[us]` without UTC
  * adjustment (inferred TIMESTAMP_NTZ). Round 7's bench lost all ten
  * event-table queries to the second encoding; this suite pins the loader
  * contract so a future re-encoding is a spec failure, not a silent
  * ten-query outage at the driver gate.
  */
class Round8Spec extends SparkSpecBase {

  private val rows = Seq(
    (1L, "2024-03-01 10:15:30.123456", 7L, "click", 1.5, """{"k":1}"""),
    (2L, "2024-03-01 11:00:00.000001", 8L, "view", 2.5, """{"k":2}"""),
    (3L, "2024-03-02 00:59:59.999999", 7L, "click", 3.5, """{"k":3}"""))

  private def base = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts_str", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_str"))).drop("ts_str")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("events.ts: TIMESTAMP_NTZ parquet normalizes to TimestampType, value-preserving") {
    val dir = tmpDir("r8-events-ntz")
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.sources.Sources.table(spark, dir, "events")
    assert(got.schema("ts").dataType === TimestampType)
    val micros = got.select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    val want = base.select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(micros.sameElements(want),
      s"NTZ load changed values: got ${micros.toSeq} want ${want.toSeq}")
  }

  test("events.ts: legacy INT64-nanos parquet normalizes to TimestampType, micros-truncated") {
    val dir = tmpDir("r8-events-nanos")
    // Spark cannot WRITE nanos-typed parquet; the loader's legacy branch
    // keys on the LongType it sees under nanosAsLong=true, so a raw BIGINT
    // nanos column exercises the same code path the old testdata hit.
    base.withColumn("ts", (unix_micros(col("ts")) * 1000L + 789L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.sources.Sources.table(spark, dir, "events")
    assert(got.schema("ts").dataType === TimestampType)
    val micros = got.select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    val want = base.select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(micros.sameElements(want),
      "nanos load must truncate sub-microsecond precision and keep the micros")
  }

  test("events.ts: an unrecognized physical type fails loudly, not downstream") {
    val dir = tmpDir("r8-events-bad")
    base.withColumn("ts", col("ts").cast(StringType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      graft.sources.Sources.table(spark, dir, "events")
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
