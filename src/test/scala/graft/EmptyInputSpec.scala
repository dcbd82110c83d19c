package graft

import org.apache.spark.sql.functions._

/** Every shipped query must run (to zero rows, not an exception) against
  * an EMPTY corpus — the first thing a new deployment or a too-aggressive
  * upstream filter feeds the engine. Catches eager `.head` on empty
  * aggregates, KMeans fits on zero points, and sequence/slice arithmetic
  * that only works for n >= 1. */
class EmptyInputSpec extends SparkSpecBase {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dst = tmpDir("empty_sf")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df = graft.sources.Sources.table(spark, src, t).limit(0)
      // events ships as raw int64 NANOS in the driver testdata; Sources
      // converts on read, so the empty twin must store the raw shape back.
      val raw = if (t == "events")
        df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      else df
      raw.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    dst
  }

  test("every query inventory entry runs to completion on an empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}") }
    }
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
