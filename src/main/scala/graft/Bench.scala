package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is executed once untimed (JIT + codegen + file-listing
  * warm-up) and then timed — steady-state throughput is the number that
  * scales to a long-lived cluster, not first-run compilation cost.
  *
  * The timed action is a noop-sink write, not `count()`: a count lets
  * Catalyst prune every unreferenced projection, so map-only queries would
  * be timed as footer-level row counts with their expressions never
  * evaluated. The noop sink materializes every output column through the
  * full plan and discards the bytes.
  */
object Bench {

  private def exhaust(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try exhaust(SparkEntry.queries(name)(spark, sfDir))
      catch { case _: Throwable => }
    }
    val errors = scala.collection.mutable.Buffer[String]()
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try exhaust(SparkEntry.queries(name)(spark, sfDir))
      catch {
        case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name FAILED: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // A failed query must not silently improve the total: surface it.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
