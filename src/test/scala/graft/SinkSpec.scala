package graft

import java.time.LocalDate

import graft.sink.{FileContract, PartitionedParquetSink, WriteResult}

class SinkSpec extends SparkSpecBase {
  private val date = LocalDate.of(2026, 8, 3) // unpadded month AND day digits

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(dir)
    if (!root.exists()) Seq.empty
    else walk(root).filter(_.getName.endsWith(".parquet"))
  }

  test("date path uses unpadded month and day (reference %-m/%-d)") {
    val sink = new PartitionedParquetSink(spark, "file:///out")
    assert(sink.datePath("dumps/people", date) ==
      "dumps/people/year_created=2026/month_created=8/day_created=3")
  }

  test("chunk-file contract: 1000 rows @ chunksize 13 -> 77 files (Exact)") {
    val root = tmpDir("sink-chunks")
    val sink = new PartitionedParquetSink(spark, s"file://$root", FileContract.Exact)
    val df = spark.range(0, 1000).toDF("n")
    assert(sink.write(df, "series", Some(13), date) == WriteResult.Written)
    val files = parquetFiles(s"$root/series")
    assert(files.size == 77, s"expected 77 files, got ${files.size}")
    assert(files.forall(_.getName.contains(".gz.")), "gzip codec expected")
  }

  test("chunksize 0 -> exactly one file") {
    val root = tmpDir("sink-onefile")
    val sink = new PartitionedParquetSink(spark, s"file://$root", FileContract.Exact)
    sink.write(spark.range(0, 1000).toDF("n"), "series0", None, date)
    assert(parquetFiles(s"$root/series0").size == 1)
  }

  test("append mode: re-running the same day adds files") {
    val root = tmpDir("sink-append")
    val sink = new PartitionedParquetSink(spark, s"file://$root", FileContract.Exact)
    val df = spark.range(0, 10).toDF("n")
    sink.write(df, "app", None, date)
    sink.write(df, "app", None, date)
    assert(parquetFiles(s"$root/app").size == 2)
  }

  test("empty result writes a folder marker, no parquet") {
    val root = tmpDir("sink-empty")
    val sink = new PartitionedParquetSink(spark, s"file://$root")
    val empty = spark.range(0, 10).toDF("n").filter("n < 0")
    assert(sink.write(empty, "none", Some(1000), date) == WriteResult.EmptyMarker)
    val target = new java.io.File(
      s"$root/none/year_created=2026/month_created=8/day_created=3")
    assert(target.isDirectory)
    assert(parquetFiles(s"$root/none").isEmpty)
  }

  test("delete wipes the dump target for retry redo") {
    val root = tmpDir("sink-del")
    val sink = new PartitionedParquetSink(spark, s"file://$root", FileContract.Exact)
    sink.write(spark.range(0, 10).toDF("n"), "wipe", None, date)
    assert(parquetFiles(s"$root/wipe").nonEmpty)
    sink.delete("wipe", date)
    assert(parquetFiles(s"$root/wipe").isEmpty)
  }

  test("scalable contract keeps input partitioning but bounds rows per file") {
    val root = tmpDir("sink-scalable")
    val sink = new PartitionedParquetSink(spark, s"file://$root", FileContract.Scalable)
    sink.write(spark.range(0, 1000).repartition(4).toDF("n"), "par", Some(100), date)
    val files = parquetFiles(s"$root/par")
    // 4 partitions of ~250 rows, each split into ceil(250/100)=3 files.
    assert(files.size >= 10 && files.size <= 12, s"got ${files.size}")
  }
}
