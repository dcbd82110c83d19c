package graft

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

import graft.core.{DumpExecutor, FloorplanRow}
import graft.sink.{FileContract, PartitionedParquetSink}

class DumpExecutorSpec extends SparkSpecBase {
  private val date = LocalDate.of(2026, 8, 3)

  private class RecordingSink(root: String)
      extends PartitionedParquetSink(spark, s"file://$root", FileContract.Exact) {
    var deletes = 0
    var failDelete = false
    override def delete(prefix: String, d: LocalDate): Unit = {
      deletes += 1
      if (failDelete) throw new RuntimeException("cleanup blew up")
      super.delete(prefix, d)
    }
  }

  private def executor(sink: PartitionedParquetSink, run: String => DataFrame,
                       sleeps: scala.collection.mutable.Buffer[Long]) =
    new DumpExecutor(sink, run, sleeper = sleeps.append(_), today = () => date)

  private val row = FloorplanRow("retry/out", "irrelevant", Some(0))

  test("retryable failure: backoff 5s,10s then success; partial output wiped") {
    val sink = new RecordingSink(tmpDir("exec-retry"))
    val sleeps = scala.collection.mutable.Buffer[Long]()
    var calls = 0
    val run: String => DataFrame = _ => {
      calls += 1
      if (calls <= 2) throw new RuntimeException("SerializationFailure: try again")
      spark.range(0, 5).toDF("n")
    }
    assert(executor(sink, run, sleeps).execute(row, 1))
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(5L, 10L))
    assert(sink.deletes == 2) // wiped before each redo
  }

  test("retries exhausted after 3 attempts") {
    val sink = new RecordingSink(tmpDir("exec-exhaust"))
    val sleeps = scala.collection.mutable.Buffer[Long]()
    var calls = 0
    val run: String => DataFrame = _ => {
      calls += 1; throw new RuntimeException("conflict with recovery")
    }
    assert(!executor(sink, run, sleeps).execute(row, 1))
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(5L, 10L))
  }

  test("non-retryable failure: single attempt, no sleeps") {
    val sink = new RecordingSink(tmpDir("exec-fatal"))
    val sleeps = scala.collection.mutable.Buffer[Long]()
    var calls = 0
    val run: String => DataFrame = _ => { calls += 1; throw new RuntimeException("syntax error") }
    assert(!executor(sink, run, sleeps).execute(row, 1))
    assert(calls == 1)
    assert(sleeps.isEmpty)
  }

  test("cleanup failure aborts the dump without further retries") {
    val sink = new RecordingSink(tmpDir("exec-cleanupfail"))
    sink.failDelete = true
    val sleeps = scala.collection.mutable.Buffer[Long]()
    var calls = 0
    val run: String => DataFrame = _ => {
      calls += 1; throw new RuntimeException("SerializationFailure")
    }
    assert(!executor(sink, run, sleeps).execute(row, 1))
    assert(calls == 1)      // failed once, then cleanup aborted the redo
    assert(sleeps.toSeq == Seq(5L))
  }

  test("invalid floorplan row fails the dump but does not throw") {
    val sink = new RecordingSink(tmpDir("exec-invalid"))
    val ex = executor(sink, _ => spark.range(1).toDF("n"),
      scala.collection.mutable.Buffer[Long]())
    assert(!ex.execute(Map[String, Any]("prefix" -> "p"), 1))
    assert(!ex.execute(Map[String, Any]("query" -> "SELECT 1"), 2))
    assert(ex.execute(Map[String, Any]("prefix" -> "p", "query" -> "SELECT 1"), 3))
  }
}
