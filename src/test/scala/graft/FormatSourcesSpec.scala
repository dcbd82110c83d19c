package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** Lake file-format reads beyond parquet: ORC round-trips bit-exactly;
  * CSV/JSON round-trip through their text representations under an
  * explicit schema (inference is rejected — it would be a second
  * full-data pass at scale). */
class FormatSourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def customers = Sources.table(spark, dir, "customer")

  test("orc round-trip is exact") {
    val d = tmpDir("fmt-orc")
    customers.write.mode("overwrite").orc(d)
    val back = Sources.readFormat(spark, d, "orc")
    assert(back.schema == customers.schema)
    assert(back.exceptAll(customers).isEmpty && customers.exceptAll(back).isEmpty)
  }

  test("csv round-trip under an explicit schema is exact") {
    val d = tmpDir("fmt-csv")
    customers.write.mode("overwrite").option("header", "true").csv(d)
    val back = Sources.readFormat(spark, d, "csv", Some(customers.schema))
    assert(back.schema == customers.schema)
    assert(back.exceptAll(customers).isEmpty && customers.exceptAll(back).isEmpty)
  }

  test("json round-trip under an explicit schema is exact") {
    val d = tmpDir("fmt-json")
    customers.write.mode("overwrite").json(d)
    val back = Sources.readFormat(spark, d, "json", Some(customers.schema))
    assert(back.schema == customers.schema)
    assert(back.exceptAll(customers).isEmpty && customers.exceptAll(back).isEmpty)
  }

  test("csv/json without a schema are rejected, unknown formats are rejected") {
    intercept[IllegalArgumentException](Sources.readFormat(spark, "/tmp/x", "csv"))
    intercept[IllegalArgumentException](Sources.readFormat(spark, "/tmp/x", "json"))
    intercept[IllegalArgumentException](Sources.readFormat(spark, "/tmp/x", "avroish"))
  }

  test("permissive csv turns malformed rows into nulls instead of aborting") {
    val d = tmpDir("fmt-csv-bad")
    new java.io.File(d).mkdirs()
    val f = new java.io.PrintWriter(s"$d/part.csv")
    f.println("k,n"); f.println("a,1"); f.println("b,notanumber"); f.close()
    val schema = StructType(Seq(StructField("k", StringType), StructField("n", IntegerType)))
    val got = Sources.readFormat(spark, d, "csv", Some(schema))
      .select($"k", $"n").as[(String, Option[Int])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", Some(1)), ("b", None)))
  }
}
