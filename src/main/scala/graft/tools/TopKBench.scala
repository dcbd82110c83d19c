package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    def t(name: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime(); body
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    t("window row_number") {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      noop(orders.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 3))
    }
    t("GroupTopK operator") {
      noop(graft.plans.GroupTopK.topK(orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3))
    }
    // High rows-per-key regime (the 100 TB shape): 20M rows, 1k keys.
    val big = spark.range(0, 20000000L)
      .select((col("id") % 1000).as("g"),
        (col("id") * 2654435761L % 1000000).as("v"), col("id"))
    t("window row_number 20M") {
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      noop(big.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 3))
    }
    t("GroupTopK operator 20M") {
      noop(graft.plans.GroupTopK.topK(big, Seq("g"),
        Seq(col("v").desc, col("id")), k = 3))
    }
    spark.stop()
  }
}
