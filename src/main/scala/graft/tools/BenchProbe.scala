package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for plan/perf investigation of hot operators. */
object BenchProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // pure flatten throughput: pre-materialized nested parquet
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val nested = ord.join(
      li.groupBy("l_orderkey").agg(collect_list(struct(col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))).as("items")),
      col("o_orderkey") === col("l_orderkey")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "items")
    nested.write.mode("overwrite").parquet("/tmp/nested_sf01.parquet")
    val n = spark.read.parquet("/tmp/nested_sf01.parquet")
    time("warm read")(n.count())
    var rows = 0L
    time("pure flatten (explode chain)") {
      rows = graft.operators.Flatten.flatten(n).count()
    }
    println(s"flatten rows = $rows")
    time("pure flatten again") {
      graft.operators.Flatten.flatten(n).count()
    }
    spark.stop()
  }
}
