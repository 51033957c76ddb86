package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe for plan/perf investigation of hot operators. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def t(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"$label: ${ts.sorted.apply(1)}%.2f s")
    }
    t("both (current)") { li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("a"),
        countDistinct(col("l_partkey")).as("e"), count(lit(1)).as("n"))
      .write.mode("overwrite").format("noop").save() }
    t("exact only") { li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("e"), count(lit(1)).as("n"))
      .write.mode("overwrite").format("noop").save() }
    t("approx rsd=0.01 only") { li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("a"))
      .write.mode("overwrite").format("noop").save() }
    t("approx rsd=0.05 only") { li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.05).as("a"))
      .write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
