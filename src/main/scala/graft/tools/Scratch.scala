package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch probe for plan/perf investigation of hot operators. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_vocab_coverage")(
      spark, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString.take(2000))
    df.write.mode("overwrite").format("noop").save()
    println("done rows=" + df.count())
    spark.stop()
  }
}
