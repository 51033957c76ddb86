package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch attribution probe for the optimization rounds: times the
  * pieces of a hot query separately so a wall/cpu number can be
  * attributed to a stage instead of guessed at. Not part of any
  * declared query surface. */
object OptProbe {
  def time(label: String, n: Int = 3)(f: => Unit): Unit = {
    (1 to 2).foreach(_ => f) // warm
    val t0 = System.nanoTime()
    val c0 = TrialMeter.snap()
    (1 to n).foreach(_ => f)
    val c1 = TrialMeter.snap()
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/iter" +
      f" cpu ${TrialMeter.stat(c0, c1, 32).cpuSec / n}%.2f")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = graft.queries.Tables(spark, sfDir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    time("scan only") { noop(docs.select(col("doc_id"), col("text"))) }
    time("tokenize") {
      noop(docs.select(col("doc_id"), words(col("text")).as("__w"))) }
    val w = graft.operators.Quality.trainPerceptron(
      docs.withColumn("__y", when(col("lang") === "en", 1).otherwise(-1)),
      "text", "__y", buckets = 4096, epochs = 2)
    time("tokenize+kernel score") {
      noop(graft.operators.Quality.scoreLinear(docs, "doc_id", "text", w)) }
    time("trainPerceptron (2 epochs)") {
      graft.operators.Quality.trainPerceptron(
        docs.withColumn("__y", when(col("lang") === "en", 1).otherwise(-1)),
        "text", "__y", buckets = 4096, epochs = 2): Unit }
    time("full q_quality_filter") {
      noop(graft.SparkEntry.queries("q_quality_filter")(spark, sfDir)) }
    time("full q_threshold_sweep") {
      noop(graft.SparkEntry.queries("q_threshold_sweep")(spark, sfDir)) }
    spark.stop()
  }
}
