package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch probe for plan/perf investigation of hot operators.
  * Current experiment: df-capped Jaccard — agg+join cap vs window
  * cap vs window cap over 48-bit hashed tokens.
  */
object BenchProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  private def jaccardTail(tokens: DataFrame, minJaccard: Double): DataFrame = {
    val t = tokens.persist()
    val counts = t.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = t.select(col("id").as("id_a"), col("tok"))
      .join(t.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(counts.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val cap = 40

    def raw = docs
      .select(col("doc_id").as("id"), words(col("text")).as("__w"))
      .select(col("id"), explode(shinglesOfWords(col("__w"), 3)).as("tok"))
      .distinct()

    def variantA: DataFrame = { // current: agg + join cap
      val rare = raw.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= cap).select(col("tok"))
      jaccardTail(raw.join(rare, "tok"), 0.5)
    }
    def variantB: DataFrame = { // window cap
      val capped = raw
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("tok"))))
        .filter(col("__df") <= cap).drop("__df")
      jaccardTail(capped, 0.5)
    }
    def variantC: DataFrame = { // window cap over hash48 tokens
      val hashed = docs
        .select(col("doc_id").as("id"), words(col("text")).as("__w"))
        .select(col("id"), shinglesOfWords(col("__w"), 3).as("__sh"))
        .select(col("id"), explode(shingleHashes48(col("__sh"))).as("tok"))
        .distinct()
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("tok"))))
        .filter(col("__df") <= cap).drop("__df")
      jaccardTail(hashed, 0.5)
    }

    for (round <- 1 to 3) {
      time(s"A agg+join   r$round")(println("  rows=" + variantA.count()))
      time(s"B window     r$round")(println("  rows=" + variantB.count()))
      time(s"C window+h48 r$round")(println("  rows=" + variantC.count()))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
