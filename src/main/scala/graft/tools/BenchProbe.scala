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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    val sh = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("s")).distinct()
    time("shingle distinct count")(println(sh.count()))
    
    val f2 = sh.groupBy("s").agg(count(lit(1)).as("c")).selectExpr("sum(c*c) as f2", "max(c) as fmax").collect()(0)
    println(s"sum f^2 = ${f2.getLong(0)}, max df = ${f2.getLong(1)}")

    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    time("signatures")(println(sigs.count()))
    val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text")
    time("minhash pairs")(println(pairs.count()))
    val jac = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text")
    time("jaccard pairs")(println(jac.count()))
    spark.stop()
  }
}
