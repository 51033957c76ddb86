package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc trial timer for single queries at sf0.1 — the local stand-in
  * for one bench row when diagnosing a regression: prints 3 trials per
  * named query plus the persist-slot hit/miss counters, so a cold/warm
  * split or a slot-reuse break is visible without a full bench run. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args; t <- 1 to 3) {
      val t0 = System.nanoTime()
      // noop write = full-projection evaluation (same contract as
      // Bench; count() join-eliminates report-shaped plans)
      graft.SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"$n trial $t: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"slots=${graft.operators.PersistSlots.stats}")
    }
  }
}
