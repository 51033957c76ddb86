package graft.tools
import org.apache.spark.sql.SparkSession
object DebugBin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.queries.Fixtures.warm(spark, dir) catch { case _: Throwable => }
    for (name <- Seq("dedup_components_stars", "q_curate_rw", "q_distinct_agg", "dedup_embedding_lsh")) {
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime()-t0)/1e9
      }
      println(f"TIME $name%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
