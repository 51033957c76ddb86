package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch1x {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.headOption.map(_.split(",").toSeq).getOrElse(Seq())) {
      val times = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[1x] $name median=${times.sorted.apply(2)}%.2f s (trials ${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
