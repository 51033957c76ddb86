package graft.tools
import org.apache.spark.sql.SparkSession
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView("e")
    spark.sql("SELECT vec_id, round(graft_dot(embedding, embedding), 4) AS sq FROM e ORDER BY vec_id LIMIT 3").show()
    spark.sql("SELECT graft_dot(array(cast(1.0 as float)), array(cast(2.0 as float), cast(9.0 as float)))").show()
    spark.stop()
  }
}
