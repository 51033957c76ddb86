package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Optimization-round evidence dump: writes `.explain("formatted")`
  * for the named queries to <outDir>/<name>_<tag>.txt — the
  * before/after plan files the optimization rounds commit under
  * plans/r{N}/ so plan-shape claims (Exchange counts, join strategy,
  * PushedFilters) are checkable without running Spark.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <name>[,name...]
  * (sfDir via SPARK_GRAFT_SF_DIR; cores via SPARK_GRAFT_CPUS. Round
  * 17: dump at the BENCH shape — sf0.1, 32 cores — so size-guarded
  * mechanisms like the scan fan-out actually appear in the dumped
  * plans; the r16 dumps were taken at sf0.001, below the fan-out
  * guard's floor, and were byte-identical for every fanned query.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution
              .explainString(ExplainMode.fromString("formatted")).trim
            Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan + "\n")
            println(s"[plandump] wrote $outDir/${name}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
