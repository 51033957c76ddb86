package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused re-measurement harness for the optimization rounds: times
  * a comma-separated subset of SparkEntry queries with the SAME
  * methodology as graft.Bench (same session configs, untimed warmup,
  * median of N warm noop-sink trials, per-trial cpu via TrialMeter)
  * without paying for the whole 228-query board per iteration.
  * Results are iteration evidence only — round-close numbers come
  * from the full Bench run.
  *
  * Usage: runMain graft.tools.MiniBench <name>[,name...] [warmTrials]
  * (sfDir/cores via SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as Bench.)
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val warmTrials = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cores = try cpus.toInt catch { case _: Throwable =>
      Runtime.getRuntime.availableProcessors() }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // mirror Bench's round-17 session config (see Bench.scala)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tools.CodegenGuard.install()
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.queries.Fixtures.warm(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[minibench] fixture warm failed: ${e.getMessage}") }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[minibench] unknown query: $name")
        case Some(fn) =>
          val mark = graft.operators.PersistSlots.advanceEpoch()
          val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
          val cpusS = scala.collection.mutable.ArrayBuffer.empty[Double]
          var failed: Option[String] = None
          var trial = 0
          while (trial < 1 + warmTrials && failed.isEmpty) {
            val a = TrialMeter.snap()
            try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            catch { case e: Throwable => failed = Some(e.getMessage) }
            val st = TrialMeter.stat(a, TrialMeter.snap(), cores)
            walls += st.wallSec; cpusS += st.cpuSec
            trial += 1
          }
          graft.operators.PersistSlots.releaseUntouched(mark): Unit
          failed match {
            case Some(m) => println(s"[minibench] $name FAILED: $m")
            case None =>
              val warmW = walls.drop(1).sorted
              val warmC = cpusS.drop(1).sorted
              println(f"[minibench] $name%-32s median ${warmW(warmW.length / 2)}%.3f s" +
                f" cpu ${warmC(warmC.length / 2)}%.2f" +
                f" (warm ${walls.drop(1).map(w => f"$w%.2f").mkString(",")}" +
                f"; cold ${walls.head}%.2f)")
          }
      }
    }
    val cg = graft.tools.CodegenGuard.report()
    if (cg > 0) println(s"[minibench] codegen_errors: $cg")
    spark.stop()
  }
}
