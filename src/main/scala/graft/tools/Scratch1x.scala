package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** A/B probe: cached-plan AQE partitioning (the
  * canChangeCachedPlanOutputPartitioning conf) on the slot-heavy
  * queries. Usage: Scratch1x <true|false> <name,name,...> [trials] */
object Scratch1x {
  def main(args: Array[String]): Unit = {
    val aqeCached = args(0)
    val names = args(1).split(",").toSeq
    val trials = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", aqeCached)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cores = cpus.toInt
    val tasks = new AtomicInteger
    val taskCpu = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskCpu.addAndGet(t.taskMetrics.executorCpuTime)
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.queries.Fixtures.warm(spark, sfDir) catch { case _: Throwable => }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val mark = graft.operators.PersistSlots.advanceEpoch()
      val walls = Seq.newBuilder[Double]
      val cpusB = Seq.newBuilder[Double]
      for (i <- 0 to trials) {
        tasks.set(0); taskCpu.set(0)
        val a = TrialMeter.snap()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val st = TrialMeter.stat(a, TrialMeter.snap(), cores)
        if (i > 0) { walls += st.wallSec; cpusB += st.cpuSec }
        println(f"[ab] $name%-26s aqeCached=$aqeCached t$i wall ${st.wallSec}%6.3f cpu ${st.cpuSec}%6.2f tasks ${tasks.get}%5d taskCpu ${taskCpu.get / 1e9}%6.2f")
      }
      val w = walls.result().sorted; val c = cpusB.result().sorted
      println(f"[ab] $name%-26s aqeCached=$aqeCached MEDIAN wall ${w(w.length / 2)}%6.3f cpu ${c(c.length / 2)}%6.2f")
      graft.operators.PersistSlots.releaseUntouched(mark): Unit
    }
    spark.stop()
  }
}
