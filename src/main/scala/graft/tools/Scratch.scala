package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerJobEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch probe for plan/perf investigation of hot operators
  * (optimization round 17): per-trial wall/process-CPU next to task
  * count, executor task-CPU and task-deserialization time — the
  * series that separates real operator work from engine per-task /
  * per-job floors. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cores = cpus.toInt

    val tasks = new AtomicInteger
    val jobs = new AtomicInteger
    val taskCpu = new AtomicLong // ns, executor-reported cpu per task
    val taskDeser = new AtomicLong // ms
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskCpu.addAndGet(t.taskMetrics.executorCpuTime)
          taskDeser.addAndGet(t.taskMetrics.executorDeserializeTime)
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = { jobs.incrementAndGet(): Unit }
    })
    def reset(): Unit = { tasks.set(0); jobs.set(0); taskCpu.set(0); taskDeser.set(0) }
    def report(label: String, wall: Double, cpu: Double): Unit =
      println(f"[scratch] $label%-34s wall $wall%6.3f cpu $cpu%6.2f tasks ${tasks.get}%5d jobs ${jobs.get}%3d taskCpu ${taskCpu.get / 1e9}%6.2f deserMs ${taskDeser.get}%6d")

    def timed(label: String)(f: => Unit): Unit = {
      reset()
      val a = TrialMeter.snap()
      f
      val st = TrialMeter.stat(a, TrialMeter.snap(), cores)
      report(label, st.wallSec, st.cpuSec)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // 1) per-task fixed cost: trivial work at various partition counts
    for (p <- Seq(1, 8, 32, 128)) {
      timed(s"range sum p=$p warm") {
        noop(spark.range(0, 1000000, 1, p).selectExpr("id * 3 as x"))
      }
    }
    // 2) q_t_closeness: warmup + 3 warm trials, watch tasks + slots
    for (i <- 1 to 4) {
      val mark = graft.operators.PersistSlots.advanceEpoch()
      timed(s"q_t_closeness trial $i") {
        noop(graft.SparkEntry.queries("q_t_closeness")(spark, sfDir))
      }
      val (h, m) = graft.operators.PersistSlots.stats
      println(s"[scratch]   slots hits=$h misses=$m held=${graft.operators.PersistSlots.size}")
      graft.operators.PersistSlots.releaseUntouched(mark): Unit
    }
    // 3) q_ivf_recall_curve: 5 trials
    for (i <- 1 to 5) {
      val mark = graft.operators.PersistSlots.advanceEpoch()
      timed(s"q_ivf_recall_curve trial $i") {
        noop(graft.SparkEntry.queries("q_ivf_recall_curve")(spark, sfDir))
      }
      val (h, m) = graft.operators.PersistSlots.stats
      println(s"[scratch]   slots hits=$h misses=$m held=${graft.operators.PersistSlots.size}")
      graft.operators.PersistSlots.releaseUntouched(mark): Unit
    }
    // 4) tokenizer kernel vs regex form A/B (docs scan)
    import org.apache.spark.sql.functions._
    def docs = graft.queries.Tables(spark, sfDir, "documents")
    timed("tokenize regex form warm") {
      noop(docs.select(split(trim(lower(col("text"))), "\\s+").as("w")))
    }
    for (i <- 1 to 2) timed(s"tokenize regex form $i") {
      noop(docs.select(split(trim(lower(col("text"))), "\\s+").as("w")))
    }
    timed("tokenize kernel warm") {
      noop(docs.select(graft.functions.TextFunctions.words(col("text")).as("w")))
    }
    for (i <- 1 to 2) timed(s"tokenize kernel $i") {
      noop(docs.select(graft.functions.TextFunctions.words(col("text")).as("w")))
    }
    timed("wordcount kernel") {
      noop(docs.select(graft.functions.TextFunctions.wordCount(col("text")).as("c")))
    }
    timed("q_perplexity5_bcast") {
      noop(graft.SparkEntry.queries("q_perplexity5_bcast")(spark, sfDir))
    }
    timed("q_perplexity5_bcast warm2") {
      noop(graft.SparkEntry.queries("q_perplexity5_bcast")(spark, sfDir))
    }
    spark.stop()
  }
}
