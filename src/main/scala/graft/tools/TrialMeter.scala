package graft.tools

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}

/** Per-trial box-contention instrumentation for the bench harness.
  *
  * Round 12's driver bench artifact recorded a 2.3x "pinned
  * regression" (277.9s vs 118.8s) that a quiet-box re-run refuted
  * (116.9s on identical bytes): external box load inflated warm
  * trials 4-40x in alphabetically-consecutive bursts, and nothing in
  * the harness could tell a contaminated trial from a real
  * regression. This meter records, per trial:
  *
  *   - wall seconds and THIS PROCESS's cpu seconds
  *     (`OperatingSystemMXBean.getProcessCpuTime` — process total,
  *     not per-thread: Spark's executor pool spreads a trial over
  *     many threads);
  *   - the WHOLE BOX's busy cpu seconds over the same window
  *     (`/proc/stat` first line, busy = total - idle - iowait), so
  *     `extShare` = (box busy - our busy) / (cores x wall) is the
  *     fraction of machine capacity OTHER processes consumed during
  *     the trial — a direct external-load gauge that needs no
  *     before/after comparison;
  *   - `/proc/loadavg` 1-minute load for run-level context.
  *
  * Flagging combines an ABSOLUTE gauge (extShare above a threshold:
  * someone else was eating the box) with a RELATIVE one (a trial
  * whose cpu/wall parallelism collapsed vs the same query's other
  * trials while its wall inflated: the classic descheduled-executor
  * signature even when the thief finished between /proc/stat reads).
  * Pure function — spec'd on synthetic trials and on an injected
  * external busy-spin.
  *
  * Linux-only by design (the bench box); on a platform without
  * /proc the box-level gauge degrades to -1 and only the relative
  * flag applies.
  */
object TrialMeter {

  /** Linux USER_HZ jiffy length. Fixed at 100 Hz, the value every
    * mainstream distro compiles with (getconf CLK_TCK); only the
    * /proc/stat conversion uses it. */
  private val JiffySec = 0.01

  final case class Snap(wallNanos: Long, procCpuNanos: Long,
                        boxBusyJiffies: Long, load1: Double,
                        gcMillis: Long = -1L)

  /** One measured trial window. `cpuSec` is this process's cpu time;
    * `extShare` in [0,1] is other processes' share of total box
    * capacity during the window (-1 when /proc/stat is unavailable);
    * `gcSec` is this JVM's stop-the-world collection time during the
    * window (GarbageCollectorMXBean collection-time deltas; -1 when
    * the beans don't report). GC attribution is what splits a trial
    * whose cpu AND wall both inflate — the r13 `mm_audio_fp` 7→15 s
    * in-run ramp, cpu tracking wall — into real work vs heap
    * pressure from a long run's accumulated cache. */
  final case class TrialStat(wallSec: Double, cpuSec: Double,
                             extShare: Double, load1: Double,
                             gcSec: Double = -1.0) {
    /** Effective parallelism: process cpu seconds per wall second. */
    def cpuWallRatio: Double = if (wallSec > 0) cpuSec / wallSec else 0.0
  }

  private val osBean: Option[com.sun.management.OperatingSystemMXBean] =
    ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }

  /** Busy jiffies from /proc/stat's aggregate cpu line: user + nice +
    * system + irq + softirq + steal (idle and iowait excluded). */
  private def busyJiffies(): Long =
    try {
      val src = Files.readString(Paths.get("/proc/stat"))
      val line = src.substring(0, math.max(0, src.indexOf('\n')))
      if (!line.startsWith("cpu ")) -1L
      else {
        val f = line.trim.split("\\s+")
        // cpu user nice system idle iowait irq softirq steal ...
        def j(i: Int) = if (i < f.length) f(i).toLong else 0L
        j(1) + j(2) + j(3) + j(6) + j(7) + j(8)
      }
    } catch { case _: Throwable => -1L }

  def load1(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative stop-the-world collection millis across all of this
    * JVM's collector beans (-1 when none report — a bean returns -1
    * for collectionTime when the collector doesn't track it). */
  private def gcMillis(): Long =
    try {
      val ts = ManagementFactory.getGarbageCollectorMXBeans
        .toArray.toSeq.collect {
          case b: java.lang.management.GarbageCollectorMXBean
            if b.getCollectionTime >= 0 => b.getCollectionTime
        }
      if (ts.isEmpty) -1L else ts.sum
    } catch { case _: Throwable => -1L }

  def snap(): Snap = Snap(
    System.nanoTime(),
    osBean.map(_.getProcessCpuTime).getOrElse(-1L),
    busyJiffies(),
    load1(),
    gcMillis())

  def stat(a: Snap, b: Snap, cores: Int): TrialStat = {
    val wall = math.max(0.0, (b.wallNanos - a.wallNanos) / 1e9)
    val cpu =
      if (a.procCpuNanos < 0 || b.procCpuNanos < 0) -1.0
      else math.max(0.0, (b.procCpuNanos - a.procCpuNanos) / 1e9)
    val gc =
      if (a.gcMillis < 0 || b.gcMillis < 0) -1.0
      else math.max(0.0, (b.gcMillis - a.gcMillis) / 1e3)
    val ext =
      if (a.boxBusyJiffies < 0 || b.boxBusyJiffies < 0 || cpu < 0 ||
          wall <= 0 || cores <= 0) -1.0
      else {
        val boxBusy = (b.boxBusyJiffies - a.boxBusyJiffies) * JiffySec
        math.max(0.0, math.min(1.0, (boxBusy - cpu) / (cores * wall)))
      }
    TrialStat(wall, cpu, ext, math.max(a.load1, b.load1), gc)
  }

  /** Fraction of box capacity OTHER processes consume while THIS
    * process idles — the run-level calibration for [[flags]]'s
    * absolute gauge. On a dedicated box this is ~0 and the gauge is
    * live; on shared infrastructure where /proc/stat reports a
    * host that is ALWAYS saturated by other tenants (this box: 32/32
    * cores busy at rest) while our cgroup still gets its quota, the
    * baseline is ~1 and the absolute gauge self-disables — measured,
    * not assumed. The relative cpu/wall gauge carries the detection
    * there (it needs no box-level truth). */
  def calibrateExtShare(cores: Int, windowMs: Long = 300): Double = {
    val a = snap()
    Thread.sleep(windowMs)
    stat(a, snap(), cores).extShare
  }

  /** Which trials look contaminated by external load. A trial is
    * flagged when EITHER:
    *
    *  - `extShare > extShareMax + extBaseline` — other processes
    *    consumed meaningfully MORE of the box during this trial than
    *    they do at this run's rest state (absolute gauge, needs
    *    /proc/stat + a [[calibrateExtShare]] baseline; the default
    *    baseline 1.0 keeps the gauge OFF when uncalibrated, because
    *    on shared hosts /proc/stat's always-busy reading would flag
    *    every trial — observed: 1536/1536 on this box); or
    *  - its cpu/wall parallelism fell below `1/relFactor` of the
    *    median parallelism of the SAME query's trials while its wall
    *    exceeded `wallFactor` x the median wall (relative gauge:
    *    byte-identical work on the same warm plan repeats its
    *    parallelism; a descheduled trial has wall >> cpu — the
    *    BENCH_r12 signature, q5_join 9.05s -> 41.95s with flat cpu).
    *
    * Trials shorter than `minWallSec` are never flagged (sub-50ms
    * timings are scheduler noise either way), and the relative gauge
    * needs >= 3 trials for a meaningful median. Pure — spec'd on
    * synthetic inputs.
    */
  /** Warm-trial RAMP detector (round 15). BENCH_r14's q_profile warm
    * trials read 1.96, 1.71, 5.12, 11.30, 13.87 s on code untouched
    * since r12 (mm_audio: 1.09 → 5.81): external load arriving
    * MID-QUERY inflates cpu and wall together, so [[flags]]'s
    * relative cpu/wall gauge provably cannot fire, and on a host
    * whose /proc/stat is saturated at rest the absolute gauge is
    * self-disabled — the monotone in-query ramp was invisible and
    * its inflated trials moved the round-over-round medians. The
    * ramp signature is its own gauge over trials in EXECUTION order:
    * the run's second-half median exceeds `factor` x its first-half
    * median AND the last trial exceeds `factor` x the first. Returns
    * the indices of ramp-inflated trials (wall > factor x first-half
    * median) to exclude from the median — empty when no ramp. A
    * single late spike (second-half median robust to one outlier)
    * or plain jitter does not fire; runs whose median wall is under
    * `minWallSec` are never flagged (scheduler noise). Pure —
    * spec'd on the observed r14 sequences and synthetic inputs. */
  def rampIndices(walls: Seq[Double], factor: Double = 2.0,
                  minWallSec: Double = 0.05): Seq[Int] = {
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.length / 2)
    val n = walls.length
    if (n < 3 || med(walls) < minWallSec) Nil
    else {
      val firstMed = med(walls.take(n / 2))
      val secondMed = med(walls.drop(n / 2))
      if (firstMed > 0 && walls.head > 0 &&
          walls.last > walls.head * factor && secondMed > firstMed * factor)
        walls.zipWithIndex.collect { case (w, i) if w > firstMed * factor => i }
      else Nil
    }
  }

  /** Warm-trial DECAY detector (round 16) — [[rampIndices]]'s mirror.
    * BENCH_r15's q_sq8 warm trials read 15.59, 7.92, 6.66, 8.01,
    * 3.55 s on code unchanged since r10 (board 0.69 s then): an
    * external load burst present at the query's START and decaying
    * across trials inflates the HEAD, and the board median rides the
    * inflated head — with zero flags, because rampIndices fires only
    * on increases and the cpu/wall gauge can't fire when contention
    * burns real JVM cycles (cpu tracked wall throughout). The mirror
    * signature: the run's first-half median exceeds `factor` x its
    * second-half median AND the first trial exceeds `factor` x the
    * last. When it fires, the whole FIRST HALF is the contaminated
    * regime (decay by definition starts at trial 0) — flagged
    * wholesale, plus any later trial still above factor x the settled
    * second-half median (decay bleeding past the midpoint) — so the
    * median falls back to the settled tail. A single early spike can
    * fire the gauge (a 2-element first-half median IS its max), but
    * then the head trials it flags are either the spike itself or
    * walls at tail level whose exclusion leaves the median where the
    * tail puts it — conservative in effect. Same sticky-set,
    * re-detect-after-retry plumbing as the ramp gauge in Bench. */
  def decayIndices(walls: Seq[Double], factor: Double = 2.0,
                   minWallSec: Double = 0.05): Seq[Int] = {
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.length / 2)
    val n = walls.length
    if (n < 3 || med(walls) < minWallSec) Nil
    else {
      val firstMed = med(walls.take(n / 2))
      val secondMed = med(walls.drop(n / 2))
      if (secondMed > 0 && walls.last > 0 &&
          walls.head > walls.last * factor && firstMed > secondMed * factor)
        walls.zipWithIndex.collect {
          case (w, i) if i < n / 2 || w > secondMed * factor => i }
      else Nil
    }
  }

  def flags(stats: Seq[TrialStat], extShareMax: Double = 0.25,
            relFactor: Double = 2.0, wallFactor: Double = 1.5,
            minWallSec: Double = 0.05,
            extBaseline: Double = 1.0): Seq[Boolean] = {
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.length / 2)
    val medRatio = med(stats.map(_.cpuWallRatio))
    val medWall = med(stats.map(_.wallSec))
    stats.map { s =>
      if (s.wallSec < minWallSec) false
      else {
        val abs = s.extShare >= 0 && extBaseline >= 0 &&
          s.extShare > extShareMax + extBaseline
        val rel = stats.length >= 3 && s.cpuSec >= 0 && medRatio > 0 &&
          s.cpuWallRatio * relFactor < medRatio &&
          s.wallSec > medWall * wallFactor
        abs || rel
      }
    }
  }
}
