package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.ExtractPipeline
import graft.corpus.CorpusGen

/** One measurement leg, run as its OWN JVM under `taskset -c 0-(N-1)` so
  * the process — executor threads, GC, JIT — really owns exactly N cores,
  * like an N-core executor would. In-process local[N] legs flatter the
  * small-N side: the JVM's 32 GC/compiler threads run free on the idle
  * cores. Spawned by graft.Bench.
  *
  * Two output protocols on stdout:
  *   - always: `LEG_SEC=<median seconds>` and `LEG_OK=<ok docs>`;
  *   - with a 5th arg `rich` (the headline mode, round-3 verdict #1):
  *     per-run telemetry so a sick run self-diagnoses —
  *     `LEG_RUNS=` (wall sec per run), `LEG_GC=` (GC-time delta ms per
  *     run via GarbageCollectorMXBean), `LEG_TASKMED=`/`LEG_TASKMAX=`
  *     (parse-stage task-skew ms per run).
  *
  * A 6th arg selects the ROUTING under measurement (round-5 verdict #2:
  * the skew/heavy legs ran in the query-suite-aged parent JVM and their
  * numbers inverted — they now get the headline's pinned-fresh-child
  * discipline): `none` (default; the headline's as-stored layout),
  * `salted` (the pipeline's own url-hash repartition), `domain`
  * (partition by raw domain — the pathological hot-domain layout the
  * salting defends against).
  */
object BenchLeg {
  def main(args: Array[String]): Unit = {
    val pagesPath = args(0)
    val warmPath = args(1)
    val cpus = args(2).toInt
    val iters = args(3).toInt
    val rich = args.length > 4 && args(4) == "rich"
    val route = if (args.length > 5) args(5) else "none"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ONE shared leg body with the parent's diagnostic/fallback legs —
    // parent-vs-child must compare the identical computation
    // the defeat-pair routes (salted_fine vs byteweighted) both use
    // cpus*4 partitions — the comparison is routing POLICY at identical
    // granularity, and 4x over-partitioning is the standard scheduler
    // headroom a cluster job would run with anyway
    def leg(path: String): Long = BenchCommon.countOkRoute(spark, path, cpus, route)
    val listener = new TaskTimeListener
    if (rich) spark.sparkContext.addSparkListener(listener)
    leg(warmPath); leg(pagesPath) // JIT warm
    // cycle-delivery canary AROUND the timed runs (round-6 verdict #2):
    // a fixed single-thread checksum with a known canonical wall time,
    // so a below-band leg carries its own normalization ("the host
    // delivered X% of canonical cycles during this child") instead of
    // leaning on builder-run history
    val canaryBefore = if (rich) { CycleCanary.warm(); CycleCanary.run() } else -1L
    var ok = 0L
    val runs = (1 to iters).map { _ =>
      listener.clear()
      val gc0 = GcClock.ms
      val cpu0 = CpuClock.ms
      val t0 = System.nanoTime()
      ok = leg(pagesPath)
      val sec = (System.nanoTime() - t0) / 1e9
      val gcDelta = GcClock.ms - gc0
      val cpuDelta = if (cpu0 < 0) -1L else CpuClock.ms - cpu0
      if (rich) Thread.sleep(300) // let the listener bus drain
      val (taskMed, taskMax) = if (rich) listener.skew else (0L, 0L)
      (sec, gcDelta, taskMed, taskMax, cpuDelta)
    }
    val canaryAfter = if (rich) CycleCanary.run() else -1L
    def f(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    if (rich) {
      println("LEG_RUNS=" + runs.map(r => f(r._1)).mkString(","))
      println("LEG_GC=" + runs.map(_._2).mkString(","))
      println("LEG_TASKMED=" + runs.map(_._3).mkString(","))
      println("LEG_TASKMAX=" + runs.map(_._4).mkString(","))
      println("LEG_CPU=" + runs.map(_._5).mkString(","))
      println("LEG_CANARY=" + canaryBefore + "," + canaryAfter)
    }
    val times = runs.map(_._1).sorted
    println("LEG_SEC=" + f(times(times.length / 2)))
    println("LEG_OK=" + ok)
    spark.stop()
  }
}
