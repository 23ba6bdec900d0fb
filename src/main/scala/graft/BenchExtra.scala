package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4) — NOT the driver
  * metric. Times each named query with the noop sink (computes every
  * column of every row, discards the result) in the same session shape
  * as Bench's query suite (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus, 4 MB scan splits), with SwapCache released
  * between queries exactly like the suite loop. Two timed runs per
  * query: run1 = the Bench-comparable cold invocation (generation
  * rebuild included), run2 = warm repeat (separates fixed plan/job
  * overhead from compute). Prints one JSON line.
  *
  *   sbt "runMain graft.BenchExtra q41_jaccard_join q15_lsh_near_dup"
  *
  * No args = the whole suite. Bench.scala itself stays frozen; numbers
  * quoted in OPTIMIZATION_r08.md cite this main.
  */
object BenchExtra {
  private def fmt(d: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, d)

  def main(args: Array[String]): Unit = {
    graft.queries.Queries.auxDumpEnabled = false
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // JIT warmup, untimed (Bench does the same)
    try SparkEntry.queries("q01_pricing_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    def noop(name: String): Double = {
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = names.map { name =>
      val cpu0 = CpuClock.ms
      val cold = noop(name)
      val cpuCold = CpuClock.ms - cpu0
      val warm = noop(name)
      // mirror the Bench suite loop: swap caches released between
      // queries, Q15Result deliberately retained (q25 composes on it —
      // q15's warm run is therefore a result-cache read, expected ~0)
      graft.queries.Queries.releaseSwapCaches()
      s""""$name":{"cold_sec":${fmt(cold)},"warm_sec":${fmt(warm)},"cold_cpu_ms":$cpuCold}"""
    }
    println(rows.mkString("{\"bench_extra\":{", ",", s"},\"sf\":\"$sfDir\",\"cpus\":$cpus}"))
    spark.stop()
  }
}
