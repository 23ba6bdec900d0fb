package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.pipeline.ExtractPipeline
import graft.corpus.CorpusGen

/** Collects task wall times so the skew of the parse stage is measurable
  * (max-task vs median-task — SURVEY.md §7.6). */
private final class TaskTimeListener extends SparkListener {
  val times = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskMetrics != null)
      times.add((e.stageId, e.taskInfo.finishTime - e.taskInfo.launchTime))
  def clear(): Unit = times.clear()
  /** (median, max) task ms within the PARSE stage, identified as the
    * stage containing the single longest task. Pooling all stages would
    * let the many sub-50ms scan/reduce tasks set the median; picking by
    * summed stage time fails too — a wide parquet scan of html bytes can
    * out-sum a skewed parse stage whose straggler defines the wall time.
    * The longest task is always a parse task in these jobs (fused
    * scan+parse for the headline; post-shuffle parse for the skew legs,
    * where the whole point is its straggler). */
  def skew: (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val byStage = times.asScala.toSeq.groupBy(_._1)
    if (byStage.isEmpty) (0L, 0L)
    else {
      val xs = byStage.values.maxBy(_.map(_._2).max).map(_._2).toIndexedSeq.sorted
      (xs(xs.length / 2), xs.last)
    }
  }
}

/** Benchmark main. Emits ONE JSON line:
  *   - per-query wall seconds for every SparkEntry query at
  *     SPARK_GRAFT_CPUS parallelism on SPARK_GRAFT_SF_DIR;
  *   - the headline metric from BASELINE.json: end-to-end extraction
  *     docs/sec (HTML boilerplate strip + PDF content-stream parse +
  *     scoring, byte-identical-gated corpus) over a pre-materialized
  *     parquet pages table;
  *   - the north rule's two-cluster-size scaling evidence: the same
  *     extraction job at local[N_LO] vs local[N_HI] (sandbox stand-in
  *     for N vs 4N executors) + throughput scaling efficiency.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // split the (highly compressed) bench corpus finely enough that the
      // scan stage can occupy every core; the 128 MB default is tuned for
      // real clusters reading TB-scale inputs, not a 150 MB fixture
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Timed leg: read the materialized pages table, parse+score, count. */
  private def extractLeg(spark: SparkSession, pagesPath: String, tasks: Int): Long = {
    import spark.implicits._
    val pages = spark.read.parquet(pagesPath).as[graft.model.PageRecord]
    ExtractPipeline.extractAndScore(
      pages, numPartitions = tasks,
      CorpusGen.TargetWords.toSet, CorpusGen.BycatchWords.toSet)
      .mapPartitions(it => Iterator.single(it.count(_.ok).toLong))
      .reduce(_ + _)
  }

  def main(args: Array[String]): Unit = {
    // bench times the operators, not verification: skip the oracle
    // aux-parquet dumps some queries write for the DuckDB compare
    graft.queries.Queries.auxDumpEnabled = false
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "160000").toLong
    // N -> 4N parallelism pair for the scaling criterion. 2 -> 8 cores:
    // this VM advertises 32 CPUs but delivers fewer cycles per core the
    // more cores are busy (pinned ladders in BASELINE.md) — wide legs
    // measure the hypervisor, not the engine, so the pair sits where
    // per-core delivery is flat at BOTH levels.
    val cpusLo = sys.env.getOrElse("SPARK_GRAFT_CPUS_LO", "2").toInt
    val warmDocs = 4000L

    // ---- phase 1: query suite at `cpus` ------------------------------
    var spark = session(cpus)
    // untimed warmup: JIT the SQL/codegen/parquet stack so the first
    // timed query doesn't carry interpreter cost
    try SparkEntry.queries("q01_pricing_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    val failedQueries = scala.collection.mutable.ListBuffer.empty[String]
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = timeSec {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          // a failing query must be VISIBLE in the metric line — its
          // time-to-failure would otherwise read as a speedup
          failedQueries += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      }
      name -> sec
    }
    // drop phase-1's persisted LSH/ANN intermediates before timing the
    // headline: resident cache blocks and their GC pressure contaminate
    // extract_docs_per_sec relative to a clean session
    spark.catalog.clearCache()

    // ---- phase 2: extraction headline + scaling ----------------------
    // materialize the corpus once (untimed — input I/O setup, the stand-in
    // for the pre-existing Iceberg pages table)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench_pages")
    val pagesPath = tmp.resolve("pages").toString
    val warmPath = tmp.resolve("warm").toString
    ExtractPipeline.pages(spark, nDocs, cpus * 4)
      .write.mode("overwrite").parquet(pagesPath)
    ExtractPipeline.pages(spark, warmDocs, cpus).write.parquet(warmPath)

    // warm the JIT (parsers + codegen) before any timed leg
    extractLeg(spark, warmPath, cpus)
    extractLeg(spark, pagesPath, 0)
    val listener = new TaskTimeListener
    spark.sparkContext.addSparkListener(listener)
    var okHi = 0L
    // headline = median-of-5 in this warmed JVM (this VM's deliverable
    // cycles fluctuate run to run); each run records ITS OWN task skew so
    // the published skew describes the same run as the published time
    val headlineRuns = (1 to 5).map { _ =>
      listener.clear()
      val sec = timeSec { okHi = extractLeg(spark, pagesPath, 0) }
      Thread.sleep(300) // let the listener bus drain
      val (med, max) = listener.skew
      (sec, med, max)
    }.sortBy(_._1)
    val (tHiAtCpus, medianTaskMs, maxTaskMs) = headlineRuns(headlineRuns.length / 2)

    // ---- skew evidence at bench scale (SURVEY.md §7.6) ----------------
    // The corpus has a 30%-hot domain by construction (CorpusGen
    // HotDomainShare). Parse the SAME pages twice: once partitioned by
    // raw domain (the pathological input layout — one task owns the hot
    // domain) and once through the salted url-hash repartition the
    // pipeline uses. max/median task time shows the salting effect at
    // bench scale, not just the unit-scale PipelineSpec assertion.
    import org.apache.spark.sql.functions.expr
    val sp = spark // stable identifier for the implicits import
    import sp.implicits._
    val skewDocs = 40000L
    // materialize the skew corpus untimed (same discipline as the
    // headline): a lazy generator dataset would put its 128 synthesis
    // tasks inside the timed window, so the listener would profile
    // GENERATION tasks and the published median would not describe the
    // parse stage at all
    val skewPath = tmp.resolve("skew").toString
    ExtractPipeline.pages(spark, skewDocs, cpus * 4)
      .write.mode("overwrite").parquet(skewPath)
    val skewPages = spark.read.parquet(skewPath).as[graft.model.PageRecord]
    def parseLeg(prepared: org.apache.spark.sql.Dataset[graft.model.PageRecord],
        parts: Int): (Double, Long, Long) = {
      listener.clear()
      val sec = timeSec {
        ExtractPipeline.extractAndScore(prepared, numPartitions = parts,
          CorpusGen.TargetWords.toSet, CorpusGen.BycatchWords.toSet)
          .mapPartitions(it => Iterator.single(it.count(_.ok).toLong))
          .reduce(_ + _): Unit
      }
      Thread.sleep(300)
      val (med, max) = listener.skew
      (sec, med, max)
    }
    val byDomain = skewPages
      .repartition(cpus, expr("regexp_extract(url, 'd([0-9]+)', 1)"))
      .as[graft.model.PageRecord]
    val (domainSec, domainMed, domainMax) = parseLeg(byDomain, 0)
    // the pipeline's OWN salted url-hash routing (extractAndScore's
    // numPartitions > 0 path) — not an inline copy of it, so the evidence
    // keeps measuring whatever the pipeline actually does
    val (saltedSec, saltedMed, saltedMax) = parseLeg(skewPages, cpus)
    spark.stop()

    // scaling legs: identical input + plan, two parallelism levels, each
    // leg its OWN JVM pinned to exactly N cores with taskset (GC + JIT
    // included — an in-process local[N] leg lets the JVM's 32 GC threads
    // run free on idle cores and flatters small N). One timed measurement
    // per pinned JVM (after an in-JVM warmup); the published ratio is the
    // median across three interleaved (lo, hi) pairs — see below.
    var fallbackLegs = 0
    def leg(c: Int): Double = {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      // same JPMS opens as build.sbt (Spark 4 on JDK 17 outside spark-submit)
      val jvmOpts = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq("taskset", "-c", s"0-${c - 1}", javaBin) ++ jvmOpts ++ Seq(
        "-Xmx6g", "-cp", System.getProperty("java.class.path"),
        "graft.BenchLeg", pagesPath, warmPath, c.toString, "1")
      // merge stderr into stdout: an un-drained stderr pipe (Spark ERROR
      // logs, OOM traces) would deadlock the child at ~64KB; scala.util.Try
      // makes the fallback reachable when the taskset binary is absent
      val legOut = scala.util.Try {
        val out = new StringBuilder
        val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val rdr = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        var line = rdr.readLine()
        while (line != null) { out.append(line).append('\n'); line = rdr.readLine() }
        proc.waitFor()
        out.toString
      }.getOrElse("")
      "LEG_SEC=([0-9.]+)".r.findFirstMatchIn(legOut)
        .map(_.group(1).toDouble)
        .getOrElse {
          // fallback when the pinned child produced no measurement
          // (taskset absent, or the child JVM died): in-process leg,
          // median-of-3 WITHIN the leg (unpinned legs are noisier, so
          // each fallback leg self-medians). Every fallback is COUNTED
          // and published in the metric line — a ratio mixing pinned and
          // unpinned legs is a different methodology and must be visible.
          fallbackLegs += 1
          val s = session(c)
          extractLeg(s, warmPath, c)
          val ts = (1 to 3).map(_ => timeSec { extractLeg(s, pagesPath, 0) }).sorted
          s.stop()
          ts(1)
        }
    }
    // INTERLEAVED pairs: host cycle delivery drifts over minutes, so a
    // lone lo-then-hi sequence can tilt the ratio either way; running
    // (lo, hi) back to back 3 times and taking the median pair ratio
    // exposes both levels to the same drift. Each pinned JVM runs ONE
    // timed measurement (after warmup); the median is taken across the
    // three interleaved pairs, not inside a leg.
    val cpusHi = cpusLo * 4
    val pairs = (1 to 3).map { _ =>
      val lo = leg(cpusLo)
      val hi = leg(cpusHi)
      (lo, hi)
    }
    val ratios = pairs.map { case (lo, hi) => lo / hi }.sorted
    val medianIdx = ratios.length / 2
    val (tLo, tHi) = pairs.sortBy { case (lo, hi) => lo / hi }.apply(medianIdx)

    val docsPerSec = nDocs / tHiAtCpus
    val efficiency = ratios(medianIdx) / (cpusHi.toDouble / cpusLo)

    def f(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val qs = queryTimes.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    val failed = failedQueries.map(n => s""""$n"""").mkString("[", ",", "]")
    val line =
      s"""{"metric":"extract_docs_per_sec","value":${f(docsPerSec)},"unit":"docs/sec","queries":$qs,"sf":"$sfDir"""" +
      s""","failed_queries":$failed""" +
      s""","queries_total_sec":${f(total)},"extract_docs":$nDocs,"extract_ok":$okHi,"extract_sec":${f(tHiAtCpus)}""" +
      s""","task_ms_median":$medianTaskMs,"task_ms_max":$maxTaskMs""" +
      s""","skew_evidence":{"docs":$skewDocs,"hot_domain_share":${f(CorpusGen.HotDomainShare / 10.0)},"domain_partitioned":{"sec":${f(domainSec)},"task_ms_median":$domainMed,"task_ms_max":$domainMax},"salted":{"sec":${f(saltedSec)},"task_ms_median":$saltedMed,"task_ms_max":$saltedMax}}""" +
      s""","scaling":{"cpus_lo":$cpusLo,"sec_lo":${f(tLo)},"cpus_hi":$cpusHi,"sec_hi":${f(tHi)},"efficiency":${f(efficiency)},"fallback_legs":$fallbackLegs}}"""
    println(line)
    // belt-and-braces: also land the metric line in a file so the bench
    // signal stays machine-readable even if a log wrapper prefixes stdout
    scala.util.Try(java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n"))
  }
}
