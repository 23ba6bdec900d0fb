package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.ExtractPipeline
import graft.corpus.CorpusGen

/** One scaling leg, run as its OWN JVM under `taskset -c 0-(N-1)` so the
  * process — executor threads, GC, JIT — really owns exactly N cores,
  * like an N-core executor would. In-process local[N] legs flatter the
  * small-N side: the JVM's 32 GC/compiler threads run free on the idle
  * cores. Spawned by graft.Bench; prints LEG_SEC=<best seconds>.
  */
object BenchLeg {
  def main(args: Array[String]): Unit = {
    val Array(pagesPath, warmPath, cpusS, itersS) = args
    val cpus = cpusS.toInt
    val iters = itersS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def leg(path: String): Long = {
      val pages = spark.read.parquet(path).as[graft.model.PageRecord]
      ExtractPipeline.extractAndScore(pages, 0,
          CorpusGen.TargetWords.toSet, CorpusGen.BycatchWords.toSet)
        .mapPartitions(it => Iterator.single(it.count(_.ok).toLong))
        .reduce(_ + _)
    }
    leg(warmPath); leg(pagesPath) // JIT warm
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      leg(pagesPath)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val median = times(times.length / 2)
    println("LEG_SEC=" + "%.3f".formatLocal(java.util.Locale.ROOT, median))
    spark.stop()
  }
}
