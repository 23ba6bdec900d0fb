package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe for optimization-round stage isolation. Deleted before
  * round close. */
object ProbeMain {
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
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // genDoc vs parse cost, single-threaded
    {
      var t0 = System.nanoTime()
      val docs = (0L until 3000L).map(i => graft.corpus.CorpusGen.genDoc(i)._1)
      val tGen = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val parsed = docs.map(graft.pipeline.Extractor.extract)
      val tParse = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val g = (0L until 3000L).map(i => graft.corpus.CorpusGen.genGolden(i))
      val tGold = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val scored = parsed.map(d => graft.pipeline.Extractor.score(d, graft.corpus.CorpusGen.TargetWords.toSet, graft.corpus.CorpusGen.BycatchWords.toSet))
      val tScore = (System.nanoTime() - t0) / 1e9
      println(f"PROBE gen3k $tGen%.3f parse3k $tParse%.3f golden3k $tGold%.3f score3k $tScore%.3f ok=${parsed.count(_.ok)} ${scored.length}")
      // second pass, JIT-warm
      t0 = System.nanoTime(); (3000L until 6000L).map(i => graft.corpus.CorpusGen.genDoc(i)._1); println(f"PROBE gen3k_warm ${(System.nanoTime()-t0)/1e9}%.3f")
      t0 = System.nanoTime(); docs.map(graft.pipeline.Extractor.extract); println(f"PROBE parse3k_warm ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    // warm JIT
    SparkEntry.queries("q01_pricing_agg")(spark, sfDir).count()
    // q40 with varying state shuffle partitions
    for (p <- Seq(32, 8, 4)) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      time(s"q40_parts_$p") {
        SparkEntry.queries("q40_stream_extract")(spark, sfDir).count()
      }
      time(s"q40_parts_${p}_run2") {
        SparkEntry.queries("q40_stream_extract")(spark, sfDir).count()
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    // q15 pairs (builds + caches Q15Result)
    time("q15_build") {
      SparkEntry.queries("q15_lsh_near_dup")(spark, sfDir).count()
    }
    val pairs = graft.queries.Queries.q15CachedPairs(spark, sfDir).get
      .select("id_a", "id_b")
    println("PROBE pairs_n " + pairs.count())
    time("cc_only") {
      graft.pipeline.DedupGroups.connectedComponents(pairs).count()
    }
    time("cc_only2") {
      graft.pipeline.DedupGroups.connectedComponents(pairs).count()
    }
    time("cc_only3") {
      graft.pipeline.DedupGroups.connectedComponents(pairs).count()
    }
    time("groups_full") {
      graft.pipeline.DedupGroups.groups(pairs, 100).count()
    }
    time("q25_repeat") {
      SparkEntry.queries("q25_dedup_groups")(spark, sfDir).count()
    }
    spark.stop()
  }
}
