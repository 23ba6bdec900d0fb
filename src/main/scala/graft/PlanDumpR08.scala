package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-8 plan evidence: writes `plans/r08/<query>_<suffix>.txt` with
  * the `.explain("formatted")` output of each named query, so the
  * before/after plan-shape claims in OPTIMIZATION_r08.md are checkable
  * without running Spark. Usage:
  *   sbt "runMain graft.PlanDumpR08 <suffix> q41_jaccard_join ..."
  * Plan SHAPE is scale-independent; sf0.001 keeps the dump fast. Eager
  * queries (q19/q40) localize their results — their returned frame's
  * plan is the localized scan and is labeled as such in the file.
  */
object PlanDumpR08 {
  def main(args: Array[String]): Unit = {
    graft.queries.Queries.auxDumpEnabled = false
    val suffix = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    Files.createDirectories(Paths.get("plans/r08"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"plans/r08/${name}_$suffix.txt"), txt)
      println(s"PLAN_OK $name ${txt.length}")
    }
    spark.stop()
  }
}
