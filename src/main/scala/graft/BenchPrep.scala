package graft
import org.apache.spark.sql.SparkSession
/** Materialize the bench corpus once for ladder probes (scratch utility). */
object BenchPrep {
  def main(args: Array[String]): Unit = {
    val Array(dir, nS) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.pipeline.ExtractPipeline.pages(spark, nS.toLong, 128)
      .write.mode("overwrite").parquet(s"$dir/pages")
    graft.pipeline.ExtractPipeline.pages(spark, 4000, 32)
      .write.mode("overwrite").parquet(s"$dir/warm")
    println("PREP_OK")
    spark.stop()
  }
}
