package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions path: a session built with GraftExtensions
  * resolves the native functions by SQL name with no registerAll call. */
class ExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("session built with GraftExtensions resolves native SQL functions") {
    spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is static conf — it only applies when the
      // SparkContext is created, and tests share one context; the
      // programmatic withExtensions path exercises the same entry point
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      // ALL FOUR registered expressions — the extensions path iterates
      // the same registry as registerAll, so a function missing here is
      // a registry bug, not a copy-table drift (the round-4 review found
      // minhash_bands absent from the old hand-written table)
      val row = s2.sql(
        """SELECT half_float(0.7425D) AS h,
                  simhash64('the quick brown fox') AS s,
                  dot_i64(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
                  minhash_bands(array('ab', 'cd')) AS m""").head()
      assert(row.getFloat(0) == graft.textops.Float16.quantize(0.7425))
      assert(row.getLong(1) == graft.functions.SimHash64.compute("the quick brown fox"))
      assert(row.getLong(2) == 32L)
      assert(row.getSeq[String](3).length == 4) // 4 r=2 band buckets
      // wrong arity fails analysis with a NAMED message, not a raw
      // NoSuchElementException from exprs.head
      val e = intercept[Exception] { s2.sql("SELECT dot_i64(array(1L))").head() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("dot_i64 expects 2")), messages(e).mkString("; "))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
