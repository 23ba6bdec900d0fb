package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ShortType, StringType, TimestampType, FloatType}
import graft.pipeline.Casting
import graft.textops.Float16

/** Pins the export-cast stage against the reference's KEY_TYPE_PAIRINGS
  * (/root/reference/src/config.py:119-135) + dataframe_casting
  * (/root/reference/src/fetch.py:205-234).
  */
class CastingSpec extends AnyFunSuite with SparkTestBase {

  test("int16 downcast applies to exactly the four count columns") {
    import spark.implicits._
    val df = Seq((1L, 42, 3, 1, 250, 0.5625f, "x"))
      .toDF("doc_id", "times_cited", "matching_terms", "bycatch_terms",
        "total_word_count", "wordscore", "title")
    val out = Casting.dataframeCasting(df)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("times_cited") == ShortType)
    assert(types("matching_terms") == ShortType)
    assert(types("bycatch_terms") == ShortType)
    assert(types("total_word_count") == ShortType)
    assert(types("wordscore") == FloatType) // f16-quantized VALUE, float carrier
    assert(types("title") == StringType)
    assert(types("doc_id") != ShortType) // not in the pairings -> untouched
    val r = out.head()
    assert(r.getShort(1) == 42.toShort)
  }

  test("wordscore passes through float16 quantization (reference goldens)") {
    import spark.implicits._
    // values straddling half-precision lattice points
    val vals = Seq(0.5625f, 0.123456f, 0.9999f, 1.0f, 0.0f, 0.33333f)
    val df = vals.map(v => Tuple1(v)).toDF("wordscore")
    val got = Casting.dataframeCasting(df).collect().map(_.getFloat(0))
    val want = vals.map(v => Float16.quantize(v))
    assert(got.toSeq == want)
    // quantization is lossy for non-lattice values (proves it ran)
    assert(got(1) != 0.123456f)
  }

  test("pub_date coerces like pandas errors='coerce'") {
    import spark.implicits._
    val df = Seq(("2020-03-14", 1), ("not-a-date", 2), (null: String, 3))
      .toDF("pub_date", "k")
    val out = Casting.dataframeCasting(df)
    assert(out.schema("pub_date").dataType == TimestampType)
    val rows = out.collect().map(r => r.getInt(1) -> Option(r.get(0))).toMap
    assert(rows(1).nonEmpty)
    assert(rows(2).isEmpty)
    assert(rows(3).isEmpty)
  }

  test("columns absent from the frame are skipped (reference guard)") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k", "v")
    val out = Casting.dataframeCasting(df)
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.head().getInt(0) == 1)
  }

  test("int16 downcast wraps on overflow like numpy astype(int16), never throws") {
    import spark.implicits._
    // goldens from numpy: int16(40000) = -25536 etc.; Spark 4's ANSI cast
    // would abort the export on the first out-of-range count
    val df = Seq(
      (1L, Some(40000L)), (2L, Some(32767L)), (3L, Some(32768L)),
      (4L, Some(-40000L)), (5L, Some(65536L)), (6L, Some(70000L)),
      (7L, None)
    ).toDF("k", "times_cited")
    val out = Casting.dataframeCasting(df)
    assert(out.schema("times_cited").dataType ==
      org.apache.spark.sql.types.ShortType)
    val got = out.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getShort(1).toInt)))
      .toMap
    assert(got == Map(1L -> Some(-25536), 2L -> Some(32767), 3L -> Some(-32768),
      4L -> Some(25536), 5L -> Some(0), 6L -> Some(4464), 7L -> None))
  }
}
