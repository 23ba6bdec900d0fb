package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ShortType, StringType}

/** The reference's export-time dataframe_casting
  * (/root/reference/src/fetch.py:205-234): pub_date to datetime with
  * errors="coerce", then every column present in KEY_TYPE_PAIRINGS
  * (/root/reference/src/config.py:119-135) cast to its export type —
  * strings stay strings, the four count columns downcast to int16, and
  * wordscore quantizes to float16.
  *
  * Spark mapping: ShortType for int16; float16 via the codegen'd
  * half_float round-trip expression (Spark has no HalfType — the VALUE is
  * quantized to the nearest representable half, byte-compatible with
  * numpy's astype(np.float16) when read back as float); columns absent
  * from the frame are skipped, like the `if scikey in dataframe` guard.
  * At 100 TB the int16/float16 downcasts halve (or better) the export
  * bytes of every numeric column — the same motivation as the reference.
  */
object Casting {

  /** config.py:119-135, in reference order. */
  val KeyTypePairings: Seq[(String, String)] = Seq(
    "doi_from_pdf" -> "string",
    "title" -> "string",
    "doi" -> "string",
    "internal_id" -> "string",
    "times_cited" -> "int16",
    "matching_terms" -> "int16",
    "bycatch_terms" -> "int16",
    "total_word_count" -> "int16",
    "wordscore" -> "float16",
    "abstract" -> "string",
    "biblio" -> "string",
    "journal_title" -> "string",
    "downloader" -> "string",
    "filepath" -> "string",
    "paper_parentheticals" -> "string")

  /** dataframe_casting analog. */
  def dataframeCasting(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val dated =
      if (present.contains("pub_date"))
        df.withColumn("pub_date", expr("try_to_timestamp(CAST(pub_date AS STRING))"))
      else df
    KeyTypePairings.foldLeft(dated) { case (d, (name, ty)) =>
      if (!present.contains(name)) d
      else ty match {
        case "int16"   => d.withColumn(name,
          // numpy/pandas astype(int16) WRAPS on overflow and never fails
          // the export; Spark 4's ANSI cast would abort the whole job on
          // the first count > 32767. Sign-extend the low 16 bits instead:
          // identical in range, identical wrap out of range, null-safe.
          expr(s"CAST(((CAST(`$name` AS BIGINT) & 65535) ^ 32768) - 32768 AS SMALLINT)"))
        case "float16" => d.withColumn(name,
          graft.functions.GraftFunctions.half_float(col(name).cast("float")))
        case _         => d.withColumn(name, col(name).cast(StringType))
      }
    }
  }
}
