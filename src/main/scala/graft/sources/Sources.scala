package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Scan/source/sink operators from SURVEY.md §2.1 — each maps one
  * reference ingest path onto the matching Spark source so Catalyst can
  * prune/push down at the scan.
  */
object Sources {

  /** CSV scan with column pruning — the reference's
    * `pd.read_csv(..., usecols=[column])` + NA fill
    * (/root/reference/src/serials.py:26-43, :89-106). Catalyst prunes the
    * scan to `column` (ReadSchema shows one field). */
  def csvColumn(spark: SparkSession, path: String, column: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(coalesce(col(column), lit("N/A")).as(column))

  /** Recursive PDF directory scan — the reference's `rglob("*.pdf")`
    * (/root/reference/src/serials.py:46-63) as a binaryFile source; rows
    * carry (path, modificationTime, length, content). */
  def pdfDirectory(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.pdf")
      .load(dir)

  /** Word-set file load: one word per line, strip+lower, de-duplicated —
    * driver-side once, then broadcast (the reference re-reads per
    * document, /root/reference/src/docscraper.py:110-127,146-147). */
  def wordSet(spark: SparkSession, path: String): Set[String] = {
    import spark.implicits._
    graft.textops.TextOps.loadWordSet(
      spark.read.textFile(path).collect().iterator)
  }

  /** Dated export name — the reference's `{today}_{prefix}.csv` with
    * `strftime("%y%m%d")` (/root/reference/src/fetch.py:258-263,
    * src/config.py:83); the image-name randint is replaced by a
    * deterministic content hash (non-determinism there is incidental,
    * SURVEY.md §2.7 row 47). */
  def exportName(prefix: String, today: java.time.LocalDate): String =
    datePrefix(today) + s"_$prefix.csv"

  /** The reference's `strftime("%y%m%d")` dated prefix — ONE definition
    * shared by exportName and every receipt-naming path (five hand
    * copies of the pattern invited a silent naming fork between the
    * mode path and the pages path q29's oracle assumes are identical —
    * round-5 review). */
  def datePrefix(today: java.time.LocalDate): String =
    today.format(java.time.format.DateTimeFormatter.ofPattern("yyMMdd"))

  /** CSV export sink — the reference's `df.to_csv(..., index=False)`
    * (/root/reference/src/fetch.py:236-250). `coalesce(1)` reproduces the
    * single-file layout for golden comparison; production writes stay
    * partitioned parquet (graft.table.GraftTable).
    *
    * Complex columns are stringified first (Spark's CSV source refuses
    * them; pandas to_csv writes their repr): the top-3 term lists render
    * as the reference's Python list-of-tuples repr
    * (`[('spark', 2), ...]`, docscraper.py's most_common output); any
    * other array/struct/map column renders as JSON. */
  /** Python `repr(str)` quote selection for the term tuples (round-5
    * review — a term containing an apostrophe rendered ('don't', 2)
    * where CPython writes ("don't", 2)): backslashes double, then the
    * string single-quotes with \' escapes UNLESS it contains a single
    * quote and no double quote, in which case it double-quotes
    * unescaped — CPython's exact rule. (Control-char escapes are not
    * reproduced; terms are space-split tokens.) */
  private[graft] def pyStrRepr(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val esc = regexp_replace(x, "\\\\", "\\\\\\\\")
    when(x.contains("'") && !x.contains("\""),
      concat(lit("\""), esc, lit("\"")))
      .otherwise(concat(lit("'"), regexp_replace(esc, "'", "\\\\'"), lit("'")))
  }

  def exportCsv(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.types.{ArrayType, StructType, MapType}
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case ArrayType(st: StructType, _)
            if st.fieldNames.sameElements(Array("term", "count")) =>
          concat(lit("["), array_join(transform(col(f.name), x =>
            concat(lit("("), pyStrRepr(x.getField("term")), lit(", "),
              x.getField("count").cast("string"), lit(")"))), ", "),
            lit("]")).as(f.name)
        case _: ArrayType | _: StructType | _: MapType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
      .coalesce(1).write.mode("overwrite").option("header", "true")
      // pandas to_csv escapes an embedded quote by DOUBLING it
      // (csv.QUOTE_MINIMAL); Spark's default backslash-escape diverged
      // from the reference's byte layout for any cell containing '"'
      .option("escape", "\"")
      .csv(path)
  }
}
