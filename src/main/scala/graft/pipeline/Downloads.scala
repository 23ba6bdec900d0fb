package graft.pipeline

import org.apache.spark.sql.{Dataset, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{PageRecord, DownloadReceipt}

/** The reference `download` mode re-expressed (BulkPDFScraper /
  * ImagesDownloader, /root/reference/src/downloaders.py:137-182,293-344):
  * resolve a download link, fetch bytes, emit a receipt per row. Offline,
  * the bytes already live in the pages table, so the stage is the receipt
  * + naming logic; online, the fetch happens in the same mapPartitions
  * with a per-partition HTTP client (the reference reuses one module-
  * global Session, webscrapers.py:24).
  *
  * Receipts + payload stay COLUMNS of one distributed table — a driver-
  * side file-per-document sink (the reference's tempfile dance,
  * downloaders.py:91-117) cannot scale past one machine.
  */
object Downloads {

  /** sci-hub-style location.href link cleaning applied relationally —
    * SURVEY.md §2.7 row 38, goldens in IdentifiersSpec. */
  def cleanLink(rawOnclick: String, baseUrl: String): String =
    graft.ids.LinkCleaner.formatDownloadLink(rawOnclick, baseUrl).getOrElse("")

  /** Receipt per page. Deterministic filepath: dated prefix (reference
    * naming, fetch.py:258-263) + xxhash of the url (replaces the
    * reference's randint — incidental nondeterminism, §2.7 row 47). */
  def receipts(pages: Dataset[PageRecord], today: java.time.LocalDate): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val prefix = today.format(java.time.format.DateTimeFormatter.ofPattern("yyMMdd"))
    pages.map { p =>
      val ok = p.html != null && p.html.nonEmpty
      val kind = if (graft.pdf.PdfDoc.isPdf(p.html)) "pdf" else "html"
      DownloadReceipt(
        downloader = "graft.BulkDownloader",
        url = p.url,
        success = ok,
        filepath = s"$prefix/${java.lang.Long.toUnsignedString(
          scala.util.hashing.MurmurHash3.stringHash(p.url).toLong & 0xffffffffL)}.$kind",
        n_bytes = if (ok) p.html.length.toLong else 0L)
    }.toDF()
  }
}
