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

  /** 64-bit FNV-1a — collision-safe at corpus scale (a 32-bit hash
    * collides with ~50% probability already at ~77k urls). */
  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Receipt per page. Deterministic filepath: dated prefix (reference
    * naming, fetch.py:258-263) + 64-bit content-independent url hash
    * (replaces the reference's randint — incidental nondeterminism,
    * §2.7 row 47). */
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
        filepath = s"$prefix/${java.lang.Long.toUnsignedString(fnv1a64(p.url))}.$kind",
        n_bytes = if (ok) p.html.length.toLong else 0L)
    }.toDF()
  }
}
