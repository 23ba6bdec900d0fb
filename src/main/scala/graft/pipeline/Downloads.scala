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

  /** Deterministic minimal PNG payload (signature + url-hash-derived
    * filler): the offline stand-in for the fetched image bytes, sniffable
    * by graft.multimodal.BinaryFeatures' png magic check. */
  def pngPayload(imgUrl: String): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    val h = fnv1a64(imgUrl)
    val n = 64 + math.floorMod(h, 128).toInt
    val body = Array.tabulate[Byte](n)(i => ((h >>> (i % 8 * 8)) & 0xff).toByte)
    sig ++ body
  }

  /** Images-mode receipts (reference ImagesDownloader,
    * /root/reference/src/downloaders.py:293-344): one figure fetch per
    * HTML page. Filename keeps the reference's
    * `{today}_{etag}_{file_id}.{ext}` shape (downloaders.py:346-366) with
    * the Etag and file_id made deterministic (Etag = hex of the image-url
    * hash; file_id = url hash folded into the reference's randint(1,255)
    * range); ext = the url's last dot-suffix (downloaders.py:306). */
  def imageReceipts(pages: Dataset[PageRecord], today: java.time.LocalDate): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val prefix = today.format(java.time.format.DateTimeFormatter.ofPattern("yyMMdd"))
    pages
      .filter(p => !graft.pdf.PdfDoc.isPdf(p.html))
      .map { p =>
        val imgUrl = s"${p.url}/figures/0.png"
        val ext = imgUrl.split('.').last
        val etag = java.lang.Long.toHexString(fnv1a64(imgUrl))
        val fileId = math.floorMod(fnv1a64(p.url), 255) + 1
        val payload = pngPayload(imgUrl)
        DownloadReceipt(
          downloader = "graft.ImagesDownloader",
          url = imgUrl,
          success = payload.nonEmpty,
          filepath = s"${prefix}_${etag}_$fileId.$ext",
          n_bytes = payload.length.toLong)
      }.toDF()
  }
}
