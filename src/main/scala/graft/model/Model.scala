package graft.model

/** Row models for the engine (SURVEY.md §1.1). All strings use "" for
  * absent values so parquet/oracle round trips stay schema-stable.
  */

/** Input row of the `pages` table (BASELINE.json input_hint).
  *
  * equals/hashCode are overridden to compare `html` by CONTENT: the
  * case-class default compares Array[Byte] by reference, so two
  * structurally identical pages would never be equal — a silent hazard
  * for any driver-side Set/Map/distinct over collected rows. (Spark
  * itself is unaffected: encoders serialize fields, not equals.) */
final case class PageRecord(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String) {
  override def equals(o: Any): Boolean = o match {
    case p: PageRecord => url == p.url && warc_ts == p.warc_ts &&
      java.util.Arrays.equals(html, p.html) && text == p.text && lang == p.lang
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(url, warc_ts,
      Integer.valueOf(java.util.Arrays.hashCode(html)), text, lang)
}

/** Term + count pair (reference FreqDistAndCount element,
  * /root/reference/src/docscraper.py:18-34). */
final case class TermCount(term: String, count: Int)

/** Output of the parse stage: main-content text + structured fields.
  * Reference analog: WebScrapeResult + the PDF path of DocumentResult
  * (/root/reference/src/webscrapers.py:27-42, /root/reference/src/docscraper.py:37-52). */
final case class ExtractedDoc(
    url: String,
    kind: String, // "html" | "pdf"
    extracted_text: String,
    title: String,
    abstract_text: String,
    doi: String,
    citation_spans: Seq[String],
    n_bytes: Long,
    ok: Boolean,
    error: String)

/** Full scored row (reference DocumentResult,
  * /root/reference/src/docscraper.py:37-52). wordscore carries float16
  * quantization per /root/reference/src/config.py:124-128. */
final case class ScoredDoc(
    url: String,
    kind: String,
    extracted_text: String,
    title: String,
    abstract_text: String,
    doi: String,
    citation_spans: Seq[String],
    matching_terms: Int,
    bycatch_terms: Int,
    total_word_count: Int,
    wordscore: Float,
    target_terms_top_3: Seq[TermCount],
    bycatch_terms_top_3: Seq[TermCount],
    paper_parentheticals: Seq[String],
    n_bytes: Long,
    ok: Boolean,
    error: String)

/** Download receipt (reference DownloadReceipt,
  * /root/reference/src/downloaders.py:32-52). In the offline graft the
  * payload BYTES live in a binary column of the output table (SURVEY.md
  * §2.1 row 12 choice) — filepath names the would-be export file,
  * deterministic (xxhash replaces the reference's randint, §2.7 row 47). */
final case class DownloadReceipt(
    downloader: String,
    url: String,
    success: Boolean,
    filepath: String,
    n_bytes: Long)

/** Enrichment output row (reference WebScrapeResult,
  * /root/reference/src/webscrapers.py:27-42). */
final case class WebScrapeResult(
    title: String,
    pub_date: String,
    doi: String,
    internal_id: String,
    journal_title: String,
    times_cited: Int,
    author_list: Seq[String],
    citations: Seq[String],
    keywords: Seq[String],
    figures: Seq[String],
    biblio: String,
    abstract_text: String)

/** Per-partition lineage row (north rule: per-partition lineage +
  * metrics; SURVEY.md §4.4). */
final case class LineageRow(
    bucket: Int,
    n_docs: Long,
    n_ok: Long,
    n_err: Long,
    bytes_in: Long,
    wall_ms: Long,
    attempt: Int,
    ts: java.sql.Timestamp)
