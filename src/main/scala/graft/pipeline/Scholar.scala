package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Google Scholar paged-search analog — the reference's only
  * generator/UDTF-shaped operator: ONE query row yields N result rows
  * across pages of 10 (GoogleScholarScraper.obtain,
  * /root/reference/src/webscrapers.py:94-161).
  *
  * Offline, the HTTP+DOM loop becomes a join against a deterministic
  * `scholar_snapshot` table keyed by query text, with the reference's
  * paging semantics applied relationally:
  *   - num_pages = (num_articles - 1) // 10 + 1 (webscrapers.py:112);
  *   - every result on a fetched page is yielded, so the TRUE cap is
  *     num_pages * 10, not num_articles — a reference quirk kept
  *     faithfully (num_articles=12 yields up to 20 rows);
  *   - per-result field extraction mirrors the CSS+regex pipeline:
  *     times_cited = first \d+ of the gs_flb text, pub_date = first
  *     \d{4} of the gs_a byline — with the reference's fallback of
  *     returning the WHOLE element text when the regex misses
  *     (webscrapers.py:163-183).
  *
  * Scale shape: the snapshot is an equi-join keyed by query text; the
  * query side is small (a user's search list), so this broadcasts the
  * queries against the big snapshot — no shuffle of the snapshot beyond
  * the scan.
  */
object Scholar {

  /** reference webscrapers.py:102-109 — canonical copy lives with its
    * golden-tested consumer in [[graft.ids.QueryStrings]] (keeps ids a
    * leaf package); forwarded here for pipeline-side callers. */
  def PublicationTypeMapping: Map[String, String] =
    graft.ids.QueryStrings.PublicationTypeMapping

  /** reference webscrapers.py:112 — Python FLOOR division: Scala's `/`
    * truncates toward zero, which would turn num_articles = 0 into one
    * fetched page instead of none. */
  def numPages(numArticles: Int): Int = Math.floorDiv(numArticles - 1, 10) + 1

  // Snapshot synthesis is pure integer->string arithmetic so the DuckDB
  // oracle can regenerate the identical table from generate_series (the
  // dialect pair lives in Queries.q30). One row per (query, result idx).
  val SnapshotQueries = 25
  val SnapshotPerQuery = 30

  /** Deterministic scholar_snapshot: (q, idx, title, article_url,
    * abstract_snippet, gs_flb_text, gs_a_text). Shapes follow the CSS
    * selectors the reference reads: h3.gs_rt title, .gs_rs snippet,
    * .gs_flb "Cited by N" line, .gs_a byline with year. */
  def snapshot(spark: SparkSession): DataFrame =
    spark.range(0, SnapshotQueries.toLong * SnapshotPerQuery)
      .selectExpr(
        s"id DIV $SnapshotPerQuery AS qid",
        s"id % $SnapshotPerQuery AS idx")
      .selectExpr(
        "concat('topic ', qid) AS q",
        "idx",
        "concat('Paper ', qid, '-', idx, ': advances in topic ', qid) AS title",
        "concat('https://articles.example.org/a/', qid, '/', idx) AS article_url",
        "CASE WHEN idx % 7 = 0 THEN 'N/A' ELSE concat('Snippet ', qid, ' ', idx, ' about topic ', qid) END AS abstract_snippet",
        "concat('Save Cite Cited by ', (idx * 13 + qid * 3) % 500, ' Related articles') AS gs_flb_text",
        "concat('A Author, B Author - Journal of Topic ', qid, ', ', 1990 + (idx * 7 + qid) % 35, ' - pub.example.org') AS gs_a_text")

  /** find_element_text's regex-with-fallback (webscrapers.py:163-183):
    * first match of `pattern`, else the whole text. */
  private def regexOrText(c: org.apache.spark.sql.Column, pattern: String) = {
    val m = regexp_extract(c, pattern, 0)
    when(m === "", c).otherwise(m)
  }

  /** Paged search: `queries` (one `search_text` column) x snapshot ->
    * WebScrapeResult-shaped rows. Output columns are scalars only so
    * the result is oracle-comparable. */
  def search(
      queries: DataFrame,
      snapshot: DataFrame,
      publicationType: String,
      numArticles: Int): DataFrame = {
    val cap = numPages(numArticles) * 10
    queries
      .join(snapshot, col("search_text") === col("q"))
      .filter(col("idx") < cap)
      .select(
        col("search_text"),
        col("idx"),
        col("title"),
        regexOrText(col("gs_a_text"), "\\d{4}").as("pub_date"),
        col("article_url").as("doi"),
        lit(publicationType).as("internal_id"),
        expr("try_cast(regexp_extract(gs_flb_text, '\\\\d+', 0) AS BIGINT)").as("times_cited"),
        col("abstract_snippet").as("abstract_text"))
  }
}
