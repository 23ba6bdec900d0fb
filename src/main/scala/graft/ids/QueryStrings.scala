package graft.ids

/** Querystring builders — SURVEY.md §2.7 row 48. Offline these become the
  * join keys of the enrichment snapshots; the builders are kept (and
  * golden-tested) because they ARE the reference's request contract.
  */
object QueryStrings {

  /** DimensionsScraper.create_querystring
    * (/root/reference/src/webscrapers.py:264-276): either the
    * citation-subset form or the 4-field search form whose search_field
    * sniffs DOI-ness. */
  def dimensions(searchText: String, querySubsetCitations: Boolean = false): Map[String, String] =
    if (querySubsetCitations) Map("or_subset_publication_citations" -> searchText)
    else Map(
      "search_mode" -> "content",
      "search_text" -> searchText,
      "search_type" -> "kws",
      "search_field" -> Identifiers.searchField(searchText))

  /** CitationScraper.create_querystring (webscrapers.py:324-329); style
    * values mirror the Style enum (webscrapers.py:279-291). */
  def citation(
      doi: String,
      style: String = "apa",
      lang: String = "en-US"): Map[String, String] =
    Map("doi" -> doi, "style" -> style, "lang" -> lang)

  /** GoogleScholarScraper page params (webscrapers.py:104-120), including
    * the reference's pubtype-as-its-own-key quirk (the mapped publication
    * type string is used as BOTH key and value, so "all" contributes an
    * empty-string key). */
  /** reference webscrapers.py:102-109. Lives here (not in
    * pipeline.Scholar) so ids stays a leaf package: pipeline already
    * depends on ids, and the mapping's golden-tested consumer is this
    * builder. */
  val PublicationTypeMapping: Map[String, String] = Map(
    "all" -> "",
    "j" -> "source: journals",
    "b" -> "source: books",
    "c" -> "source: conferences")

  def scholar(
      searchText: String,
      startYear: Int,
      endYear: Int,
      publicationType: String,
      page: Int): Map[String, String] = {
    val pt = PublicationTypeMapping.getOrElse(publicationType, "")
    Map(
      "q" -> searchText,
      "as_ylo" -> startYear.toString,
      "as_yhi" -> endYear.toString,
      pt -> pt,
      "start" -> (page * 10).toString)
  }
}
