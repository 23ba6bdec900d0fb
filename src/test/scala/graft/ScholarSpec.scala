package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ids.QueryStrings
import graft.pipeline.Scholar

/** Pins the Google Scholar paged-search analog (SURVEY.md §2.1 row 9) and
  * the querystring builders (row 48) against the reference semantics
  * (/root/reference/src/webscrapers.py:94-161, :264-276, :324-329;
  * goldens /root/reference/tests/test_webscrapers.py:15-31,:48-56).
  */
class ScholarSpec extends AnyFunSuite with SparkTestBase {

  test("dimensions querystring golden table (search_field sniff)") {
    val cases = Seq(
      ("10.1000/182", "doi"),
      ("apples", "text_search"),
      ("10.1000/185", "doi"),
      ("Don Quixote", "text_search"),
      ("12.1050/100", "text_search"),
      ("100.000", "text_search"))
    cases.foreach { case (in, expected) =>
      val qs = QueryStrings.dimensions(in)
      assert(qs("search_field") == expected)
      assert(qs("search_mode") == "content")
      assert(qs("search_text") == in)
      assert(qs("search_type") == "kws")
    }
  }

  test("dimensions querystring: citation-subset form") {
    assert(QueryStrings.dimensions("10.1000/182", querySubsetCitations = true) ==
      Map("or_subset_publication_citations" -> "10.1000/182"))
  }

  test("citation querystring shape (crosscite)") {
    assert(QueryStrings.citation("10.1000/182") ==
      Map("doi" -> "10.1000/182", "style" -> "apa", "lang" -> "en-US"))
    assert(QueryStrings.citation("x", style = "modern-language-association")("style") ==
      "modern-language-association")
  }

  test("scholar querystring: paging start and pubtype-as-key quirk") {
    val p0 = QueryStrings.scholar("federated learning", 2022, 2022, "all", page = 0)
    assert(p0("q") == "federated learning")
    assert(p0("as_ylo") == "2022" && p0("as_yhi") == "2022")
    assert(p0("start") == "0")
    assert(p0.contains("")) // "all" maps to the empty-string key (reference quirk)
    val p2 = QueryStrings.scholar("x", 2000, 2010, "j", page = 2)
    assert(p2("start") == "20")
    assert(p2("source: journals") == "source: journals")
  }

  test("numPages matches the reference arithmetic") {
    // (num_articles - 1) // 10 + 1, webscrapers.py:112 — FLOOR division
    assert(Scholar.numPages(0) == 0)
    assert(Scholar.numPages(1) == 1)
    assert(Scholar.numPages(10) == 1)
    assert(Scholar.numPages(11) == 2)
    assert(Scholar.numPages(12) == 2)
    assert(Scholar.numPages(20) == 2)
    assert(Scholar.numPages(21) == 3)
  }

  test("search: page cap, field extraction, regex fallback semantics") {
    val qs = spark.range(0, 2).selectExpr("concat('topic ', id) AS search_text")
    val got = Scholar.search(qs, Scholar.snapshot(spark), "all", numArticles = 12).collect()
    // 2 queries x 2 pages x 10 results (reference yields whole pages)
    assert(got.length == 40)
    val byQuery = got.groupBy(_.getString(0))
    assert(byQuery.keySet == Set("topic 0", "topic 1"))
    byQuery.values.foreach(rows => assert(rows.map(_.getLong(1)).sorted.toSeq == (0L until 20L)))
    got.foreach { r =>
      val idx = r.getLong(1)
      val qid = r.getString(0).stripPrefix("topic ").toLong
      assert(r.getString(2) == s"Paper $qid-$idx: advances in topic $qid")
      assert(r.getString(3) == (1990 + (idx * 7 + qid) % 35).toString) // pub_date year
      assert(r.getString(4) == s"https://articles.example.org/a/$qid/$idx") // doi = article url
      assert(r.getString(5) == "all") // internal_id = publication type
      assert(r.getLong(6) == (idx * 13 + qid * 3) % 500) // times_cited
      if (idx % 7 == 0) assert(r.getString(7) == "N/A") else assert(r.getString(7).startsWith("Snippet "))
    }
  }

  test("search: one-page cap with num_articles <= 10") {
    val qs = spark.range(0, 1).selectExpr("concat('topic ', id) AS search_text")
    val got = Scholar.search(qs, Scholar.snapshot(spark), "j", numArticles = 3).collect()
    assert(got.length == 10) // whole first page, reference quirk
    assert(got.forall(_.getString(5) == "j"))
  }
}
