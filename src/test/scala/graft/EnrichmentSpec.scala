package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Enrichment

/** Pins the full enrichment family (SURVEY.md §2.1 rows 6-10): hit/miss
  * behavior of every left join, the JSON-path abstract access, pub_date
  * errors="coerce" semantics, and the 404-analog (a key absent from the
  * snapshot behaves exactly like the reference's None-on-miss,
  * /root/reference/src/webscrapers.py:205-206).
  */
class EnrichmentSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val rows = Enrichment.enrichFull(spark, sf).collect()
  private lazy val full = rows.map(r => r.getLong(0) -> r).toMap

  test("every document survives the enrichment exactly once (no fanout)") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    // ROW count, not keyed-map size: duplicate snapshot keys would fan
    // rows out invisibly to a doc_id-keyed map
    assert(rows.length.toLong == n)
    assert(full.size.toLong == n)
  }

  test("dimensions hit: fields populated; miss: N/A like the reference") {
    val hit = full(6L) // doc_id 6: %3==0 has doi, %6==0 in dim snapshot
    assert(hit.getString(1) == "10.5555/d6")
    assert(hit.getLong(3) == (6L * 7) % 90)
    assert(hit.getString(4) == s"Journal of Topic ${6 % 12}")
    assert(hit.getString(5) == "pub.6")
    val miss = full(3L) // doc_id 3: has doi but %6==3 -> NOT in dim snapshot
    assert(miss.getString(1) == "10.5555/d3")
    assert(miss.isNullAt(3), "times_cited must be null on a dim miss")
    assert(miss.getString(4) == "N/A")
    assert(miss.getString(5) == "N/A")
    val noDoi = full(1L) // the 404 analog: no key at all
    assert(noDoi.getString(1) == "N/A")
    assert(noDoi.isNullAt(3))
  }

  test("biblio covers exactly the odd doi half (crosscite analog)") {
    assert(full(3L).getString(7) ==
      s"Author A. (${1990 + 3 % 35}). Paper 3. Journal of Topic ${3 % 12}.")
    assert(full(6L).getString(7) == "N/A") // even half: biblio miss
    assert(full(1L).getString(7) == "N/A")
  }

  test("abstract arrives via the docs[0].abstract JSON path") {
    // dim-covered docs alternate: %12==0 -> abstract present, %12==6 ->
    // key-present MISS (internal_id exists, no abstract row)
    assert(full(12L).getString(8) == "Abstract body for 12")
    assert(full(24L).getString(8) == "Abstract body for 24")
    assert(full(6L).getString(5) == "pub.6") // internal_id present...
    assert(full(6L).getString(8) == "N/A") // ...but abstract row absent
    assert(full(18L).getString(8) == "N/A")
    // and the no-key miss path via a dim miss:
    assert(full(3L).getString(8) == "N/A")
  }

  test("pub_date: ISO strings coerce, garbage nulls (errors='coerce')") {
    // doc 6: %5 != 0 -> parseable date 1996-07-16
    val d6 = full(6L).getDate(6)
    assert(d6.toString == s"${1990 + 6 % 35}-0${1 + 6 % 9}-1${6 % 10}")
    // doc 0: %5==0 -> 'not-a-date' -> null
    assert(full(0L).isNullAt(6))
    // dim miss -> null
    assert(full(3L).isNullAt(6))
  }

  test("figures: count + CSV urls for the even-title half") {
    val f2 = full(2L) // 2%4=2 figures
    assert(f2.getLong(9) == 2L)
    assert(f2.getString(10) == "https://figs.example.org/2/0,https://figs.example.org/2/1")
    val f4 = full(4L) // 4%4=0 figures -> csv null -> N/A
    assert(f4.getLong(9) == 0L)
    assert(f4.getString(10) == "N/A")
    assert(full(1L).isNullAt(9)) // odd doc: figures snapshot miss
  }
}
