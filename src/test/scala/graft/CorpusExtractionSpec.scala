package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.CorpusGen
import graft.pipeline.Extractor

/** The north-rule correctness gate, pure form: byte-identical extracted
  * text per url against generator goldens, across both HTML and PDF
  * paths, without any cluster. */
class CorpusExtractionSpec extends AnyFunSuite {

  val N = 400

  test("generator is deterministic") {
    val (p1, g1) = CorpusGen.genDoc(123)
    val (p2, g2) = CorpusGen.genDoc(123)
    assert(p1.url == p2.url && g1 == g2)
    assert(java.util.Arrays.equals(p1.html, p2.html))
  }

  test("genGolden equals genDoc's golden without building page bytes") {
    // PDF ids (x % 10 >= 7) and HTML ids, across both rng-draw shapes
    (0L until 40L).foreach { id =>
      assert(CorpusGen.genGolden(id) == CorpusGen.genDoc(id)._2, s"id=$id")
    }
  }

  test(s"byte-identical extracted text for $N synthetic docs (HTML + PDF)") {
    var htmlDocs = 0
    var pdfDocs = 0
    (0L until N).foreach { id =>
      val (page, golden) = CorpusGen.genDoc(id)
      val ex = Extractor.extract(page)
      assert(ex.ok, s"doc $id failed: ${ex.error}")
      assert(ex.extracted_text == golden.extracted_text,
        s"doc $id (${ex.kind}) text mismatch:\nGOT:  ${ex.extracted_text.take(300)}\nWANT: ${golden.extracted_text.take(300)}")
      if (ex.kind == "html") htmlDocs += 1 else pdfDocs += 1
    }
    assert(htmlDocs > 100 && pdfDocs > 50, s"mix check html=$htmlDocs pdf=$pdfDocs")
  }

  test("byte-identical extraction holds at the size tail (50x-tiled heavy docs)") {
    // the heavy-tail bench corpus must be CORRECT, not just fast: the
    // same byte-identity gate on 50x-body pages exercises the parsers'
    // large-input paths (HTML across all four layout shapes + multi-page
    // PDFs) and pins that genHeavyDoc's golden tiles consistently
    var pdfDocs = 0
    Seq(0L, 1L, 2L, 3L, 7L, 9L, 13L, 17L, 27L, 96L).foreach { id =>
      val (page, golden) = CorpusGen.genHeavyDoc(id, 50)
      val (normal, _) = CorpusGen.genDoc(id)
      assert(page.html.length > normal.html.length * 10, s"doc $id not heavy")
      val ex = Extractor.extract(page)
      assert(ex.ok, s"heavy doc $id failed: ${ex.error}")
      assert(ex.extracted_text == golden.extracted_text,
        s"heavy doc $id (${ex.kind}) text mismatch")
      assert(ex.title == golden.title && ex.doi == golden.doi, s"heavy doc $id fields")
      if (ex.kind == "pdf") pdfDocs += 1
    }
    assert(pdfDocs >= 3, s"mix check pdf=$pdfDocs")
  }

  test("structured fields match goldens (title, abstract, doi, citations)") {
    (0L until N).foreach { id =>
      val (page, golden) = CorpusGen.genDoc(id)
      val ex = Extractor.extract(page)
      assert(ex.title == golden.title, s"doc $id title")
      assert(ex.doi == golden.doi, s"doc $id doi: got '${ex.doi}' want '${golden.doi}'")
      if (ex.kind == "html") {
        assert(ex.abstract_text == golden.abstract_text, s"doc $id abstract")
        assert(ex.citation_spans == golden.citation_spans, s"doc $id citations")
      }
    }
  }

  test("scoring facts: raw hit counts in goldens bound the top-3 sums") {
    (0L until N).foreach { id =>
      val (page, golden) = CorpusGen.genDoc(id)
      val tokens = graft.textops.TextOps.tokenize(page.text)
      assert(tokens.length == golden.total_words, s"doc $id token count")
      val t = graft.textops.TextOps.matchTerms(tokens, CorpusGen.TargetWords.toSet)
      val b = graft.textops.TextOps.matchTerms(tokens, CorpusGen.BycatchWords.toSet)
      assert(t.termCount <= golden.target_hits, s"doc $id target top3 > raw")
      assert(b.termCount <= golden.bycatch_hits, s"doc $id bycatch top3 > raw")
      // wordscore from the top-3 sums is in range and deterministic
      val s = graft.textops.TextOps.calculateLikelihood(tokens.length, t.termCount, b.termCount)
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("skew fixture: hot domain holds ~30% of rows") {
    val hot = (0L until 1000L).count(id => CorpusGen.domainId(id) == 0)
    assert(hot == 300)
  }
}
