package graft.corpus

import graft.pdf.PdfWriter
import graft.model.PageRecord

/** Deterministic synthetic Common-Crawl-style page generator + golden
  * emitter (FIXTURES.md §1). Pure per-docId function — the same docId
  * always yields the same page and golden on any executor, so the corpus
  * can be generated distributed (spark.range -> map) with no data
  * movement and no external input.
  *
  * Page analog in the reference: the PDF corpus of `directory` mode
  * (/root/reference/src/serials.py:46-63) and the HTML bodies the
  * webscrapers parse (/root/reference/src/webscrapers.py:129).
  */
object CorpusGen {

  type Page = PageRecord

  final case class Golden(
      url: String,
      extracted_text: String,
      title: String,
      abstract_text: String,
      doi: String, // empty string = none
      citation_spans: Seq[String],
      // closed-form scoring facts for the abstract channel (`text` column)
      target_hits: Int,
      bycatch_hits: Int,
      total_words: Int)

  // Word pools. Target/bycatch mirror the reference's word-set files
  // (/root/reference/words/target_words.txt shape); neutral pool sized so
  // token frequencies vary.
  val TargetWords: Vector[String] = Vector(
    "prosocial", "design", "misinformation", "cooperation", "behavior",
    "intervention", "network", "incentive", "altruism", "reciprocity")
  val BycatchWords: Vector[String] = Vector(
    "psychology", "fmri", "neuron", "cortex", "primate",
    "pharmacology", "dosage", "genome", "protein", "enzyme")
  val NeutralWords: Vector[String] = Vector(
    "the", "of", "and", "to", "in", "study", "results", "method", "data",
    "analysis", "model", "effect", "sample", "group", "measure", "value",
    "table", "figure", "section", "finding", "approach", "evidence",
    "process", "system", "factor", "level", "change", "outcome", "test",
    "paper", "work", "field", "case", "time", "part", "form", "point",
    "state", "order", "number")

  val HotDomainShare = 3 // 3-in-10 docIds land on domain 0 (skew fixture)
  private val Epoch = 1735689600000L // 2025-01-01T00:00:00Z

  def domainId(docId: Long): Int =
    if (docId % 10 < HotDomainShare) 0 else (mix(docId) % 97).toInt + 1

  def url(docId: Long): String = s"https://d${domainId(docId)}.example.org/p/$docId"

  def isPdfDoc(docId: Long): Boolean = docId % 10 >= 7 // 30% PDF

  // splitmix64 finalizer, non-negative (single definition: graft.util.SplitMix)
  private def mix(x: Long): Long = graft.util.SplitMix.nonNeg(x)

  private final class Rng(seed: Long) {
    private var s = mix(seed)
    def nextLong(): Long = { s = mix(s + 0x632be59bd9b4e019L); s }
    def nextInt(bound: Int): Int = (nextLong() % bound).toInt
    def pick[T](xs: Vector[T]): T = xs(nextInt(xs.length))
  }

  /** Abstract channel with closed-form hit counts: the `text` column the
    * fastscore/wordscore modes consume (/root/reference/src/factories.py:38-52).
    * NOTE target/bycatch hits below are raw membership counts; the
    * reference's matching_terms is the sum over the top-3 terms only —
    * goldens carry raw counts, tests derive top-3 via TextOps.
    */
  private def genAbstract(rng: Rng): (String, Int, Int, Int) = {
    val n = 40 + rng.nextInt(80)
    val words = (0 until n).map { _ =>
      rng.nextInt(10) match {
        case 0 | 1 => rng.pick(TargetWords)
        case 2     => rng.pick(BycatchWords)
        case _     => rng.pick(NeutralWords)
      }
    }
    val text = words.mkString(" ")
    val t = words.count(TargetWords.contains(_))
    val b = words.count(BycatchWords.contains(_))
    (text, t, b, words.length)
  }

  private def sentence(rng: Rng, len: Int): String = {
    val ws = (0 until len).map(_ => rng.pick(NeutralWords)) ++
      (if (rng.nextInt(3) == 0) Seq(rng.pick(TargetWords)) else Nil)
    ws.mkString(" ") + "."
  }

  private def paragraph(rng: Rng): String =
    (0 until 2 + rng.nextInt(3)).map(_ => sentence(rng, 8 + rng.nextInt(12))).mkString(" ")

  /** (plain, html) paragraph pair: the html variant may wrap words in
    * inline tags and encode an ampersand word as an entity — the golden
    * stays the PLAIN text, so byte-identity covers the extractor's
    * inline-flattening and entity-decoding paths. */
  private def decoratedParagraph(rng: Rng): (String, String) = {
    val plain0 = paragraph(rng)
    val words = plain0.split(" ")
    val deco = rng.nextInt(4)
    if (deco == 0 && words.length > 3) {
      val i = 1 + rng.nextInt(words.length - 2)
      val tag = if (rng.nextInt(2) == 0) "em" else "strong"
      val html = (words.take(i) :+ s"<$tag>${words(i)}</$tag>") ++ words.drop(i + 1)
      (plain0, html.mkString(" "))
    } else if (deco == 1 && words.length > 4) {
      val i = 1 + rng.nextInt(words.length - 3)
      val plainWords = (words.take(i) :+ "&") ++ words.drop(i)
      val htmlWords = (words.take(i) :+ "&amp;") ++ words.drop(i)
      (plainWords.mkString(" "), htmlWords.mkString(" "))
    } else (plain0, plain0)
  }

  private def titleFor(docId: Long, rng: Rng): String =
    s"Study $docId of ${rng.pick(TargetWords)} and ${rng.pick(NeutralWords)}"

  def doiFor(docId: Long): Option[String] =
    if (docId % 3 == 0) Some(s"10.5555/g$docId") else None

  def langFor(docId: Long): String = if (docId % 37 == 0) "xx" else "en"

  /** Generate one page + its golden. Deterministic in docId. */
  def genDoc(docId: Long): (Page, Golden) = {
    val (page, golden) = gen(docId, wantPage = true)
    (page.get, golden)
  }

  /** Golden only, WITHOUT building the page bytes: skips PdfWriter.build
    * (the deflate step) and renderHtml. The invariant that keeps this
    * byte-identical to genDoc's golden is ORDERING, not non-consumption:
    * renderHtml DOES draw from the rng (nav/side link picks), but every
    * golden field is drawn BEFORE the skipped steps, so the golden's
    * slice of the stream is unchanged. Do not reorder page construction
    * before golden construction, and do not reuse the rng after the
    * skipped branch expecting an aligned stream (CorpusExtractionSpec's
    * genGolden==genDoc gate pins the first hazard; nothing can pin the
    * second). */
  def genGolden(docId: Long): Golden = gen(docId, wantPage = false)._2

  private def gen(docId: Long, wantPage: Boolean,
      bodyMult: Int = 1): (Option[Page], Golden) = {
    val rng = new Rng(docId)
    val (abstractText, tHits, bHits, totalW) = genAbstract(rng)
    val title = titleFor(docId, rng)
    val doi = doiFor(docId)
    val basePairs = (0 until 2 + rng.nextInt(4)).map(_ => decoratedParagraph(rng))
    // bodyMult > 1 tiles the article body WITHOUT extra rng draws, so
    // the golden/page stream alignment is untouched and the tiled golden
    // stays byte-consistent with the tiled page (heavy-tail bench docs)
    val paragraphPairs =
      if (bodyMult <= 1) basePairs else Seq.fill(bodyMult)(basePairs).flatten
    val paragraphs = paragraphPairs.map(_._1)
    val u = url(docId)
    val ts = new java.sql.Timestamp(Epoch + docId * 1000L)

    if (isPdfDoc(docId)) {
      // PDF page: title line, optional doi line, wrapped body lines
      val statLine = s"effect size (d = 0.${rng.nextInt(99)}) observed (n = ${10 + rng.nextInt(90)})"
      val bodyLines = (Seq(title) ++
        doi.map(d => s"doi: $d").toSeq ++
        paragraphs.flatMap(wrap(_, 80)) :+ statLine)
      val pdfPages = bodyLines.grouped(PdfWriter.MaxLinesPerPage)
        .map(ls => PdfWriter.PageSpec(ls.toSeq)).toSeq
      val golden = Golden(
        url = u,
        extracted_text = PdfWriter.expectedText(pdfPages),
        title = title,
        abstract_text = abstractText,
        doi = doi.getOrElse(""),
        citation_spans = Nil,
        target_hits = tHits, bycatch_hits = bHits, total_words = totalW)
      val page = if (!wantPage) None else {
        val info = Map("Title" -> title) ++
          (if (docId % 6 == 0) doi.map("doi" -> _) else None)
        val bytes = PdfWriter.build(pdfPages, info, compress = docId % 2 == 0)
        Some(PageRecord(u, ts, bytes, abstractText, langFor(docId)))
      }
      (page, golden)
    } else {
      val citations = (0 until rng.nextInt(4)).map(i =>
        s"Author ${('A' + rng.nextInt(26)).toChar}. (${2000 + rng.nextInt(25)}). Cited work $i.")
      val golden = Golden(
        url = u,
        // main container holds the abstract block (heading + body) then the
        // article paragraphs; blockTexts emits them in document order
        extracted_text = ("Abstract" +: abstractText +: paragraphs).mkString("\n"),
        title = title,
        abstract_text = abstractText,
        doi = doi.getOrElse(""),
        citation_spans = citations,
        target_hits = tHits, bycatch_hits = bHits, total_words = totalW)
      val page = if (!wantPage) None else {
        val htmlStr = renderHtml(docId, title, abstractText, doi,
          paragraphPairs.map(_._2), citations, rng)
        Some(PageRecord(u, ts,
          htmlStr.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          abstractText, langFor(docId)))
      }
      (page, golden)
    }
  }

  /** Bench-only heavy-tail doc: genDoc's EXACT page construction (same
    * rng stream, same layouts, the doc's natural HTML-or-PDF kind) with
    * the article body tiled `mult` times, so page SIZE follows a power
    * tail while the per-byte parse work stays representative. Shares
    * gen() rather than copying it — the heavy corpus can never drift
    * from the real one. These pages feed the byte-skew throughput legs
    * (Bench's heavy_tail evidence); the extractor must still return
    * ok=true on them. Deterministic in (docId, mult). */
  def genHeavyPage(docId: Long, mult: Int): PageRecord =
    genHeavyDoc(docId, mult)._1

  /** Heavy doc WITH its golden: because bodyMult tiles the (plain, html)
    * paragraph pairs together, the tiled golden stays byte-consistent
    * with the tiled page — so the byte-identical extraction gate extends
    * to the size tail (CorpusExtractionSpec pins it at mult=50). */
  def genHeavyDoc(docId: Long, mult: Int): (Page, Golden) = {
    val (page, golden) = gen(docId, wantPage = true, bodyMult = math.max(1, mult))
    (page.get, golden)
  }

  /** Deterministic PNG page for the multimodal decode path (q20 + the
    * from-scratch decoder, round-6 verdict #5). i%5 walks the five
    * baseline profiles — gray, RGB, palette, gray+alpha, RGBA — and the
    * encoder cycles the scanline filter per row, so the corpus exercises
    * every unfilter path and the palette expansion. Every 17th page is
    * TRUNCATED mid-stream: it still sniffs as png (magic intact) but
    * decode must fail cleanly into the histogram-only row (the
    * never-throw contract q20's oracle checks end to end). */
  def genPngPage(i: Long): PageRecord = {
    def m(k: Long): Long = graft.util.SplitMix.nonNeg(i * 7919 + k)
    val w = 8 + (m(1) % 33).toInt // 8..40
    val h = 8 + (m(2) % 25).toInt // 8..32
    val png: Array[Byte] = (i % 5).toInt match {
      case 2 => // palette
        val nPal = 4 + (m(3) % 13).toInt // 4..16 entries
        val pal = Array.tabulate(nPal * 3)(j => (m(10 + j) % 256).toByte)
        val idx = Array.tabulate(w * h)(j => (m(1000 + j) % nPal).toByte)
        graft.multimodal.Png.encodePalette(w, h, pal, idx)
      case k =>
        val ch = k match { case 0 => 1; case 1 => 3; case 3 => 2; case _ => 4 }
        val px = Array.tabulate(w * h * ch)(j => (m(1000 + j) % 256).toByte)
        graft.multimodal.Png.encode(w, h, ch, px)
    }
    val bytes =
      if (i % 17 == 0) java.util.Arrays.copyOf(png, math.min(png.length, 41))
      else png
    val dom = (m(4) % 97) + 1
    PageRecord(s"https://d$dom.example/img/$i.png",
      new java.sql.Timestamp(86400000L * (i % 365)), bytes, "", "xx")
  }

  /** Sci-hub-style download-button page (reference
    * /root/reference/src/downloaders.py:215-230: `css_first("#buttons
    * button:nth-child(1)").attributes["onclick"]`): the first button in
    * #buttons carries the `location.href='...` payload — protocol-
    * relative (//host/path) for even ids, root-relative (/path) for odd
    * ids, and a NON-matching onclick for id % 7 == 3 (the reference
    * returns None there). Payloads follow the reference goldens' shape
    * (tests/test_downloaders.py:90-110): no trailing quote. A decoy
    * button before #buttons and a second button inside it pin the
    * selector descent, not just "first button anywhere". */
  def buttonPage(id: Long): String = {
    val onclick =
      if (id % 7 == 3) s"window.open('/not/a/match/$id')"
      // 3+ leading slashes: the reference's sep=='//' test is EXACT, so
      // '///host' takes the base-url branch, not the https:// one — a
      // payload shape the fixture must cover or the distinction stays
      // latent in q36's oracle (round-4 ADVICE)
      else if (id % 11 == 5) s"location.href='///cdn.example.org/pdf/$id/paper$id.pdf?download=true"
      else if (id % 2 == 0) s"location.href='//dl.example.org/pdf/$id/paper$id.pdf?download=true"
      else s"location.href='/downloads/2022-11-06/$id/paper$id.pdf?download=true"
    s"""<html><body>
<div id="menu"><button onclick="location.href='/wrong/$id">menu</button></div>
<div id="buttons">
<button onclick="$onclick">save</button>
<button onclick="location.href='/alt/$id.pdf">alt mirror</button>
</div>
</body></html>"""
  }

  private def wrap(text: String, width: Int): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    text.split(" ").foreach { w =>
      if (cur.nonEmpty && cur.length + 1 + w.length > width) {
        out += cur.toString; cur.clear()
      }
      if (cur.nonEmpty) cur.append(' ')
      cur.append(w)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** Page layouts vary by docId so the classifier can't overfit one shape:
    * main content sits in <main>, <article>, a plain dense <div>, or a
    * layout-table <td> polluted with a comment and an inline script;
    * boilerplate (nav/sidebar/footer/ads) is link-dense or short. */
  private def renderHtml(
      docId: Long,
      title: String,
      abstractText: String,
      doi: Option[String],
      paragraphs: Seq[String],
      citations: Seq[String],
      rng: Rng): String = {
    val navLinks = (0 until 6).map(i =>
      s"""<li><a href="/nav/$i">${rng.pick(NeutralWords)} ${rng.pick(NeutralWords)}</a></li>""").mkString
    // 12 link-dense sidebar blocks guarantee the enclosing #page div scores
    // strictly below the main container (its extra leaves net negative)
    val sideLinks = (0 until 12).map(i =>
      s"""<p><a href="/rel/$i">Related article about ${rng.pick(NeutralWords)} and ${rng.pick(TargetWords)}</a></p>""").mkString("\n")
    val refs = citations.zipWithIndex.map { case (c, i) =>
      s"""<li class="ref"><a href="/cited/$i">$c</a></li>"""
    }.mkString("\n")
    val body = paragraphs.map(p => s"<p>$p</p>").mkString("\n")
    val (openMain, closeMain) = (docId % 4) match {
      case 0 => ("""<main>""", "</main>")
      case 1 => ("""<article class="post-body">""", "</article>")
      case 2 => ("""<div class="entry content-area">""", "</div>")
      case _ =>
        // legacy table layout: content lives in a <td> next to a
        // link-dense menu cell; a comment and an inline script inside the
        // content cell must not leak into the extracted text
        ("""<table class="layout"><tr><td class="menu-cell"><p><a href="/m/1">menu one</a></p><p><a href="/m/2">menu two</a></p></td>
<td class="entry-cell"><!-- layout: legacy --><script>render("cell", "<p>");</script>""",
         "</td></tr></table>")
    }
    val doiMeta = doi.map(d => s"""<meta name="citation_doi" content="$d">""").getOrElse("")
    val doiSpan = doi.map(d => s"""<p class="doi-line">DOI: <span class="doi">$d</span></p>""").getOrElse("")
    s"""<!DOCTYPE html>
<html lang="en"><head>
<title>$title | d${domainId(docId)} journal</title>
$doiMeta
<meta charset="utf-8">
<style>.sidebar { float: right } nav li { display: inline }</style>
<script>window.tracker = { page: "$docId" }; if (1 < 2) { track("<p>"); }</script>
</head>
<body>
<header><nav><ul>$navLinks</ul></nav></header>
<div id="page">
  <h1 class="article-title">$title</h1>
  $doiSpan
  $openMain
  <div class="abstract"><p>Abstract</p><p>$abstractText</p></div>
$body
  $closeMain
  <aside class="sidebar">
$sideLinks
  </aside>
  <ul class="references">
$refs
  </ul>
</div>
<footer><p><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a> | <a href="/imprint">Imprint</a></p>
<p><a href="/c">Contact</a> <a href="/a">About</a> <a href="/h">Help</a></p></footer>
</body></html>"""
  }
}
