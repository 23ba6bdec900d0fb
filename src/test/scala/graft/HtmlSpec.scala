package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{HtmlParser, Selectors, Boilerplate}

class HtmlSpec extends AnyFunSuite {

  val page = """<!DOCTYPE html>
<html><head><title>The Page Title</title>
<meta name="citation_doi" content="10.1234/xyz.42">
<style>body { color: red }</style>
<script>var x = "<p>not content</p>";</script>
</head>
<body>
<header><nav><ul>
  <li><a href="/">Home</a></li><li><a href="/about">About</a></li>
  <li><a href="/contact">Contact</a></li>
</ul></nav></header>
<div id="content">
  <h1 class="headline main">A Study of Things</h1>
  <div class="abstract"><p>Abstract</p><p>This work studies the things in depth and at length, with methods.</p></div>
  <main>
    <p>First paragraph of the main content, long enough to count as a real content block for the classifier.</p>
    <p>Second paragraph, also substantive and &amp; entity-laden &lt;ok&gt;, carrying more than enough characters.</p>
  </main>
  <ul class="references">
    <li class="ref"><a href="/paper/1">Smith, J. (2020). Prior work one.</a></li>
    <li class="ref"><a href="/paper/2">Doe, A. (2021). Prior work two.</a></li>
  </ul>
</div>
<footer><p><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a></p></footer>
</body></html>"""

  lazy val dom = HtmlParser.parse(page)

  test("fused single-pass extract equals the standalone field heuristics") {
    // extract() computes all fields in one traversal for speed; the find*
    // methods remain the reference implementations — pin the equivalence
    // over a diverse corpus slice so neither can drift
    (0L until 200L).filterNot(graft.corpus.CorpusGen.isPdfDoc).foreach { id =>
      val html = new String(graft.corpus.CorpusGen.genDoc(id)._1.html,
        java.nio.charset.StandardCharsets.UTF_8)
      val root = HtmlParser.parse(html)
      val ex = Boilerplate.extract(root)
      assert(ex.title == Boilerplate.findTitle(root), s"title drift doc $id")
      assert(ex.abstractText == Boilerplate.findAbstract(root), s"abstract drift doc $id")
      assert(ex.doi == Boilerplate.findDoi(root, ex.mainText), s"doi drift doc $id")
      assert(ex.citationSpans == Boilerplate.findCitations(root), s"citations drift doc $id")
    }
    val ex = Boilerplate.extract(dom)
    assert(ex.title == Boilerplate.findTitle(dom))
    assert(ex.citationSpans == Boilerplate.findCitations(dom))
  }

  test("full HTML4 named entity set decodes") {
    val d = HtmlParser.parse(
      "<body><p>caf&eacute; &Uuml;ber r&eacute;sum&eacute; &alpha;&beta; &euro;9 &frac12; &deg;C &Omega;</p></body>")
    val t = Selectors.cssFirst(d, "p").get.normalizedText
    assert(t == "café Über résumé αβ €9 ½ °C Ω", t)
  }

  test("long/zero-padded numeric charrefs decode; out-of-range becomes U+FFFD (round-5 review)") {
    val d = HtmlParser.parse(
      "<body><p>&#x0001F600; &#128512; &#x12345678; &#99999999999999; &#x; &nosuchentity;</p></body>")
    val t = Selectors.cssFirst(d, "p").get.normalizedText
    // zero-padded hex and plain decimal both hit U+1F600; digit strings
    // past 0x10FFFF (or past Long) are the HTML5 out-of-range error ->
    // U+FFFD; empty digits and unknown names stay literal text
    assert(t == "😀 😀 � � &#x; &nosuchentity;", t)
  }

  test("title is RCDATA: entities decode; script/style stay raw") {
    val d = HtmlParser.parse(
      "<html><head><title>Fish &amp; Chips &#8211; Review</title></head><body><p>x</p></body></html>")
    assert(Boilerplate.findTitle(d).contains("Fish & Chips – Review"))
    val s = HtmlParser.parse("<body><script>a &amp; b</script><p>t</p></body>")
    assert(Selectors.cssFirst(s, "script").get.text() == "a &amp; b")
  }

  test("rawtext close-tag must be a real closer (no prefix match)") {
    val d = HtmlParser.parse(
      """<body><script>var s="</scriptend>";</script><p>after</p></body>""")
    val ex = Boilerplate.extract(d)
    assert(!ex.mainText.contains("scriptend"))
    val t = HtmlParser.parse("<head><title>a</titleX>b</title></head><body><p>c</p></body>")
    assert(Boilerplate.findTitle(t).contains("a</titleX>b"))
  }

  test("self-closing syntax is ignored on HTML non-void elements, honored in foreign content") {
    // HTML5 tree construction (and the reference's selectolax/lexbor
    // engine): '/' on a non-void HTML start tag is IGNORED — '<title/>'
    // still enters RCDATA and owns the following text (round-6 review:
    // honoring it dropped XHTML-styled titles into body)
    val d = HtmlParser.parse(
      "<html><head><title/>Actual Title</title></head><body><p>x</p></body></html>")
    assert(Boilerplate.findTitle(d).contains("Actual Title"))
    // '<script/>' is RAWTEXT until a real closer — markup after it must
    // not leak into extracted text
    val s = HtmlParser.parse(
      """<body><script src="x.js"/>var leaked = "<b>no</b>";</script>""" +
        "<p>kept paragraph with plenty of words so the boilerplate " +
        "classifier scores this block as the page's main content</p></body>")
    val ex = Boilerplate.extract(s)
    assert(!ex.mainText.contains("leaked"))
    assert(ex.mainText.contains("kept"))
    // but in FOREIGN content (svg/math) self-closing is real: '<path/>'
    // closes, so the sibling text is NOT swallowed into the path element
    val f = HtmlParser.parse(
      "<body><svg><path d='M0 0'/></svg><p>after the svg a long enough " +
        "paragraph of real words that the classifier keeps as main text</p></body>")
    assert(Selectors.cssFirst(f, "path").get.text() == "")
    assert(Boilerplate.extract(f).mainText.contains("after the svg"))
    // HTML INTEGRATION POINTS: inside svg's foreignObject content is
    // HTML again, so '<p/>' there is ignored and owns the caption text
    val ip = HtmlParser.parse(
      "<body><svg><foreignObject><p/>caption text here</p></foreignObject></svg></body>")
    assert(Selectors.cssFirst(ip, "p").get.text() == "caption text here")
    // MathML TEXT integration points (mi/mo/mn/ms/mtext, round-6 ADVICE):
    // content under <math><mi> is HTML again, so '<b/>' does NOT
    // self-close and owns the following text — lexbor parity
    val mi = HtmlParser.parse(
      "<body><math><mi><b/>bold inside mi</b></mi></math></body>")
    assert(Selectors.cssFirst(mi, "b").get.text() == "bold inside mi")
    // ...while a non-integration-point MathML element stays foreign:
    // '<b/>' under <math><mrow> really closes and swallows nothing
    val mrow = HtmlParser.parse(
      "<body><math><mrow><b/>sibling text</mrow></math></body>")
    assert(Selectors.cssFirst(mrow, "b").get.text() == "")
  }

  test("pathologically deep nesting degrades gracefully, never kills the task") {
    val deep = "<body>" + "<div>" * 100000 + "content here that is long enough to score" +
      "</div>" * 100000 + "</body>"
    val page = graft.model.PageRecord("https://x.example/deep",
      new java.sql.Timestamp(0), deep.getBytes("UTF-8"), "", "en")
    val doc = graft.pipeline.Extractor.extract(page) // must not throw (Error included)
    assert(doc.url == "https://x.example/deep")
  }

  test("DOI meta matches Dublin Core capitalization variants") {
    val d = HtmlParser.parse(
      """<head><meta name="DC.Identifier" content="10.1234/abc.1"></head><body><p>x</p></body>""")
    assert(Boilerplate.extract(d).doi.contains("10.1234/abc.1"))
  }

  test("parser builds the tree and decodes entities") {
    val p2 = Selectors.css(dom, "main p").toList
    assert(p2.length == 2)
    assert(p2(1).normalizedText.contains("& entity-laden <ok>"))
  }

  test("script/style content is not treated as markup") {
    assert(Selectors.css(dom, "script p").isEmpty)
  }

  test("selector subset: tag, .class, #id, child, nth-child") {
    assert(Selectors.cssFirst(dom, "h1.headline").map(_.normalizedText) ==
      Some("A Study of Things"))
    assert(Selectors.cssFirst(dom, "#content > main > p").isDefined)
    assert(Selectors.cssFirst(dom, "ul.references > li:nth-child(2)")
      .map(_.normalizedText) == Some("Doe, A. (2021). Prior work two."))
    // reference-shaped selectors (webscrapers.py:408-417 uses deep descent)
    assert(Selectors.cssFirst(dom, "div#content main p").isDefined)
  }

  test("text(strip) concatenates stripped text nodes, selectolax-style") {
    val h1 = Selectors.cssFirst(dom, "h1").get
    assert(h1.text(strip = true) == "A Study of Things")
  }

  test("boilerplate classifier picks main over nav/footer/body") {
    val main = Boilerplate.mainContainer(dom)
    assert(main.isDefined)
    assert(main.get.tag == "main")
  }

  test("extraction fields: title, abstract, doi, citations") {
    val ex = Boilerplate.extract(dom)
    assert(ex.title == Some("A Study of Things"))
    assert(ex.abstractText ==
      Some("This work studies the things in depth and at length, with methods."))
    assert(ex.doi == Some("10.1234/xyz.42"))
    assert(ex.citationSpans == List(
      "Smith, J. (2020). Prior work one.",
      "Doe, A. (2021). Prior work two."))
    assert(ex.mainText ==
      "First paragraph of the main content, long enough to count as a real content block for the classifier.\n" +
      "Second paragraph, also substantive and & entity-laden <ok>, carrying more than enough characters.")
  }

  test("void and self-closing tags do not break nesting") {
    val d = HtmlParser.parse("<div><p>a<br>b</p><img src=x><p>c</p></div>")
    assert(Selectors.css(d, "div > p").length == 2)
  }

  test("unclosed and stray close tags are tolerated") {
    val d = HtmlParser.parse("<div><p>one<p>two</span></div>")
    assert(Selectors.css(d, "p").length == 2)
  }

  test("unclosed li/td/tr get implied end tags; no sibling text is lost") {
    val d = HtmlParser.parse("<ul><li>one<li>two<li>three</ul>")
    assert(Selectors.css(d, "ul > li").length == 3)
    assert(Boilerplate.blockTexts(Selectors.cssFirst(d, "ul").get) ==
      List("one", "two", "three"))
    val t = HtmlParser.parse(
      "<table><tr><td>a<td>b<tr><td>c</table>")
    assert(Selectors.css(t, "tr").length == 2)
    assert(Selectors.css(t, "td").length == 3)
    // the boundary holds: a li inside a NESTED list never closes the outer li
    val nested = HtmlParser.parse("<ul><li>outer<ul><li>inner</ul></li></ul>")
    assert(Selectors.css(nested, "ul > li > ul > li").length == 1)
  }

  test("close tags with attributes or trailing slash still close") {
    val d = HtmlParser.parse("""<div><p>a</p></div class="x"><p>b</p>""")
    // the decorated close ends the div, so the second p is its SIBLING
    assert(Selectors.css(d, "div > p").length == 1)
    assert(Selectors.css(d, "p").length == 2)
  }

  test("C1 numeric charrefs map through Windows-1252 (HTML5 table)") {
    val d = HtmlParser.parse("<p>it&#146;s &#147;quoted&#148; &#151; ok</p>")
    assert(Selectors.cssFirst(d, "p").get.normalizedText ==
      "it’s “quoted” — ok")
    // unmapped C1 points pass through; normal refs unaffected
    assert(HtmlParser.parse("<p>&#65;&#x42;</p>")
      .descendants.next().normalizedText == "AB")
  }

  test("mixed content: direct text around block children is emitted, in order") {
    val d = HtmlParser.parse(
      "<main>Intro sentence before the list.<p>para one</p>tail <b>note</b><p>para two</p></main>")
    val main = Selectors.cssFirst(d, "main").get
    assert(Boilerplate.blockTexts(main) ==
      List("Intro sentence before the list.", "para one", "tail note", "para two"))
  }

  test("inline script/style never leak into title or citation spans") {
    val page = """<html><body>
      <h1>Real Title <script>track("h1");</script></h1>
      <main><p>Body text long enough to be the main content of this page, clearly.</p></main>
      <div class="ref">Smith 2020 <script>clickRef(1);</script></div>
      </body></html>"""
    val ex = Boilerplate.extract(page)
    assert(ex.title.contains("Real Title"))
    assert(ex.citationSpans == List("Smith 2020"))
  }
}
