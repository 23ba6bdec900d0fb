package graft.html

import scala.collection.mutable
import graft.ids.Identifiers

/** Text-density boilerplate classification + structured-field DOM
  * heuristics — the "main-content extraction" core mandated by the north
  * rule (HTML boilerplate strip, DOM heuristics). New capability relative
  * to the reference, which only does targeted CSS-selector reads
  * (/root/reference/src/webscrapers.py:129-151); the density approach is
  * the standard public one (CETD/Arc90-style: chars-per-tag with link
  * density penalty).
  *
  * Deterministic contract: for a page whose main container holds clean
  * paragraph blocks and whose boilerplate (nav/header/footer/sidebar/ads)
  * is link-dense or short, `extract` returns the main container's block
  * texts, whitespace-normalized, joined with "\n" — byte-identical to the
  * corpus generator's golden.
  */
object Boilerplate {

  final case class Extraction(
      mainText: String,
      title: Option[String],
      abstractText: Option[String],
      doi: Option[String],
      citationSpans: List[String])

  private val BlockTags = Set(
    "p", "div", "article", "main", "section", "h1", "h2", "h3", "h4", "h5",
    "h6", "li", "ul", "ol", "blockquote", "pre", "td", "th", "table", "tr",
    "header", "footer", "nav", "aside", "body", "figcaption", "dd", "dt")

  private val DropTags = Set(
    "script", "style", "noscript", "template", "iframe", "svg", "form",
    "button", "select", "option")

  private val ContainerTags = Set(
    "main", "article", "section", "div", "body", "td", "blockquote")

  /** Per-element aggregate stats, computed in one bottom-up pass. */
  private final class Stats {
    var textChars: Int = 0
    var linkChars: Int = 0
    var leafScore: Double = 0.0 // signed content score of leaf blocks below
    var depth: Int = 0
  }

  def extract(html: String): Extraction = extract(HtmlParser.parse(html))

  def extract(root: HElem): Extraction = {
    val main = mainContainer(root)
    val mainText = main.map(blockTexts(_).mkString("\n")).getOrElse("")
    // ONE pre-order pass feeds every field heuristic below (title,
    // abstract, doi, citations) — semantics identical to the per-field
    // find* methods, which each re-traversed the tree. This is the hot
    // path of the whole engine: it runs per page of the corpus.
    var firstH1: HElem = null
    var firstTitleTag: HElem = null
    var firstAbstract: HElem = null
    var doiMetaSeen = false
    var doiMetaContent: Option[String] = None
    var firstDoiMarker: HElem = null
    val cites = mutable.ListBuffer.empty[HElem]
    val it = root.descendants
    while (it.hasNext) {
      val e = it.next()
      if (firstH1 == null && e.tag == "h1") firstH1 = e
      if (firstTitleTag == null && e.tag == "title") firstTitleTag = e
      val cls = e.attrs.getOrElse("class", "")
      val idv = e.attrs.getOrElse("id", "")
      val hasMarker = cls.length != 0 || idv.length != 0
      val markerSp = if (hasMarker) (cls + " " + idv).toLowerCase(java.util.Locale.ROOT) else " "
      if (firstAbstract == null && hasMarker && markerSp.contains("abstract") && BlockTags.contains(e.tag))
        firstAbstract = e
      if (!doiMetaSeen && e.tag == "meta" &&
          e.attr("name").exists(n => n.equalsIgnoreCase("citation_doi") || n.equalsIgnoreCase("dc.identifier"))) {
        doiMetaSeen = true
        doiMetaContent = e.attr("content")
      }
      // findDoi's marker is class+id WITHOUT a separator (kept verbatim)
      if (firstDoiMarker == null && hasMarker &&
          (cls + idv).toLowerCase(java.util.Locale.ROOT).contains("doi"))
        firstDoiMarker = e
      // substring pre-check ("ref" also covers "reference") before the
      // word-exact split — most elements carry no class/id at all
      if (e.tag == "cite" ||
          (hasMarker && (markerSp.contains("ref") || markerSp.contains("citation")) &&
            MarkerSplit.split(markerSp).exists(w => w == "ref" || w == "citation" || w == "reference")))
        cites += e
    }

    // contentText (not normalizedText) everywhere a structured field is
    // built from a subtree: an inline <script>/<style> inside an h1 or a
    // citation block must not leak code into the field — the same rule
    // mainText already follows via block emission
    val title = Option(firstH1).map(contentText).filter(_.nonEmpty)
      .orElse(Option(firstTitleTag).map(contentText).filter(_.nonEmpty))
    val abstractText = Option(firstAbstract).map { e =>
      val texts = blockTexts(e)
      val body = texts match {
        case h :: rest if h.equalsIgnoreCase("abstract") => rest
        case other => other
      }
      body.mkString("\n")
    }.filter(_.nonEmpty)
    val doi = doiMetaContent.flatMap(Identifiers.extract)
      .orElse(Option(firstDoiMarker).flatMap(e => Identifiers.extract(contentText(e))))
      .orElse(Identifiers.extract(mainText))
    val citations = leafMost(cites.toList)
      .map(contentText).filter(_.nonEmpty)

    Extraction(
      mainText = mainText,
      title = title,
      abstractText = abstractText,
      doi = doi,
      citationSpans = citations)
  }

  /** The density classifier: pick the container maximizing signed leaf
    * score (content leaves add len*(1-linkDensity); boilerplate leaves
    * subtract their length, so enclosing everything — e.g. body — loses
    * to the tight main block whenever real boilerplate exists).
    * Ties break toward the deeper (tighter) container.
    */
  def mainContainer(root: HElem): Option[HElem] = {
    // candidates are gathered during the single bottom-up pass (no
    // per-element stats map, no second traversal); preIdx preserves the
    // original pre-order maxBy tie behavior exactly: max (leafScore,
    // depth), first-in-pre-order among full ties
    var best: HElem = null
    var bestScore = 0.0
    var bestDepth = -1
    var bestPre = Int.MaxValue
    var preCounter = 0

    def compute(e: HElem, depth: Int, inLink: Boolean): Stats = {
      val preIdx = preCounter
      preCounter += 1
      val s = new Stats
      s.depth = depth
      if (DropTags.contains(e.tag)) return s
      e.children.foreach {
        case t: HText =>
          val len = normLen(t.data)
          s.textChars += len
          if (inLink) s.linkChars += len
        case c: HElem =>
          val cs = compute(c, depth + 1, inLink || c.tag == "a")
          s.textChars += cs.textChars
          s.linkChars += cs.linkChars
          s.leafScore += cs.leafScore
        case _ => ()
      }
      // leaf block: a block element none of whose element children are
      // themselves blocks — the unit the classifier scores
      val isLeafBlock = BlockTags.contains(e.tag) &&
        !e.elemChildren.exists(c => BlockTags.contains(c.tag)) &&
        s.textChars > 0
      if (isLeafBlock) {
        val linkDensity =
          if (s.textChars == 0) 0.0 else s.linkChars.toDouble / s.textChars
        s.leafScore +=
          (if (s.textChars >= 25 && linkDensity <= 0.30)
             s.textChars * (1.0 - linkDensity)
           else -s.textChars.toDouble)
      }
      if ((e ne root) && ContainerTags.contains(e.tag) && s.leafScore > 0) {
        val better = s.leafScore > bestScore ||
          (s.leafScore == bestScore &&
            (s.depth > bestDepth || (s.depth == bestDepth && preIdx < bestPre)))
        if (best == null || better) {
          best = e; bestScore = s.leafScore; bestDepth = s.depth; bestPre = preIdx
        }
      }
      s
    }
    compute(root, 0, inLink = false)
    Option(best)
  }

  /** Normalized text of an element SKIPPING DropTags subtrees — the leaf
    * emission form: a leaf block polluted by an inline script/style must
    * not leak code into the extracted text. Same whitespace collapse as
    * HElem.normalizedText. */
  private def contentText(e: HElem): String = {
    val sb = new java.lang.StringBuilder
    def walk(n: HNode): Unit = n match {
      case t: HText  => sb.append(t.data).append(' ')
      case el: HElem => if (!DropTags.contains(el.tag)) el.children.foreach(walk)
      case _         => ()
    }
    e.children.foreach(walk)
    HElem.collapseWs(sb)
  }

  /** Document-order normalized texts of the blocks inside a container
    * (the paragraphs of the main content). A block with no block children
    * emits whole; a block that ALSO has direct text or inline children
    * around its block children (mixed content — the norm on real pages)
    * emits each inline run as its own block in document order, so
    * interstitial prose is never silently dropped. */
  def blockTexts(container: HElem): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    def appendInline(el: HElem, sb: java.lang.StringBuilder): Unit =
      el.children.foreach {
        case t: HText  => sb.append(t.data).append(' ')
        case c: HElem  => if (!DropTags.contains(c.tag)) appendInline(c, sb)
        case _         => ()
      }
    def walk(e: HElem): Unit = {
      if (DropTags.contains(e.tag)) return
      val hasBlockChild = e.elemChildren.exists(c => BlockTags.contains(c.tag))
      if (!hasBlockChild) {
        val t = contentText(e)
        if (t.nonEmpty) out += t
      } else {
        val sb = new java.lang.StringBuilder
        def flushRun(): Unit = {
          val t = HElem.collapseWs(sb)
          if (t.nonEmpty) out += t
          sb.setLength(0)
        }
        e.children.foreach {
          case t: HText => sb.append(t.data).append(' ')
          case c: HElem if DropTags.contains(c.tag) => ()
          case c: HElem if BlockTags.contains(c.tag) ||
              c.elemChildren.exists(b => BlockTags.contains(b.tag)) =>
            flushRun(); walk(c)
          case c: HElem => appendInline(c, sb)
          case _ => ()
        }
        flushRun()
      }
    }
    walk(container)
    out.toList
  }

  private def normLen(s: String): Int = {
    // length of whitespace-collapsed text
    var count = 0
    var lastWs = true
    var i = 0
    while (i < s.length) {
      val ws = s.charAt(i).isWhitespace
      if (!ws) { count += 1; lastWs = false }
      else if (!lastWs) { count += 1; lastWs = true }
      i += 1
    }
    if (lastWs && count > 0) count - 1 else count
  }

  // --- structured-field heuristics ---------------------------------------

  def findTitle(root: HElem): Option[String] = {
    Selectors.cssFirst(root, "h1").map(contentText).filter(_.nonEmpty)
      .orElse(Selectors.cssFirst(root, "title").map(contentText).filter(_.nonEmpty))
  }

  def findAbstract(root: HElem): Option[String] = {
    root.descendants.find { e =>
      val marker = (e.attrs.getOrElse("class", "") + " " + e.attrs.getOrElse("id", ""))
        .toLowerCase(java.util.Locale.ROOT)
      marker.contains("abstract") && BlockTags.contains(e.tag)
    }.map { e =>
      val texts = blockTexts(e)
      // skip a leading "Abstract" heading block if present
      val body = texts match {
        case h :: rest if h.equalsIgnoreCase("abstract") => rest
        case other => other
      }
      body.mkString("\n")
    }.filter(_.nonEmpty)
  }

  def findDoi(root: HElem, mainText: String): Option[String] = {
    val meta = root.descendants.find(e =>
      e.tag == "meta" &&
        e.attr("name").exists(n => n.equalsIgnoreCase("citation_doi") || n.equalsIgnoreCase("dc.identifier")))
      .flatMap(_.attr("content"))
    meta.flatMap(c => Identifiers.extract(c))
      .orElse {
        root.descendants.find { e =>
          (e.attrs.getOrElse("class", "") + e.attrs.getOrElse("id", ""))
            .toLowerCase(java.util.Locale.ROOT).contains("doi")
        }.flatMap(e => Identifiers.extract(contentText(e)))
      }
      .orElse(Identifiers.extract(mainText))
  }

  private val MarkerSplit = java.util.regex.Pattern.compile("[\\s_-]")

  def findCitations(root: HElem): List[String] = {
    val viaClass = root.descendants.filter { e =>
      val marker = (e.attrs.getOrElse("class", "") + " " + e.attrs.getOrElse("id", ""))
        .toLowerCase(java.util.Locale.ROOT)
      e.tag == "cite" || MarkerSplit.split(marker).exists(w => w == "ref" || w == "citation" || w == "reference")
    }.toList
    // keep only leaf-most citation nodes (avoid container duplication)
    leafMost(viaClass).map(contentText).filter(_.nonEmpty)
  }

  /** Drop candidates that are ancestors of other candidates, in
    * O(candidates x depth): each candidate walks its parent chain ONCE
    * and marks any candidate-ancestor it meets. The previous all-pairs
    * isAncestor filter was O(c^2 x depth) — ~4M chain walks for one
    * citation-dense 2000-candidate references page, on the per-page hot
    * path. Identity sets on purpose: distinct DOM nodes can be
    * structurally equal. */
  private def leafMost(candidates: List[HElem]): List[HElem] = {
    val inSet = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[HElem, java.lang.Boolean]())
    candidates.foreach(inSet.add)
    val drop = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[HElem, java.lang.Boolean]())
    candidates.foreach { e =>
      var p = e.parent
      while (p != null) { if (inSet.contains(p)) { drop.add(p): Unit }; p = p.parent }
    }
    candidates.filterNot(drop.contains)
  }
}
