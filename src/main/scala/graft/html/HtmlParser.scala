package graft.html

import scala.collection.mutable

/** From-scratch HTML tokenizer + tree builder.
  *
  * A pragmatic HTML5-ish parser (not a full spec implementation): handles
  * tags, attributes in all four quoting forms, void elements, rawtext
  * elements (script/style), comments, doctype, entities, and unbalanced
  * close tags. Designed for one-instance-per-partition reuse inside
  * `mapPartitions` (the Spark analog of the reference's module-global
  * parser/session reuse, /root/reference/src/webscrapers.py:24).
  */
object HtmlParser {

  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  private val RawTextTags = Set("script", "style", "textarea", "title")

  /** HTML integration points (HTML5 tree construction): elements inside
    * svg/math whose CONTENT is parsed as HTML again, so the foreign
    * self-closing rule stops applying beneath them. (svg's `title` is
    * one too, but it is RCDATA here and never reaches the open stack.)
    * mi/mo/mn/ms/mtext are the MathML TEXT integration points — without
    * them `<math><mi><b/>x` honored the self-closing flag where lexbor
    * parses the content as HTML (round-6 ADVICE). annotation-xml is
    * treated as an integration point unconditionally; HTML5 gates it on
    * encoding=text/html|application/xhtml+xml — accepted approximation
    * (the non-HTML-encoding case embeds non-HTML content this extractor
    * would discard either way). */
  private val IntegrationPoints = Set("foreignobject", "desc", "annotation-xml",
    "mi", "mo", "mn", "ms", "mtext")

  /** Tags whose open implicitly closes an open <p>. */
  private val PClosers = Set(
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
    "main", "nav", "ol", "p", "pre", "section", "table", "ul")

  /** Implied end tags beyond <p> (HTML5 tree construction): opening tag ->
    * (open siblings it closes, scope boundaries that stop the search).
    * Unclosed <li>/<td>/<tr>/<dt>/<dd> are ubiquitous in real-world HTML;
    * without this they nest into each other and blockTexts would drop
    * every sibling's text except the last. */
  private val ImpliedClosers: Map[String, (Set[String], Set[String])] = Map(
    "li" -> ((Set("li"), Set("ul", "ol"))),
    "dt" -> ((Set("dt", "dd"), Set("dl"))),
    "dd" -> ((Set("dt", "dd"), Set("dl"))),
    "td" -> ((Set("td", "th"), Set("tr", "table"))),
    "th" -> ((Set("td", "th"), Set("tr", "table"))),
    "tr" -> ((Set("tr"), Set("table"))))

  /** Case-insensitive close-tag search (needle starts with '<', so the
    * scan only regionMatches at '<' positions) — avoids materializing a
    * lowercase copy of every page just for rawtext handling. A match must
    * be followed by '>', '/', whitespace, or end-of-input so `</script`
    * does not terminate at `</scripted>`. */
  private def indexOfCloser(hay: String, needle: String, from: Int): Int = {
    val last = hay.length - needle.length
    var i = if (from < 0) 0 else from
    while (i <= last) {
      if (hay.charAt(i) == '<' && hay.regionMatches(true, i, needle, 0, needle.length)) {
        val after = i + needle.length
        if (after >= hay.length || hay.charAt(after) == '>' ||
            hay.charAt(after) == '/' || hay.charAt(after).isWhitespace)
          return i
      }
      i += 1
    }
    -1
  }

  def parse(html: String): HElem = {
    val root = HElem("#root")
    val stack = mutable.Stack[HElem](root)
    // count of OPEN svg/math elements, maintained on push/pop: almost no
    // page is foreign content, so the foreign test below is O(1) in the
    // common case and the integration-point stack scan runs only inside
    // real svg/math subtrees (round-6 review: a per-start-tag stack walk
    // was pure overhead on the extraction hot path)
    var svgMathOpen = 0
    def popS(): Unit = {
      val e = stack.pop()
      if (e.tag == "svg" || e.tag == "math") svgMathOpen -= 1
    }
    def pushS(e: HElem): Unit = {
      if (e.tag == "svg" || e.tag == "math") svgMathOpen += 1
      stack.push(e)
    }
    var i = 0
    val n = html.length
    val text = new StringBuilder

    def flushText(): Unit = {
      if (text.nonEmpty) {
        stack.top.append(new HText(Entities.decode(text.toString)))
        text.clear()
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            val stop = if (end < 0) n else end
            stack.top.append(new HComment(html.substring(i + 4, stop)))
            i = if (end < 0) n else end + 3
          } else { // doctype / CDATA-ish: skip to '>'
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '/') {
          flushText()
          val end = html.indexOf('>', i)
          val stop = if (end < 0) n else end
          // per HTML5, end-tag attributes and a trailing slash are parsed
          // and DISCARDED ('</div class="x">' still closes the div) — the
          // name is everything up to the first whitespace or '/'
          val tag = html.substring(i + 2, stop).trim
            .takeWhile(ch => !ch.isWhitespace && ch != '/')
            .toLowerCase(java.util.Locale.ROOT)
          // pop to the matching open tag if present; ignore stray closers
          if (stack.exists(e => e.tag == tag)) {
            while (stack.top.tag != tag) popS()
            if (stack.size > 1) popS()
          }
          i = if (end < 0) n else end + 1
        } else if (c1.isLetter) {
          flushText()
          val (elem, selfClosed, after) = parseTag(html, i)
          i = after
          val tag = elem.tag
          if (PClosers.contains(tag)) {
            // implicit </p>
            if (stack.exists(_.tag == "p")) {
              while (stack.top.tag != "p") popS()
              if (stack.size > 1) popS()
            }
          }
          ImpliedClosers.get(tag).foreach { case (closees, bounds) =>
            // close an open same-family sibling, but never across the
            // enclosing list/table boundary (stack index 0 = top)
            val idx = stack.indexWhere(e =>
              closees.contains(e.tag) || bounds.contains(e.tag))
            if (idx >= 0 && closees.contains(stack(idx).tag)) {
              var popped = 0
              while (popped <= idx && stack.size > 1) { popS(); popped += 1 }
            }
          }
          stack.top.append(elem)
          // HTML5 tree construction IGNORES the self-closing flag on
          // non-void HTML elements ('<title/>Actual</title>' is a title
          // with text, not an empty one) — it is honored only in FOREIGN
          // content (svg/math, where '<path/>' really is closed). The
          // reference's selectolax/lexbor engine is HTML5-compliant, so
          // honoring '/' on '<title/>' or '<script/>' diverged from it:
          // title text fell into body and script-adjacent markup leaked
          // into extracted text (round-6 review). Foreign = nearest
          // svg/math ancestor WITHOUT an intervening HTML integration
          // point (foreignObject, svg desc/title, math annotation-xml) —
          // inside an integration point content is HTML again.
          val foreign = tag == "svg" || tag == "math" || (svgMathOpen > 0 && {
            val idx = stack.indexWhere(e => e.tag == "svg" || e.tag == "math" ||
              IntegrationPoints.contains(e.tag))
            idx >= 0 && !IntegrationPoints.contains(stack(idx).tag)
          })
          if (!(selfClosed && foreign) && !VoidTags.contains(tag)) {
            if (RawTextTags.contains(tag)) {
              // raw text until the matching close tag. script/style are
              // RAWTEXT (no entity decoding); title/textarea are RCDATA —
              // character references DO decode there per HTML5, and the
              // title field heuristic reads this text
              val closer = "</" + tag
              val idx = indexOfCloser(html, closer, i)
              val stop = if (idx < 0) n else idx
              if (stop > i) {
                val raw = html.substring(i, stop)
                val textVal =
                  if (tag == "script" || tag == "style") raw
                  else Entities.decode(raw)
                elem.append(new HText(textVal))
              }
              i = if (idx < 0) n else {
                val gt = html.indexOf('>', idx)
                if (gt < 0) n else gt + 1
              }
            } else if (stack.size < 2048) {
              pushS(elem)
            }
            // depth cap: beyond 2048 open elements (never reached by real
            // pages) children attach to the current top instead of
            // nesting deeper, so downstream recursive walks stay bounded
          }
        } else {
          text.append(c); i += 1
        }
      } else {
        text.append(c); i += 1
      }
    }
    flushText()
    root
  }

  /** Parse one open tag starting at `<`; returns (element, selfClosed,
    * index after '>'). */
  private def parseTag(html: String, start: Int): (HElem, Boolean, Int) = {
    var i = start + 1
    val n = html.length
    val tagStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val tag = html.substring(tagStart, i).toLowerCase(java.util.Locale.ROOT)
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var selfClosed = false
    var done = false
    while (i < n && !done) {
      html.charAt(i) match {
        case '>' => done = true; i += 1
        case '/' if i + 1 < n && html.charAt(i + 1) == '>' =>
          selfClosed = true; done = true; i += 2
        case w if w.isWhitespace => i += 1
        case _ =>
          // attribute name
          val nameStart = i
          while (i < n && !html.charAt(i).isWhitespace &&
                 html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val name = html.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i); i += 1
              val vStart = i
              while (i < n && html.charAt(i) != q) i += 1
              attrs.update(name, Entities.decode(html.substring(vStart, i)))
              if (i < n) i += 1
            } else {
              val vStart = i
              while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
              attrs.update(name, Entities.decode(html.substring(vStart, i)))
            }
          } else if (name.nonEmpty) {
            attrs.update(name, "")
          } else {
            i += 1 // defensive: avoid infinite loop on malformed input
          }
      }
    }
    (HElem(tag, attrs.toMap), selfClosed, i)
  }
}

/** HTML entity decoding: the full HTML4 named set (case-sensitive names
  * per spec) + numeric refs. */
object Entities {
  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "copy" -> "©", "reg" -> "®",
    "ldquo" -> "“", "rdquo" -> "”", "lsquo" -> "‘",
    "rsquo" -> "’", "times" -> "×", "middot" -> "·",
    "AElig" -> "Æ",
    "Aacute" -> "Á",
    "Acirc" -> "Â",
    "Agrave" -> "À",
    "Alpha" -> "Α",
    "Aring" -> "Å",
    "Atilde" -> "Ã",
    "Auml" -> "Ä",
    "Beta" -> "Β",
    "Ccedil" -> "Ç",
    "Chi" -> "Χ",
    "Dagger" -> "‡",
    "Delta" -> "Δ",
    "ETH" -> "Ð",
    "Eacute" -> "É",
    "Ecirc" -> "Ê",
    "Egrave" -> "È",
    "Epsilon" -> "Ε",
    "Eta" -> "Η",
    "Euml" -> "Ë",
    "Gamma" -> "Γ",
    "Iacute" -> "Í",
    "Icirc" -> "Î",
    "Igrave" -> "Ì",
    "Iota" -> "Ι",
    "Iuml" -> "Ï",
    "Kappa" -> "Κ",
    "Lambda" -> "Λ",
    "Mu" -> "Μ",
    "Ntilde" -> "Ñ",
    "Nu" -> "Ν",
    "OElig" -> "Œ",
    "Oacute" -> "Ó",
    "Ocirc" -> "Ô",
    "Ograve" -> "Ò",
    "Omega" -> "Ω",
    "Omicron" -> "Ο",
    "Oslash" -> "Ø",
    "Otilde" -> "Õ",
    "Ouml" -> "Ö",
    "Phi" -> "Φ",
    "Pi" -> "Π",
    "Prime" -> "″",
    "Psi" -> "Ψ",
    "Rho" -> "Ρ",
    "Scaron" -> "Š",
    "Sigma" -> "Σ",
    "THORN" -> "Þ",
    "Tau" -> "Τ",
    "Theta" -> "Θ",
    "Uacute" -> "Ú",
    "Ucirc" -> "Û",
    "Ugrave" -> "Ù",
    "Upsilon" -> "Υ",
    "Uuml" -> "Ü",
    "Xi" -> "Ξ",
    "Yacute" -> "Ý",
    "Yuml" -> "Ÿ",
    "Zeta" -> "Ζ",
    "aacute" -> "á",
    "acirc" -> "â",
    "acute" -> "´",
    "aelig" -> "æ",
    "agrave" -> "à",
    "alefsym" -> "ℵ",
    "alpha" -> "α",
    "and" -> "∧",
    "ang" -> "∠",
    "aring" -> "å",
    "asymp" -> "≈",
    "atilde" -> "ã",
    "auml" -> "ä",
    "bdquo" -> "„",
    "beta" -> "β",
    "brvbar" -> "¦",
    "bull" -> "•",
    "cap" -> "∩",
    "ccedil" -> "ç",
    "cedil" -> "¸",
    "cent" -> "¢",
    "chi" -> "χ",
    "circ" -> "ˆ",
    "clubs" -> "♣",
    "cong" -> "≅",
    "crarr" -> "↵",
    "cup" -> "∪",
    "curren" -> "¤",
    "dArr" -> "⇓",
    "dagger" -> "†",
    "darr" -> "↓",
    "deg" -> "°",
    "delta" -> "δ",
    "diams" -> "♦",
    "divide" -> "÷",
    "eacute" -> "é",
    "ecirc" -> "ê",
    "egrave" -> "è",
    "empty" -> "∅",
    "emsp" -> " ",
    "ensp" -> " ",
    "epsilon" -> "ε",
    "equiv" -> "≡",
    "eta" -> "η",
    "eth" -> "ð",
    "euml" -> "ë",
    "euro" -> "€",
    "exist" -> "∃",
    "fnof" -> "ƒ",
    "forall" -> "∀",
    "frac12" -> "½",
    "frac14" -> "¼",
    "frac34" -> "¾",
    "frasl" -> "⁄",
    "gamma" -> "γ",
    "ge" -> "≥",
    "hArr" -> "⇔",
    "harr" -> "↔",
    "hearts" -> "♥",
    "iacute" -> "í",
    "icirc" -> "î",
    "iexcl" -> "¡",
    "igrave" -> "ì",
    "image" -> "ℑ",
    "infin" -> "∞",
    "int" -> "∫",
    "iota" -> "ι",
    "iquest" -> "¿",
    "isin" -> "∈",
    "iuml" -> "ï",
    "kappa" -> "κ",
    "lArr" -> "⇐",
    "lambda" -> "λ",
    "lang" -> "〈",
    "laquo" -> "«",
    "larr" -> "←",
    "lceil" -> "⌈",
    "le" -> "≤",
    "lfloor" -> "⌊",
    "lowast" -> "∗",
    "loz" -> "◊",
    "lrm" -> "‎",
    "lsaquo" -> "‹",
    "macr" -> "¯",
    "micro" -> "µ",
    "minus" -> "−",
    "mu" -> "μ",
    "nabla" -> "∇",
    "ne" -> "≠",
    "ni" -> "∋",
    "not" -> "¬",
    "notin" -> "∉",
    "nsub" -> "⊄",
    "ntilde" -> "ñ",
    "nu" -> "ν",
    "oacute" -> "ó",
    "ocirc" -> "ô",
    "oelig" -> "œ",
    "ograve" -> "ò",
    "oline" -> "‾",
    "omega" -> "ω",
    "omicron" -> "ο",
    "oplus" -> "⊕",
    "or" -> "∨",
    "ordf" -> "ª",
    "ordm" -> "º",
    "oslash" -> "ø",
    "otilde" -> "õ",
    "otimes" -> "⊗",
    "ouml" -> "ö",
    "para" -> "¶",
    "part" -> "∂",
    "permil" -> "‰",
    "perp" -> "⊥",
    "phi" -> "φ",
    "pi" -> "π",
    "piv" -> "ϖ",
    "plusmn" -> "±",
    "pound" -> "£",
    "prime" -> "′",
    "prod" -> "∏",
    "prop" -> "∝",
    "psi" -> "ψ",
    "rArr" -> "⇒",
    "radic" -> "√",
    "rang" -> "〉",
    "raquo" -> "»",
    "rarr" -> "→",
    "rceil" -> "⌉",
    "real" -> "ℜ",
    "rfloor" -> "⌋",
    "rho" -> "ρ",
    "rlm" -> "‏",
    "rsaquo" -> "›",
    "sbquo" -> "‚",
    "scaron" -> "š",
    "sdot" -> "⋅",
    "sect" -> "§",
    "shy" -> "­",
    "sigma" -> "σ",
    "sigmaf" -> "ς",
    "sim" -> "∼",
    "spades" -> "♠",
    "sub" -> "⊂",
    "sube" -> "⊆",
    "sum" -> "∑",
    "sup" -> "⊃",
    "sup1" -> "¹",
    "sup2" -> "²",
    "sup3" -> "³",
    "supe" -> "⊇",
    "szlig" -> "ß",
    "tau" -> "τ",
    "there4" -> "∴",
    "theta" -> "θ",
    "thetasym" -> "ϑ",
    "thinsp" -> " ",
    "thorn" -> "þ",
    "tilde" -> "˜",
    "trade" -> "™",
    "uArr" -> "⇑",
    "uacute" -> "ú",
    "uarr" -> "↑",
    "ucirc" -> "û",
    "ugrave" -> "ù",
    "uml" -> "¨",
    "upsih" -> "ϒ",
    "upsilon" -> "υ",
    "uuml" -> "ü",
    "weierp" -> "℘",
    "xi" -> "ξ",
    "yacute" -> "ý",
    "yen" -> "¥",
    "yuml" -> "ÿ",
    "zeta" -> "ζ",
    "zwj" -> "‍",
    "zwnj" -> "‌")

  /** HTML5 numeric-character-reference table: code points 0x80-0x9F map
    * through Windows-1252 (the spec's compatibility table) instead of
    * emitting C1 control characters — '&#146;'-style Word-exported smart
    * quotes are ubiquitous on legacy pages and would otherwise land as
    * invisible junk bytes in extracted text. Unmapped C1 points (0x81,
    * 0x8D, 0x8F, 0x90, 0x9D) pass through per the same table. */
  private val C1Map: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  private def numericRef(cp: Int): Array[Char] =
    C1Map.get(cp) match {
      case Some(ch) => Array(ch)
      // HTML5 numeric-charref error cases -> U+FFFD: NUL, surrogate code
      // points and out-of-range values. Character.toChars(0xD800) would
      // emit a LONE UTF-16 surrogate — malformed UTF-16 that downstream
      // encoders (parquet write, UTF-8 hashing) each mangle their own
      // way, making fingerprints/dedup keys for the same logical text
      // writer-dependent.
      case None if cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF) || cp > 0x10FFFF =>
        Array('�')
      case None => Character.toChars(cp)
    }

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    // numeric refs have NO spec length bound (zero-padded forms like
    // &#x0001F600; are legal and real) — the 10-char window only caps the
    // NAMED lookup; digit strings past Int/0x10FFFF are the HTML5
    // out-of-range error (U+FFFD), not a literal passthrough
    def parseCp(digits: String, radix: Int): Option[Int] =
      if (digits.isEmpty || !digits.forall(Character.digit(_, radix) >= 0)) None
      else scala.util.Try(java.lang.Long.parseLong(digits, radix)) match {
        case scala.util.Success(v) if v <= 0x10FFFFL => Some(v.toInt)
        case _ => Some(0x110000) // valid digits, out of range -> U+FFFD path
      }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val isNum = semi > i + 1 && s.charAt(i + 1) == '#'
        if (semi > i && (semi - i <= 10 || (isNum && semi - i <= 32))) {
          val body = s.substring(i + 1, semi)
          val cp =
            if (body.startsWith("#x") || body.startsWith("#X")) parseCp(body.substring(2), 16)
            else if (body.startsWith("#")) parseCp(body.substring(1), 10)
            else None
          cp match {
            case Some(v) => sb.appendAll(numericRef(v)); i = semi + 1
            case None if !isNum => Named.get(body) match {
              case Some(rep) => sb.append(rep); i = semi + 1
              case None      => sb += c; i += 1
            }
            case None => sb += c; i += 1
          }
        } else { sb += c; i += 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
