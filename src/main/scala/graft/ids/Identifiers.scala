package graft.ids

import java.util.regex.Pattern

/** DOI / arXiv identifier extraction + normalization.
  *
  * Reference semantics: /root/reference/src/doi_regex.py:5-82; golden table
  * /root/reference/tests/test_doiregex.py:5-39. Patterns are transcribed to
  * Java regex dialect (identical constructs here: char classes, named
  * groups, inline flags); all searches run over the casefolded input, and
  * `standardize` keeps the LAST match's groups (Python
  * `meta.update(m.groupdict())` in a finditer loop).
  */
object Identifiers {

  // --- pattern banks (doi_regex.py:5-19) ---------------------------------
  private val DoiPatterns: List[Pattern] = List(
    Pattern.compile("doi[\\s.:]{0,2}(10\\.\\d{4}[\\d:.\\-/a-z]+)(?:[\\s\\n\"<]|$)"),
    Pattern.compile("(10\\.\\d{4}[\\d:.\\-/a-z]+)(?:[\\s\\n\"<]|$)"),
    Pattern.compile("(10\\.\\d{4}[:.\\-/a-z]+[:.\\-\\d]+)(?:[\\s\\na-z\"<]|$)"),
    Pattern.compile("https?://[ -~]*doi[ -~]*/(10\\.\\d{4,9}/[-._;()/:a-z0-9]+)(?:[\\s\\n\"<]|$)"),
    Pattern.compile("^(10\\.\\d{4,9}/[-._;()/:a-z0-9]+)$")
  )

  private val ArxivPatterns: List[Pattern] = List(
    Pattern.compile("^(\\d{4}\\.\\d+)(?:v\\d+)?$"),
    Pattern.compile("arxiv[\\s]*:[\\s]*(\\d{4}\\.\\d+)(?:v\\d+)?(?:[\\s\\n\"<]|$)"),
    Pattern.compile("(\\d{4}\\.\\d+)(?:v\\d+)?(?:\\.pdf)"),
    Pattern.compile("^(\\d{4}\\.\\d+)(?:v\\d+)?$")
  )

  // --- normalizers (doi_regex.py:21-45) -----------------------------------
  // (?xm): COMMENTS + MULTILINE, as in the reference's verbose pattern.
  private val DoiRegex = Pattern.compile(
    """(?xm)
      (?<marker>   doi[:/\s]{0,3})?
      (?<prefix>
        (?<namespace> 10)
        [.]
        (?<registrant> \d{2,9})
      )
      (?<sep>      [:\-/\s\]])
      (?<suffix>   [\-._;()/:a-z0-9]+[a-z0-9])
      (?<trailing> ([\s\n"<.]|$))
    """)

  private val ArxivRegex = Pattern.compile(
    """(?xi)
      (?<marker>arxiv[:/\s]{0,3})?
      (?<identifier>\d{4}\.\d+)
      (?:v\d+)?
      (?<trailing>\.pdf)?$
    """)

  /** Canonicalize a raw DOI-ish string to `10.{registrant}/{suffix}` or a
    * bare arXiv id; None when the normalizer finds no match.
    * Last finditer match wins (doi_regex.py:57-59).
    */
  def standardize(identifier: String, isDoi: Boolean): Option[String] = {
    val folded = identifier.toLowerCase(java.util.Locale.ROOT)
    if (isDoi) {
      val m = DoiRegex.matcher(folded)
      var last: Option[String] = None
      while (m.find()) last = Some(s"10.${m.group("registrant")}/${m.group("suffix")}")
      last
    } else {
      val m = ArxivRegex.matcher(folded)
      var last: Option[String] = None
      while (m.find()) last = Some(m.group("identifier"))
      last
    }
  }

  /** Try each DOI pattern, then each arXiv pattern, over the casefolded
    * text; first hit is standardized (doi_regex.py:70-82). DOI patterns
    * standardize group(1); arXiv patterns standardize the WHOLE match
    * (group 0), reproducing the reference's branch at :78-79.
    */
  def extract(text: String): Option[String] = {
    val folded = text.toLowerCase(java.util.Locale.ROOT)
    // necessary-condition prescans (semantics-preserving): every DOI
    // pattern contains the literal `10\.`, and every arXiv pattern needs
    // "arxiv", ".pdf", or the WHOLE input shaped like an anchored id —
    // one indexOf beats nine regex scans over body text, and this runs
    // over the full main text of every doi-less page in the corpus
    if (folded.contains("10.")) {
      DoiPatterns.foreach { p =>
        val m = p.matcher(folded)
        if (m.find()) {
          val g = m.group(1)
          if (g != null && g.nonEmpty) return standardize(g, isDoi = true)
        }
      }
    }
    if (folded.contains("arxiv") || folded.contains(".pdf") || anchoredIdShape(folded)) {
      ArxivPatterns.foreach { p =>
        val m = p.matcher(folded)
        if (m.find()) {
          val whole = m.group(0)
          if (whole != null && whole.nonEmpty) return standardize(whole, isDoi = false)
        }
      }
    }
    None
  }

  /** Necessary condition for the two ANCHORED arXiv patterns
    * (`^\d{4}\.\d+(v\d+)?$`): every char of the whole input is a digit,
    * '.', 'v', or a final newline ($ matches before one). Body text has
    * letters and exits on the first char. */
  private def anchoredIdShape(s: String): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!((c >= '0' && c <= '9') || c == '.' || c == 'v' || c == '\n')) return false
      i += 1
    }
    true
  }

  /** Search-field sniff: DOI-shaped queries search by doi, everything else
    * by text. Reference: /root/reference/src/webscrapers.py:264-276;
    * goldens /root/reference/tests/test_webscrapers.py:15-31.
    */
  def searchField(query: String): String =
    if (query.startsWith("10.")) "doi" else "text_search"
}
