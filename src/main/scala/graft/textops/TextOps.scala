package graft.textops

import scala.collection.mutable

/** Frequency distribution of the top-3 matched terms plus their summed count.
  *
  * Reference semantics: sciscraper `FreqDistAndCount`
  * (/root/reference/src/docscraper.py:18-34).
  */
final case class FreqDistAndCount(
    termCount: Int,
    frequencyDist: List[(String, Int)])

object TextOps {

  /** Python-semantics tokenizer: `preprint.strip().lower().split(" ")`.
    *
    * Single-space split keeps empty tokens from runs of spaces and keeps
    * tokens containing newlines/tabs; an empty input yields one empty token
    * (Python `"".split(" ") == [""]`).
    * Reference: /root/reference/src/docscraper.py:176-186.
    */
  def tokenize(preprint: String): Array[String] =
    pyStrip(preprint).toLowerCase(java.util.Locale.ROOT).split(" ", -1)

  /** Python str.strip() whitespace set: Java's Character.isWhitespace
    * EXCLUDES the non-breaking spaces (U+00A0/U+2007/U+202F) and NEL
    * (U+0085) that Python strips — and NBSP-led text is common in HTML
    * extractions, so String.strip() would silently break tokenizer parity
    * on the first token. */
  @inline private def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00A0' || c == '\u0085' ||
      c == '\u2007' || c == '\u202F'

  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Count tokens found in `wordSet`; return top-3 by count with Python
    * `Counter.most_common(3)` tie-breaking (first-insertion order wins on
    * equal counts — stable sort over first-occurrence order).
    *
    * Reference: /root/reference/src/docscraper.py:55-94 (docstring example
    * at :66-81 pins the tie-break).
    */
  def matchTerms(target: Iterable[String], wordSet: Set[String]): FreqDistAndCount = {
    val counts = mutable.LinkedHashMap.empty[String, Int]
    val it = target.iterator
    while (it.hasNext) {
      val w = it.next()
      if (wordSet.contains(w)) counts.update(w, counts.getOrElse(w, 0) + 1)
    }
    // Scala's sortBy is a stable (timsort) sort: equal counts keep the
    // LinkedHashMap insertion (= first occurrence) order, matching
    // Counter.most_common.
    val top3 = counts.toList.sortBy(-_._2).take(3)
    FreqDistAndCount(top3.map(_._2).sum, top3)
  }

  /** Weighted relevance likelihood in [0,1].
    *
    * (m*1.0 + b*(-0.25) + (t-m-b)*0.5) / t, clamped; 0.0 when t<=0 or
    * either count is negative.
    * Reference: /root/reference/src/docscraper.py:208-244; goldens
    * /root/reference/tests/test_wordscore.py:6-26 (e.g. (100,20,5)->0.5625).
    */
  def calculateLikelihood(
      totalWords: Int,
      desiredMatches: Int,
      undesiredMatches: Int): Double = {
    if (totalWords <= 0 || desiredMatches < 0 || undesiredMatches < 0) return 0.0
    val otherWords = totalWords - desiredMatches - undesiredMatches
    val score =
      (desiredMatches * 1.0 + undesiredMatches * -0.25 + otherWords * 0.5) /
        totalWords
    math.max(0.0, math.min(1.0, score))
  }

  /** Parenthetical statistics spans: Python `re.findall(r"\(.*\=.*\)")`.
    * Greedy, non-overlapping left-to-right scan. UNIX_LINES is LOAD-
    * BEARING: Python's default `.` excludes ONLY \n, while Java's
    * default also excludes \r, NEL (u0085), LS (u2028) and PS (u2029)
    * — without the flag a CR-bearing span like "(m=3,\rsd=1)" matches
    * in the reference but not here (differential fuzz: 8/4011
    * divergent cases found).
    * Reference: /root/reference/src/docscraper.py:15 and :171.
    */
  private val ParenStat = java.util.regex.Pattern.compile(
    "\\(.*=.*\\)", java.util.regex.Pattern.UNIX_LINES)

  def parentheticals(text: String): List[String] = {
    val m = ParenStat.matcher(text)
    val out = mutable.ListBuffer.empty[String]
    while (m.find()) out += m.group(0)
    out.toList
  }

  /** Word-set load semantics: one word per line, `strip().lower()`,
    * de-duplicated. Reference: /root/reference/src/docscraper.py:110-127.
    * In the engine this is loaded once on the driver and broadcast
    * (the reference re-reads both files per document).
    */
  def loadWordSet(lines: Iterator[String]): Set[String] =
    lines.map(l => pyStrip(l).toLowerCase(java.util.Locale.ROOT)).toSet
}
