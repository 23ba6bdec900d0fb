package graft.serials

/** Lenient parser for Python dict/list literals embedded in CSV cells.
  *
  * The reference `eval`s cells that start with "{"
  * (/root/reference/src/serials.py:66-86) and takes `.get(column, "")`.
  * Python dict literals use single quotes, so `from_json` rejects them;
  * this is a small recursive-descent parser over the literal subset that
  * appears in bibliographic exports: dicts, lists, single/double-quoted
  * strings (with backslash escapes), ints, floats, True/False/None.
  * Never eval.
  */
object PyDictParser {

  sealed trait PyVal
  final case class PyStr(v: String) extends PyVal
  final case class PyInt(v: BigInt) extends PyVal
  final case class PyFloat(v: Double) extends PyVal
  final case class PyBool(v: Boolean) extends PyVal
  case object PyNone extends PyVal
  final case class PyList(v: List[PyVal]) extends PyVal
  /** Parenthesized literals keep tuple identity: str() renders them with
    * parens (and the singleton trailing comma), not brackets. */
  final case class PyTuple(v: List[PyVal]) extends PyVal
  /** Entries kept in INSERTION order (Python dicts are ordered; a Map
    * would hash-scramble str() output for dicts with >4 keys). Duplicate
    * keys keep the first position with the last value, like Python. */
  final case class PyDict(v: Vector[(String, PyVal)]) extends PyVal {
    def get(key: String): Option[PyVal] =
      v.collectFirst { case (k, x) if k == key => x }
  }

  /** Parse a full literal; None on any syntax error (the reference would
    * raise inside eval; callers treat the cell as opaque then). */
  def parse(s: String): Option[PyVal] = {
    val p = new P(s)
    try {
      p.ws()
      val v = p.value()
      p.ws()
      if (p.eof) Some(v) else None
    } catch { case _: ParseError => None }
  }

  /** The reference's cell cleaning: if the cell starts with "{", parse it
    * as a dict and return str(dict.get(key, "")); otherwise pass the cell
    * through unchanged (serials.py:80-86). */
  def extractKey(cell: String, key: String): String = {
    if (cell == null || !cell.startsWith("{")) return cell
    parse(cell) match {
      case Some(d: PyDict) => d.get(key).map(render(_)).getOrElse("")
      case _               => cell // unparsable dict-ish cell passes through
    }
  }

  /** Python str() of the supported values (what lands in the dataframe).
    * Ints render exactly (BigInt, no double round-trip); floats follow
    * CPython's float_repr formatting (see pyFloatStr); nested strings and
    * dict keys follow CPython's repr quoting rules (see pyRepr). */
  def render(v: PyVal): String = v match {
    case PyStr(s)   => s
    case PyInt(n)   => n.toString
    case PyFloat(d) =>
      if (d.isNaN) "nan"
      else if (d.isInfinity) { if (d > 0) "inf" else "-inf" }
      else if (d == math.floor(d) && math.abs(d) < 1e16)
        // str(-0.0) keeps the sign; d.toLong alone would drop it
        (if (d == 0.0 && 1.0 / d < 0) "-" else "") + s"${d.toLong}.0"
      else pyFloatStr(d)
    case PyBool(b)  => if (b) "True" else "False"
    case PyNone     => "None"
    case PyList(xs) => xs.map(repr).mkString("[", ", ", "]")
    case PyTuple(xs) => xs match {
      case Nil        => "()"
      case one :: Nil => s"(${repr(one)},)" // Python singleton-tuple comma
      case _          => xs.map(repr).mkString("(", ", ", ")")
    }
    case PyDict(m)  => m.map { case (k, x) => s"${pyRepr(k)}: ${repr(x)}" }.mkString("{", ", ", "}")
  }

  private def repr(v: PyVal): String = v match {
    case PyStr(s) => pyRepr(s)
    case other    => render(other)
  }

  /** Python's str.isprintable per code point: everything except the
    * Other (C*) and Separator (Z*) categories, with ' ' itself printable.
    * repr escapes the non-printable ones (\xXX / \uXXXX / \UXXXXXXXX) —
    * C1 controls, NBSP, U+2028 and friends are common in HTML-sourced
    * bibliographic strings, and CPython escapes them all. (Java's Unicode
    * tables may trail CPython's by a version for newly-assigned code
    * points; the bibliographic character ranges are stable.) */
  private def pyPrintable(cp: Int): Boolean =
    cp == ' ' || (Character.getType(cp) match {
      case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
           Character.PRIVATE_USE | Character.UNASSIGNED |
           Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR |
           Character.SPACE_SEPARATOR => false
      case _ => true
    })

  /** CPython repr of a str: single quotes unless the string contains a
    * single quote and no double quote (then double quotes, apostrophes
    * unescaped); backslash, the chosen quote and \n \r \t escape by name;
    * all other NON-PRINTABLE code points (C0/C1 controls, format chars,
    * separators, surrogates...) escape as \xXX/\uXXXX/\UXXXXXXXX;
    * printable non-ASCII stays raw. */
  private def pyRepr(s: String): String = {
    val hasSingle = s.indexOf('\'') >= 0
    val hasDouble = s.indexOf('"') >= 0
    val q = if (hasSingle && !hasDouble) '"' else '\''
    val sb = new StringBuilder(s.length + 2)
    sb += q
    var idx = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      cp match {
        case '\\'        => sb.append("\\\\")
        case c if c == q => sb += '\\' += q
        case '\n'        => sb.append("\\n")
        case '\r'        => sb.append("\\r")
        case '\t'        => sb.append("\\t")
        case c if !pyPrintable(c) =>
          if (c < 0x100) sb.append(f"\\x$c%02x")
          else if (c < 0x10000) sb.append(f"\\u$c%04x")
          else sb.append(f"\\U$c%08x")
        case c => sb.appendAll(Character.toChars(c))
      }
      idx += Character.charCount(cp)
    }
    sb += q
    sb.toString
  }

  /** CPython str(float) for non-integral values: shortest round-trip
    * digits (Java's Double.toString provides them) re-formatted with
    * float_repr's rules — positional while -4 <= exp10 < 16, else
    * scientific `e±EE` with at least two exponent digits. Java's own
    * thresholds (1e7 / 1e-3) switch to scientific far earlier, which
    * would mismatch Python for everyday magnitudes like timestamps. */
  private def pyFloatStr(d: Double): String = {
    val sign = if (d < 0) "-" else ""
    val abs = math.abs(d)
    val j = java.lang.Double.toString(abs)
    val (mant, exp) = j.indexOf('E') match {
      case -1 => (j, 0)
      case k  => (j.substring(0, k), j.substring(k + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val digits0 = mant.substring(0, dot) + mant.substring(dot + 1)
    val lead = digits0.indexWhere(_ != '0') match { case -1 => 0; case k => k }
    // significant digits, first at place 10^e10
    val sigAll = digits0.substring(lead)
    val sigJ = {
      val t = sigAll.reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t
    }
    val e10J = (dot - 1 - lead) + exp
    // Java 17's Double.toString is not always SHORTEST round-trip
    // (JDK-4511638: 9.999999999999999E22 where 1E23 parses identically;
    // CPython's repr is shortest) — shorten to the first prefix that
    // still parses back to the same double, trying the correctly-rounded
    // candidate first
    def stripZeros(s: String): String = {
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t
    }
    def shorten(): (String, Int) = {
      var k = 1
      while (k < sigJ.length) {
        val downStr = stripZeros(sigJ.substring(0, k))
        val upBig = (BigInt(sigJ.substring(0, k)) + 1).toString
        val up =
          if (upBig.length > k) (stripZeros(upBig), e10J + 1)
          else (stripZeros(upBig), e10J)
        val down = (downStr, e10J)
        val order = if (sigJ.charAt(k) >= '5') Seq(up, down) else Seq(down, up)
        order.foreach { case (cand, ce) =>
          if (java.lang.Double.parseDouble(s"0.${cand}E${ce + 1}") == abs)
            return (cand, ce)
        }
        k += 1
      }
      (sigJ, e10J)
    }
    val (sig, e10) = shorten()
    if (e10 >= -4 && e10 < 16) {
      if (e10 >= sig.length - 1)
        sign + sig + "0" * (e10 - sig.length + 1) + ".0"
      else if (e10 >= 0)
        sign + sig.substring(0, e10 + 1) + "." + sig.substring(e10 + 1)
      else
        sign + "0." + "0" * (-e10 - 1) + sig
    } else {
      val mantissa =
        if (sig.length > 1) sig.substring(0, 1) + "." + sig.substring(1) else sig
      val es = if (e10 < 0) "-" else "+"
      sign + mantissa + "e" + es + f"${math.abs(e10)}%02d"
    }
  }

  private final class ParseError extends RuntimeException

  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    private def peek: Char = if (eof) throw new ParseError else s.charAt(i)
    private def next(): Char = { val c = peek; i += 1; c }
    def ws(): Unit = while (!eof && peek.isWhitespace) i += 1
    private def expect(c: Char): Unit = if (next() != c) throw new ParseError

    private var depth = 0
    def value(): PyVal = {
      // recursion bound: a corrupt/adversarial cell like "{'a': " + "["*50k
      // would otherwise StackOverflowError — an Error nothing on the udf
      // path catches, killing the task (the sibling consumers of external
      // bytes bound this: Extractor catches SOE, PdfDoc.resolve caps ref
      // depth). 200 is far past any str(dict) export.
      depth += 1
      if (depth > 200) throw new ParseError
      try valueInner() finally depth -= 1
    }
    private def valueInner(): PyVal = {
      ws()
      peek match {
        case '{'                               => dict()
        case '[' | '('                         => list()
        case '\'' | '"'                        => PyStr(str())
        case c if c.isDigit || c == '-' || c == '+' => num()
        case 'T' => lit("True"); PyBool(true)
        case 'F' => lit("False"); PyBool(false)
        case 'N' => lit("None"); PyNone
        case _   => throw new ParseError
      }
    }

    private def lit(word: String): Unit = {
      if (!s.startsWith(word, i)) throw new ParseError
      i += word.length
    }

    private def dict(): PyDict = {
      expect('{'); ws()
      val m = scala.collection.mutable.LinkedHashMap.empty[String, PyVal]
      if (peek == '}') { next(); return PyDict(m.toVector) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        val v = value()
        m.update(k, v)
        ws()
        next() match {
          case ',' => ws(); if (peek == '}') { next(); done = true }
          case '}' => done = true
          case _   => throw new ParseError
        }
      }
      PyDict(m.toVector)
    }

    private def list(): PyVal = {
      val isTuple = peek == '('
      val close = if (isTuple) ')' else ']'
      def wrap(xs: List[PyVal]): PyVal = if (isTuple) PyTuple(xs) else PyList(xs)
      next(); ws()
      val xs = scala.collection.mutable.ListBuffer.empty[PyVal]
      if (peek == close) { next(); return wrap(xs.toList) }
      var done = false
      var sawComma = false
      while (!done) {
        xs += value()
        ws()
        next() match {
          case ',' => sawComma = true; ws(); if (peek == close) { next(); done = true }
          case `close` => done = true
          case _   => throw new ParseError
        }
      }
      // Python: parens with ONE element and no comma are a grouped
      // expression, not a tuple — eval("(1)") is the bare scalar
      if (isTuple && xs.length == 1 && !sawComma) xs.head
      else wrap(xs.toList)
    }

    private def str(): String = {
      val q = next()
      if (q != '\'' && q != '"') throw new ParseError
      val sb = new StringBuilder
      var done = false
      while (!done) {
        next() match {
          case `q`  => done = true
          case '\\' =>
            next() match {
              case 'n'  => sb += '\n'
              case 't'  => sb += '\t'
              case 'r'  => sb += '\r'
              case 'a'  => sb += '\u0007'
              case 'b'  => sb += '\b'
              case 'f'  => sb += '\f'
              case 'v'  => sb += '\u000B'
              case '\\' => sb += '\\'
              case '\'' => sb += '\''
              case '"'  => sb += '"'
              case 'x'  => sb += hexEscape(2).toChar
              case 'u'  => sb += hexEscape(4).toChar
              case 'U'  =>
                // CPython: \U past 0x10FFFF is a SyntaxError (the cell
                // stays opaque via literal_eval failure) — map to
                // ParseError, never let Character.toChars throw an
                // IllegalArgumentException through parse()'s None contract
                val cp = hexEscape(8)
                if (!Character.isValidCodePoint(cp)) throw new ParseError
                sb.appendAll(Character.toChars(cp))
              case c if c >= '0' && c <= '7' =>
                // octal, up to 3 digits including the first
                var code = c - '0'
                var k = 0
                while (k < 2 && !eof && peek >= '0' && peek <= '7') {
                  code = code * 8 + (next() - '0'); k += 1
                }
                sb += code.toChar
              case '\n' => () // backslash-newline = line continuation (removed)
              case '\r' => if (!eof && peek == '\n') { next(); () } // CRLF continuation
              case c    => sb += '\\' += c // Python keeps unknown escapes
            }
          case c => sb += c
        }
      }
      sb.toString
    }

    private def hexEscape(nDigits: Int): Int = {
      var code = 0
      var k = 0
      while (k < nDigits) {
        val c = next()
        val d = Character.digit(c, 16)
        if (d < 0) throw new ParseError
        code = code * 16 + d
        k += 1
      }
      code
    }

    private def num(): PyVal = {
      val start = i
      if (peek == '-' || peek == '+') i += 1
      var isFloat = false
      while (!eof && (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
             ((peek == '-' || peek == '+') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) {
        if (peek == '.' || peek == 'e' || peek == 'E') isFloat = true
        i += 1
      }
      if (i == start) throw new ParseError
      val text = s.substring(start, i)
      try {
        // int literals stay exact (Python ints are arbitrary precision;
        // a Double round-trip would corrupt ids beyond 2^53)
        if (isFloat) PyFloat(text.toDouble) else PyInt(BigInt(text))
      } catch { case _: NumberFormatException => throw new ParseError }
    }
  }
}
