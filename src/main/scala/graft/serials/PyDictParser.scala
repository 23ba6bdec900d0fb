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
    * Ints render exactly (BigInt, no double round-trip); floats keep the
    * ".0" Python shows for integral values (str(1.0) == "1.0"). Extreme
    * exponents may format as 1.0E20 vs Python's 1e+20 — out of scope for
    * bibliographic cells. */
  def render(v: PyVal): String = v match {
    case PyStr(s)   => s
    case PyInt(n)   => n.toString
    case PyFloat(d) =>
      if (d.isNaN) "nan"
      else if (d.isInfinity) { if (d > 0) "inf" else "-inf" }
      else if (d == math.floor(d) && math.abs(d) < 1e16) s"${d.toLong}.0"
      else d.toString
    case PyBool(b)  => if (b) "True" else "False"
    case PyNone     => "None"
    case PyList(xs) => xs.map(repr).mkString("[", ", ", "]")
    case PyDict(m)  => m.map { case (k, x) => s"'$k': ${repr(x)}" }.mkString("{", ", ", "}")
  }

  private def repr(v: PyVal): String = v match {
    case PyStr(s) => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case other    => render(other)
  }

  private final class ParseError extends RuntimeException

  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    private def peek: Char = if (eof) throw new ParseError else s.charAt(i)
    private def next(): Char = { val c = peek; i += 1; c }
    def ws(): Unit = while (!eof && peek.isWhitespace) i += 1
    private def expect(c: Char): Unit = if (next() != c) throw new ParseError

    def value(): PyVal = {
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

    private def list(): PyList = {
      val close = if (peek == '[') ']' else ')'
      next(); ws()
      val xs = scala.collection.mutable.ListBuffer.empty[PyVal]
      if (peek == close) { next(); return PyList(xs.toList) }
      var done = false
      while (!done) {
        xs += value()
        ws()
        next() match {
          case ',' => ws(); if (peek == close) { next(); done = true }
          case `close` => done = true
          case _   => throw new ParseError
        }
      }
      PyList(xs.toList)
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
              case 'U'  => sb.appendAll(Character.toChars(hexEscape(8)))
              case c if c >= '0' && c <= '7' =>
                // octal, up to 3 digits including the first
                var code = c - '0'
                var k = 0
                while (k < 2 && !eof && peek >= '0' && peek <= '7') {
                  code = code * 8 + (next() - '0'); k += 1
                }
                sb += code.toChar
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
