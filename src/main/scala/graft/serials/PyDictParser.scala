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
  final case class PyNum(v: Double) extends PyVal
  final case class PyBool(v: Boolean) extends PyVal
  case object PyNone extends PyVal
  final case class PyList(v: List[PyVal]) extends PyVal
  final case class PyDict(v: Map[String, PyVal]) extends PyVal

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
      case Some(PyDict(m)) => m.get(key).map(render).getOrElse("")
      case _               => cell // unparsable dict-ish cell passes through
    }
  }

  /** Python str() of the supported values (what lands in the dataframe). */
  def render(v: PyVal): String = v match {
    case PyStr(s)   => s
    case PyNum(d)   => if (d == d.toLong.toDouble) d.toLong.toString else d.toString
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
      if (peek == '}') { next(); return PyDict(m.toMap) }
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
      PyDict(m.toMap)
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
              case '\\' => sb += '\\'
              case '\'' => sb += '\''
              case '"'  => sb += '"'
              case c    => sb += '\\' += c // Python keeps unknown escapes
            }
          case c => sb += c
        }
      }
      sb.toString
    }

    private def num(): PyNum = {
      val start = i
      if (peek == '-' || peek == '+') i += 1
      while (!eof && (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
             ((peek == '-' || peek == '+') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E'))))
        i += 1
      if (i == start) throw new ParseError
      try PyNum(s.substring(start, i).toDouble)
      catch { case _: NumberFormatException => throw new ParseError }
    }
  }
}
