package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serials.PyDictParser
import graft.serials.PyDictParser._

class PyDictParserSpec extends AnyFunSuite {

  test("hostile cells degrade to None, never to a thrown Error (round-5 review)") {
    // \U past 0x10FFFF: CPython raises SyntaxError -> the cell stays
    // opaque; Character.toChars would have thrown IllegalArgumentException
    // THROUGH parse()'s None contract and killed the Spark task
    assert(PyDictParser.parse("{'a': '\\UFFFFFFFF'}").isEmpty)
    assert(PyDictParser.parse("{'a': '\\U00110000'}").isEmpty)
    // ...while the max legal code point still decodes
    assert(PyDictParser.extractKey("{'a': '\\U0010FFFF'}", "a")
      == new String(Character.toChars(0x10FFFF)))
    // 50k-deep nesting: bounded recursion -> None, not StackOverflowError
    val deep = "{'a': " + ("[" * 50000)
    assert(PyDictParser.parse(deep).isEmpty)
  }

  test("CPython escape/grouping parity: line continuation and (1) (differential goldens)") {
    // eval("'x\\\n y'") == 'x y' — backslash-newline is removed
    assert(PyDictParser.extractKey("{'a': 'x\\\n y'}", "a") == "x y")
    assert(PyDictParser.extractKey("{'a': 'x\\\r\n y'}", "a") == "x y")
    // eval("(1)") == 1 (grouped expression), eval("(1,)") == (1,)
    assert(PyDictParser.extractKey("{'k': (1)}", "k") == "1")
    assert(PyDictParser.extractKey("{'k': (1,)}", "k") == "(1,)")
  }

  test("single-quoted Python dict literal (the CSV fixture shape)") {
    // shape of /root/reference/tests/test_dirs/test_example_file_1.csv row 2
    val cell = "{'authors': 'I. Ron Butterfly', 'year': 1968, 'ok': True, 'missing': None}"
    assert(PyDictParser.extractKey(cell, "authors") == "I. Ron Butterfly")
    assert(PyDictParser.extractKey(cell, "year") == "1968")
    assert(PyDictParser.extractKey(cell, "ok") == "True")
    assert(PyDictParser.extractKey(cell, "missing") == "None")
    assert(PyDictParser.extractKey(cell, "absent") == "")
  }

  test("non-dict cells pass through unchanged") {
    assert(PyDictParser.extractKey("plain value", "k") == "plain value")
    assert(PyDictParser.extractKey("10.1000/12345", "k") == "10.1000/12345")
  }

  test("nested lists and escapes") {
    val cell = "{'ids': ['pub.10001', 'pub.10002'], 'note': 'it\\'s fine'}"
    assert(PyDictParser.extractKey(cell, "ids") == "['pub.10001', 'pub.10002']")
    assert(PyDictParser.extractKey(cell, "note") == "it's fine")
  }

  test("tuples, -0.0, and non-printable repr escapes (CPython goldens)") {
    // each golden generated with CPython eval + str on this host
    assert(PyDictParser.extractKey("{'pages': (1, 2)}", "pages") == "(1, 2)")
    assert(PyDictParser.extractKey("{'pages': (7,)}", "pages") == "(7,)")
    assert(PyDictParser.extractKey("{'pages': ()}", "pages") == "()")
    assert(PyDictParser.extractKey("{'mix': ({'a': 1}, [2.5], 'x')}", "mix")
      == "({'a': 1}, [2.5], 'x')")
    // str(-0.0) keeps the sign
    assert(PyDictParser.extractKey("{'score': -0.0}", "score") == "-0.0")
    // NESTED strings render via repr, which escapes non-printable
    // non-ASCII (NBSP, C1 NEL, LINE SEPARATOR); TOP-LEVEL strings stay raw
    val nbsp = "\u00a0"; val nel = "\u0085"; val lsep = "\u2028"
    assert(PyDictParser.extractKey(s"{'authors': ['X${nbsp}Y']}", "authors")
      == "['X\\xa0Y']")
    assert(PyDictParser.extractKey(s"{'t': ['${nel}nel', '${lsep}ls']}", "t")
      == "['\\x85nel', '\\u2028ls']")
    assert(PyDictParser.extractKey(s"{'t': '${lsep}line'}", "t") == lsep + "line")
  }

  test("malformed dict-ish cells pass through (reference would raise in eval)") {
    assert(PyDictParser.extractKey("{not python", "k") == "{not python")
  }

  test("parse handles numbers, tuples, nesting") {
    assert(PyDictParser.parse("{'a': {'b': [1, 2.5, -3]}}").isDefined)
    assert(PyDictParser.parse("('x', 'y')") == Some(PyTuple(List(PyStr("x"), PyStr("y")))))
    assert(PyDictParser.parse("{'trailing': 1,}").isDefined)
    assert(PyDictParser.parse("{bad}") == None)
  }

  test("Python str() fidelity: dict order, float .0, exact ints, escapes") {
    // insertion order survives >4 keys (a hash Map would scramble str())
    assert(PyDictParser.extractKey(
      "{'a': {'k1': 1, 'k2': 2, 'k3': 3, 'k4': 4, 'k5': 5}}", "a") ==
      "{'k1': 1, 'k2': 2, 'k3': 3, 'k4': 4, 'k5': 5}")
    // str(1.0) keeps the .0; str(1) does not
    assert(PyDictParser.extractKey("{'score': 1.0}", "score") == "1.0")
    assert(PyDictParser.extractKey("{'score': 1}", "score") == "1")
    assert(PyDictParser.extractKey("{'score': 0.5}", "score") == "0.5")
    // ints beyond 2^53 stay exact (no double round-trip)
    assert(PyDictParser.extractKey("{'id': 9007199254740993}", "id") == "9007199254740993")
    // \xNN / \uNNNN / octal escapes decode like Python eval
    assert(PyDictParser.extractKey("{'author': 'M\\xfcller'}", "author") == "Müller")
    assert(PyDictParser.extractKey("{'s': '\\u00e9t\\351'}", "s") == "été")
    // duplicate keys: first position, last value (Python semantics)
    assert(PyDictParser.extractKey("{'a': 1, 'a': 2}", "a") == "2")
  }

  test("CPython float_repr formatting (goldens from python3 repr)") {
    def f(lit: String) = PyDictParser.extractKey(s"{'v': $lit}", "v")
    // positional window is -4 <= exp10 < 16 (Java's own toString switches
    // to scientific at 1e7/1e-3 and would mismatch everyday magnitudes)
    assert(f("12345678.5") == "12345678.5")
    assert(f("1786916130.348") == "1786916130.348")
    assert(f("0.0001") == "0.0001")
    assert(f("0.0025") == "0.0025")
    assert(f("123.456") == "123.456")
    assert(f("-12345678.5") == "-12345678.5")
    assert(f("1e15") == "1000000000000000.0")
    assert(f("3.141592653589793") == "3.141592653589793")
    assert(f("0.30000000000000004") == "0.30000000000000004")
    // scientific beyond the window: lowercase e, sign, >= 2 exponent digits
    assert(f("0.00001") == "1e-05")
    assert(f("2e-8") == "2e-08")
    assert(f("1e16") == "1e+16")
    assert(f("1.5e16") == "1.5e+16")
    assert(f("9.999999999999999e22") == "1e+23") // shortest round-trip
    assert(f("1e100") == "1e+100")
  }

  test("CPython repr quoting for nested strings and keys (goldens from python3)") {
    // apostrophe-only strings switch to double quotes, apostrophe unescaped
    assert(PyDictParser.extractKey("{'authors': [\"O'Brien\", 'Smith']}", "authors") ==
      "[\"O'Brien\", 'Smith']")
    // double-quote-only strings keep single quotes
    assert(PyDictParser.extractKey("{'t': ['has \"dq\" only']}", "t") ==
      "['has \"dq\" only']")
    // both quote kinds: single quotes, apostrophe escaped
    assert(PyDictParser.extractKey("{'t': ['both \\' and \"']}", "t") ==
      "['both \\' and \"']")
    // control chars escape as \n \t \xNN
    assert(PyDictParser.extractKey("{'t': ['line\\nbreak\\ttab']}", "t") ==
      "['line\\nbreak\\ttab']")
    assert(PyDictParser.extractKey("{'t': ['ctrl\\x01char']}", "t") ==
      "['ctrl\\x01char']")
    // dict KEYS follow the same quoting rules
    assert(PyDictParser.extractKey("{'d': {\"it's\": 1.5}}", "d") ==
      "{\"it's\": 1.5}")
  }
}
