package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.textops.{TextOps, Float16}

/** Golden tables ported verbatim from the reference's pytest suite. */
class TextOpsSpec extends AnyFunSuite with TableDrivenPropertyChecks {

  // /root/reference/tests/test_wordscore.py:6-26
  val wordscoreGoldens = Table(
    ("total", "match", "bycatch", "expected"),
    (100, 20, 5, 0.5625),
    (1000, 500, 10, 0.7425),
    (0, 20, 5, 0.0),
    (100, -20, 5, 0.0),
    (100, 20, -5, 0.0),
    (100, 20, 80, 0.0),
    (100, 100, 0, 1.0),
    (100, 0, 0, 0.5),
    (1, 0, 0, 0.5))

  test("calculateLikelihood matches the reference goldens exactly") {
    forAll(wordscoreGoldens) { (t, m, b, expected) =>
      assert(TextOps.calculateLikelihood(t, m, b) == expected)
    }
  }

  test("likelihood stays in [0,1] for any inputs (seeded property)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val s = TextOps.calculateLikelihood(
        rnd.nextInt(100001), rnd.nextInt(100001), rnd.nextInt(100001))
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("tokenizer reproduces Python strip().lower().split(' ') semantics") {
    assert(TextOps.tokenize("Hello World").toSeq == Seq("hello", "world"))
    // double space yields empty token
    assert(TextOps.tokenize("a  b").toSeq == Seq("a", "", "b"))
    // newline inside token survives single-space split
    assert(TextOps.tokenize("foo\nbar baz").toSeq == Seq("foo\nbar", "baz"))
    // empty input -> one empty token (Python "".split(" ") == [""])
    assert(TextOps.tokenize("").toSeq == Seq(""))
    assert(TextOps.tokenize("   ").toSeq == Seq(""))
    // Python str.strip() also strips NBSP/NEL/figure/narrow-nbsp, which
    // Java's Character.isWhitespace does not — NBSP-led HTML extractions
    // must tokenize identically to the reference
    assert(TextOps.tokenize("\u00a0Neural nets\u00a0").toSeq == Seq("neural", "nets"))
    assert(TextOps.tokenize("\u0085x\u2007y\u202f").toSeq == Seq("x\u2007y"))
  }

  test("matchTerms: docstring example incl. tie-break by first insertion") {
    // /root/reference/src/docscraper.py:66-81
    val words = List("a", "a", "b", "c", "d", "d", "d", "d", "c", "a",
      "f", "f", "f", "g", "d")
    val res = TextOps.matchTerms(words, Set("a", "b", "f"))
    assert(res.frequencyDist == List(("a", 3), ("f", 3), ("b", 1)))
    assert(res.termCount == 7)
  }

  test("matchTerms tie-break: equal counts keep first-occurrence order") {
    val res = TextOps.matchTerms(List("z", "y", "x", "x", "y", "z"), Set("x", "y", "z"))
    assert(res.frequencyDist == List(("z", 2), ("y", 2), ("x", 2)))
  }

  test("parentheticals: greedy per-line match like re.findall") {
    val text = "effect size (d = 0.42) was large (n = 12)\nno stats here (just words)"
    // greedy .* merges both parens on the same line — same as Python
    assert(TextOps.parentheticals(text) == List("(d = 0.42) was large (n = 12)"))
    assert(TextOps.parentheticals("nothing") == Nil)
    assert(TextOps.parentheticals("(x=y)") == List("(x=y)"))
  }

  test("word-set load strips, lowers, dedups") {
    val set = TextOps.loadWordSet(Iterator(" Design\n", "design", "FMRI ", ""))
    assert(set == Set("design", "fmri", ""))
  }

  // --- float16 quantization (np.float16 parity) -------------------------
  test("float16 quantize known values") {
    // values checked against numpy: np.float32(np.float16(x))
    assert(Float16.quantize(0.5625f) == 0.5625f) // exact in fp16
    assert(Float16.quantize(1.0f) == 1.0f)
    assert(Float16.quantize(0.0f) == 0.0f)
    assert(Float16.quantize(0.7425f) == 0.74267578125f) // np.float16(0.7425)
    assert(Float16.quantize(0.1f) == 0.0999755859375f) // np.float16(0.1)
    assert(Float16.quantize(65504f) == 65504f) // fp16 max
    assert(Float16.quantize(65520f).isPosInfinity) // overflow rounds to inf
    assert(Float16.quantize(1e-8f) == 0.0f) // underflow
    assert(Float16.quantize(6.1e-5f) == 6.097555160522461e-5f) // subnormal (checked vs numpy)
  }

  test("float16 round-trip is idempotent (seeded property)") {
    val rnd = new scala.util.Random(42)
    (1 to 5000).foreach { _ =>
      val f = (rnd.nextFloat() - 0.5f) * 140000f
      val q = Float16.quantize(f)
      assert(Float16.quantize(q) == q || (q.isNaN && Float16.quantize(q).isNaN))
    }
  }

  test("float16 quantize agrees with exhaustive half-bit reconstruction") {
    // every finite half value must round-trip bit-exactly
    (0 until 0x10000).foreach { bits =>
      val h = bits.toShort
      val f = Float16.halfBitsToFloat(h)
      if (!f.isNaN && !f.isInfinite) {
        assert(Float16.quantize(f) == f, s"bits=$bits f=$f")
      }
    }
  }
}
