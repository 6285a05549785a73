package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Pins [[EmailParser.pyNormalizeCharset]] to live CPython 3.11
  * `encodings.normalize_encoding(name.lower())` via a generated fixture
  * (`goldens/normalize_cases.tsv`, regenerate with
  * `tools/gen_normalize_fixture.py`): one case per codepoint of the 56-letter
  * Unicode-version skew ([[EmailParser.Unicode14Letters]], both
  * alnum-skip and punct-bracketed shapes), plus the classic alias
  * spellings, non-ASCII alnum skipping ('latiné1' → 'latin1'), Nl/No
  * number forms, combining-mark punctuation (lowercased 'İ'), dot
  * preservation, and leading/trailing punctuation trimming. With the
  * Unicode14Letters table the predicate has ZERO known BMP skew vs
  * CPython.
  */
class EmailNormalizeSpec extends AnyFunSuite {

  test("pyNormalizeCharset matches CPython normalize_encoding on all fixture cases") {
    val src = Source.fromResource("goldens/normalize_cases.tsv")(scala.io.Codec.UTF8)
    val cases =
      try src.getLines().map { l =>
        val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1))
      }.toVector
      finally src.close()
    assert(cases.size >= 131)
    val bad = cases.filter { case (n, exp) => EmailParser.pyNormalizeCharset(n) != exp }
    assert(bad.isEmpty, bad.take(5).map { case (n, exp) =>
      s"'$n': got '${EmailParser.pyNormalizeCharset(n)}' want '$exp'"
    }.mkString("; "))
  }

  test("Unicode14Letters covers exactly the 56-codepoint live diff") {
    val n = EmailParser.Unicode14Letters.map { case (a, b) => b - a + 1 }.sum
    assert(n == 56)
  }
}
