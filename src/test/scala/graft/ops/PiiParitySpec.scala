package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the t7 claim that the PII patterns scan identically under Java
  * regex (Spark's engine) and RE2 (DuckDB, the oracle): the fixture holds
  * 5008 adversarial strings — stacked '@'s, over-long octets, dangling
  * dashes, '+' runs, unicode locals — with match counts and the
  * redacted-string md5 computed by DuckDB (`tools/gen_pii_fixture.py`);
  * this spec re-derives every row with `java.util.regex` and the same
  * replace chain. Any leftmost-first / greediness / class-semantics
  * divergence between the engines would surface here long before the
  * enrichment's tame planted shapes could expose it.
  */
class PiiParitySpec extends AnyFunSuite {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("t7 patterns: Java regex equals the RE2/DuckDB fixture on 5008 adversarial strings") {
    val in = getClass.getResourceAsStream("/goldens/pii_cases.tsv")
    assert(in != null, "pii_cases.tsv fixture missing")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size >= 5000)
    val pe = java.util.regex.Pattern.compile(TextOps.EmailRe)
    val pp = java.util.regex.Pattern.compile(TextOps.PhoneRe)
    val pi = java.util.regex.Pattern.compile(TextOps.Ipv4Re)
    def count(p: java.util.regex.Pattern, s: String): Int = {
      val m = p.matcher(s); var n = 0; while (m.find()) n += 1; n
    }
    var checked = 0
    var withMatch = 0
    lines.foreach { line =>
      val f = line.split("\t", -1)
      assert(f.length == 5, s"malformed fixture line: $line")
      val s = f(0)
      val clean = s.replaceAll(TextOps.EmailRe, "<EMAIL>")
        .replaceAll(TextOps.PhoneRe, "<PHONE>")
        .replaceAll(TextOps.Ipv4Re, "<IP>")
      assert(count(pe, s) == f(1).toInt, s"email count diverged on: $s")
      assert(count(pp, s) == f(2).toInt, s"phone count diverged on: $s")
      assert(count(pi, s) == f(3).toInt, s"ip count diverged on: $s")
      assert(md5Hex(clean) == f(4), s"redaction diverged on: $s")
      checked += 1
      if (f(1).toInt + f(2).toInt + f(3).toInt > 0) withMatch += 1
    }
    assert(checked == lines.size)
    // the fixture must actually exercise the patterns, not just miss
    assert(withMatch > 3000, s"only $withMatch matching cases")
  }
}
