package graft.parse

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** Python string/number-semantics parity helpers.
  *
  * The reference parser is CPython; golden equality (FIXTURES.md §4) requires
  * reproducing Python's `str.strip()`, `str.split()`, `str.split('\n\n')` and
  * `repr(float)` exactly (SURVEY §7.3 R3/R4). Pure Scala, no Spark deps.
  */
object PyCompat {

  /** Characters Python's `str.strip()` / `str.split()` treat as whitespace
    * (`unicodedata` WS/B/S bidirectional classes + category Zs). Differs from
    * Java's `Character.isWhitespace` on U+0085/U+00A0/U+180E edge cases.
    */
  def isPySpace(c: Char): Boolean = c match {
    case '\t' | '\n' | '\u000B' | '\f' | '\r' | '\u001C' | '\u001D' |
        '\u001E' | '\u001F' | ' ' | '\u0085' => true
    case _ => Character.getType(c) == Character.SPACE_SEPARATOR ||
        Character.getType(c) == Character.LINE_SEPARATOR ||
        Character.getType(c) == Character.PARAGRAPH_SEPARATOR
  }

  /** Python `str.strip()`. */
  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.split()` (no args): split on whitespace runs, drop empties. */
  def pySplitWs(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isPySpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isPySpace(s.charAt(i))) i += 1
        out += s.substring(start, i)
      }
    }
    out.toArray
  }

  /** Python word count `len(s.split())`. */
  def pyWordCount(s: String): Int = {
    var count = 0
    var i = 0
    val n = s.length
    var inWord = false
    while (i < n) {
      val sp = isPySpace(s.charAt(i))
      if (!sp && !inWord) { count += 1; inWord = true }
      else if (sp) inWord = false
      i += 1
    }
    count
  }

  /** Python `s.split(sep)` for a literal separator (keeps empty fields,
    * left-to-right non-overlapping) — e.g. `'\n\n'` paragraph splitting
    * (`pipeline.py:412`).
    */
  def pySplitLit(s: String, sep: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var idx = s.indexOf(sep, start)
    while (idx >= 0) {
      out += s.substring(start, idx)
      start = idx + sep.length
      idx = s.indexOf(sep, start)
    }
    out += s.substring(start)
    out.toArray
  }

  /** Python `repr(float)` — shortest decimal string that round-trips, with
    * Python's positional/exponential switch (exp < -4 or >= 16). Needed for
    * the canonical `str(value)` rendering of float-typed kvs (R4).
    */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    // Shortest round-tripping significand: round to p significant digits for
    // growing p; the nearest p-digit decimal is the only candidate at that p.
    val exact = new JBigDecimal(d)
    var p = 1
    var short: JBigDecimal = null
    while (short == null && p <= 17) {
      val cand = exact.round(new MathContext(p, RoundingMode.HALF_EVEN))
      if (cand.doubleValue() == d) short = cand
      p += 1
    }
    val r = short.stripTrailingZeros()
    val digits = r.unscaledValue().abs().toString
    val adjExp = digits.length - 1 - r.scale() // exponent of leading digit
    val neg = d < 0
    val sb = new StringBuilder(if (neg) "-" else "")
    if (adjExp >= -4 && adjExp < 16) {
      if (adjExp >= digits.length - 1) {
        // integral value: digits then zeros then ".0"
        sb.append(digits)
        var k = digits.length - 1
        while (k < adjExp) { sb.append('0'); k += 1 }
        sb.append(".0")
      } else if (adjExp >= 0) {
        sb.append(digits.substring(0, adjExp + 1)).append('.')
          .append(digits.substring(adjExp + 1))
      } else {
        sb.append("0.")
        var k = -1
        while (k > adjExp) { sb.append('0'); k -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.substring(0, 1))
      if (digits.length > 1) sb.append('.').append(digits.substring(1))
      sb.append('e')
      sb.append(if (adjExp < 0) '-' else '+')
      val ae = math.abs(adjExp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    }
    sb.toString
  }

  /** Hex digest helpers (reference uses md5[:8] and sha1[:12] hex). */
  def md5Hex(s: String): String = hex(digest("MD5", s))
  def sha1Hex(s: String): String = hex(digest("SHA-1", s))
  def sha256Hex(s: String): String = hex(digest("SHA-256", s))

  private def digest(algo: String, s: String): Array[Byte] =
    java.security.MessageDigest.getInstance(algo)
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
