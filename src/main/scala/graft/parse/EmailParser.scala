package graft.parse

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}
import graft.model.{LayoutElement, SectionOut}
import scala.collection.mutable

/** From-scratch RFC-822/MIME parser matching CPython's `email` stdlib on the
  * corpus subset (reference: `src/normalization/extractors/email_extractor.py`).
  *
  * Verified-by-execution parity points (see EmailParserSpec):
  *  - header block ends at the first blank line; CRLF and LF both accepted;
  *  - header value = text after ':' with LEADING whitespace stripped only
  *    (trailing spaces kept), first occurrence wins, names case-insensitive;
  *  - singlepart `get_payload(decode=True)` = raw body bytes with the
  *    content-transfer-encoding (base64 / quoted-printable) applied;
  *  - multipart: parts delimited by FULL `--boundary` lines (trailing
  *    spaces/tabs only; a missing `--boundary--` terminator still yields
  *    the open part); the line terminator before a boundary belongs to the
  *    delimiter; text/plain payloads are concatenated in document order
  *    with NO separator (`email_extractor.py:76-85`);
  *  - decode with charset (param, lowercased, default utf-8), errors ignored.
  *
  * Scope (SURVEY §7.3 R5): no folded headers, no nested multiparts, no
  * message/rfc822 — the corpus generator stays inside this subset; anything
  * else routes to the error channel upstream.
  */
object EmailParser {

  final case class Parsed(
      headers: Map[String, String], // lowercased name -> first value
      fullText: String,
      layout: Seq[LayoutElement],
      isMultipart: Boolean)

  private val HeaderFields = Seq("From", "To", "Subject", "Date", "Cc", "Bcc")

  def parse(raw: String): Parsed = {
    val (headerLines, body) = splitHeadersBody(raw)
    val allHeaders = parseHeaders(headerLines)
    // _extract_headers: only the six fields, lowercased keys, first value;
    // the reference's `if value:` (email_extractor.py:64) drops a header
    // whose value is empty — 'Subject:\n' contributes nothing. Non-ASCII
    // values render through the unknown-8bit Header path (pyHeaderStr).
    val headers = HeaderFields.flatMap { f =>
      allHeaders.get(f.toLowerCase).filter(_.nonEmpty)
        .map(v => f.toLowerCase -> pyHeaderStr(v))
    }.toMap
    val ctype = contentType(allHeaders)
    val declaredMultipart = ctype.startsWith("multipart/") &&
      param(allHeaders.getOrElse("content-type", ""), "boundary").isDefined
    // A declared boundary that never OPENS a part is CPython's
    // StartBoundaryNotFoundDefect: the payload stays a string,
    // is_multipart() returns False, and the reference's singlepart branch
    // decodes it with the top-level CTE/charset (verified live). The
    // surviving payload is the preamble — everything before the first
    // closing-terminator line if one exists (its preceding line terminator
    // KEPT, unlike a real part flush), else the whole body.
    val parts =
      if (declaredMultipart)
        partsOf(body, param(allHeaders("content-type"), "boundary").get)
      else Seq.empty
    val multipart = declaredMultipart && parts.nonEmpty
    val bodyText =
      if (multipart) {
        val sb = new StringBuilder
        parts.foreach { part =>
          val (ph, pb) = splitHeadersBody(part)
          val pHeaders = parseHeaders(ph)
          if (contentType(pHeaders) == "text/plain") {
            sb.append(decodePayload(pb, pHeaders))
          }
        }
        PyCompat.pyStrip(sb.toString)
      } else if (declaredMultipart) {
        val boundary = param(allHeaders("content-type"), "boundary").get
        PyCompat.pyStrip(
          decodePayload(noStartBoundaryPayload(body, boundary), allHeaders))
      } else {
        PyCompat.pyStrip(decodePayload(body, allHeaders))
      }
    val fullText = createFullText(headers, bodyText)
    val layout = createLayout(headers, bodyText)
    Parsed(headers, fullText, layout, multipart)
  }

  /** The payload CPython leaves behind when a declared boundary never opens
    * a part: the text before the first closing-terminator line (`--b--` +
    * optional ws as a full line), or the whole body when no such line
    * exists. The line terminator BEFORE the end line stays in the payload
    * ('pre\n--b--\nep' → 'pre\n'; verified live), unlike a real part flush
    * where it belongs to the delimiter.
    */
  private def noStartBoundaryPayload(body: String, boundary: String): String = {
    val delim = "--" + boundary + "--"
    var i = 0
    val n = body.length
    while (i < n) {
      val nl = body.indexOf('\n', i)
      val lineEnd = if (nl < 0) n else nl
      val lineRaw = body.substring(i, lineEnd)
      val line = if (lineRaw.endsWith("\r")) lineRaw.dropRight(1) else lineRaw
      if (line.startsWith(delim) &&
        line.substring(delim.length).forall(c => c == ' ' || c == '\t'))
        return body.substring(0, i)
      if (nl < 0) return body
      i = nl + 1
    }
    body
  }

  /** Split raw message into header lines and body. Header lines carry the
    * terminator that FOLLOWED each line ("\n", "\r\n", or "" at EOF) —
    * folded continuations must re-embed the raw terminator verbatim,
    * exactly as Python's compat32 accessor renders them ('one\r\n two' for
    * CRLF mail; verified live).
    *
    * The header block ends at the first blank line — or, like CPython's
    * FeedParser, at the first non-continuation line WITHOUT a ':' (a
    * missing-separator defect): that line and everything after it IS the
    * body ('From: a\nBadLine\nTo: b\n\nx' → headers {from}, payload
    * 'BadLine\nTo: b\n\nx'; verified live). A first line starting with
    * "From " is the Unix envelope line: consumed, neither header nor body.
    */
  private def splitHeadersBody(raw: String): (Seq[(String, String)], String) = {
    val lines = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var first = true
    val n = raw.length
    while (i < n) {
      val nl = raw.indexOf('\n', i)
      val (lineEnd, next) = if (nl < 0) (n, n) else (nl, nl + 1)
      val contentEnd =
        if (lineEnd > i && raw.charAt(lineEnd - 1) == '\r') lineEnd - 1 else lineEnd
      val line = raw.substring(i, contentEnd)
      if (line.isEmpty) return (lines.toSeq, raw.substring(next))
      val continuation = line.charAt(0) == ' ' || line.charAt(0) == '\t'
      if (first && line.startsWith("From ")) {
        () // Unix envelope line: swallowed (msg.get_unixfrom(); verified)
      } else if (!continuation && line.indexOf(':') < 0) {
        return (lines.toSeq, raw.substring(i)) // defect: body starts HERE
      } else {
        val term = if (nl < 0) "" else if (contentEnd < lineEnd) "\r\n" else "\n"
        lines += (line -> term)
      }
      first = false
      i = next
    }
    (lines.toSeq, "")
  }

  /** Parse header lines: name ':' value(lstripped of spaces/tabs). First
    * occurrence wins. A line starting with space/tab is a FOLDED
    * continuation: Python keeps the fold VERBATIM in the value —
    * previous line's raw terminator + the raw continuation line
    * ('Subject: a\n b' → value 'a\n b'; verified against the stdlib).
    */
  private def parseHeaders(lines: Seq[(String, String)]): Map[String, String] = {
    val m = mutable.LinkedHashMap.empty[String, String]
    var lastStored: String = null // header this line's value landed in
    var prevTerm: String = "\n"
    lines.foreach { case (line, term) =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        // continuation: append to the header whose line directly precedes
        // (if that line was a dropped duplicate, the fold vanishes with it
        // — matching first-occurrence-wins)
        if (lastStored != null) m(lastStored) = m(lastStored) + prevTerm + line
      } else {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val name = line.substring(0, colon).toLowerCase
          var v = line.substring(colon + 1)
          var k = 0
          while (k < v.length && (v.charAt(k) == ' ' || v.charAt(k) == '\t')) k += 1
          v = v.substring(k)
          if (!m.contains(name)) { m(name) = v; lastStored = name }
          else lastStored = null
        } else lastStored = null
      }
      prevTerm = term
    }
    m.toMap
  }

  /** Python renders a header whose raw value contains non-ASCII bytes as an
    * unknown-8bit `Header` object: `str()` replaces each non-ASCII BYTE of
    * the utf-8 encoding with U+FFFD (verified live: '東京都' → 9 '�').
    * ASCII headers pass through untouched.
    */
  private def pyHeaderStr(v: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < v.length) { if (v.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) v
    else {
      val sb = new StringBuilder(v.length)
      i = 0
      while (i < v.length) {
        val cp = v.codePointAt(i)
        val n = Character.charCount(cp)
        if (cp < 128) sb.append(v.charAt(i))
        else {
          val nBytes = new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8).length
          (0 until nBytes).foreach(_ => sb.append('�'))
        }
        i += n
      }
      sb.toString
    }
  }

  /** Lowercased maintype/subtype; default text/plain. CPython's
    * `get_content_type` demands EXACTLY one '/' ('text/plain/x' counts 2 →
    * text/plain; verified live) and strips Python-style (NBSP included),
    * not Java-trim-style.
    */
  private def contentType(headers: Map[String, String]): String =
    headers.get("content-type") match {
      case Some(v) =>
        val main = PyCompat.pyStrip(v.split(";", 2)(0)).toLowerCase
        if (main.count(_ == '/') == 1) main else "text/plain"
      case None => "text/plain"
    }

  /** Extract a Content-Type parameter (e.g. boundary, charset); value may
    * be quoted. Python's `get_param` STRIPS the parameter name, so
    * 'boundary = "b"' is a valid boundary (verified live) — match on the
    * stripped name, not a prefix of the raw segment.
    */
  private def param(ctypeValue: String, name: String): Option[String] = {
    ctypeValue.split(";").iterator.drop(1).flatMap { seg =>
      val eq = seg.indexOf('=')
      if (eq < 0) None
      else if (PyCompat.pyStrip(seg.substring(0, eq)).toLowerCase != name) None
      else {
        val v = PyCompat.pyStrip(seg.substring(eq + 1))
        Some(
          if (v.length >= 2 && v.head == '"' && v.last == '"')
            v.substring(1, v.length - 1)
          else v)
      }
    }.nextOption()
  }

  /** Split a multipart body into part strings, with CPython FeedParser's
    * boundary recognition (all verified live):
    *
    *  - a boundary is a FULL line: `--boundary` followed only by optional
    *    spaces/tabs ('--bXYZ' is content, '--b ' is a boundary);
    *  - the closing terminator is `--boundary--` + optional spaces/tabs
    *    ('--b--extra' is content);
    *  - the line break preceding a boundary belongs to the delimiter;
    *  - a missing closing terminator still yields the open part, with
    *    exactly ONE trailing line terminator removed at EOF.
    */
  private def partsOf(body: String, boundary: String): Seq[String] = {
    val delim = "--" + boundary
    val parts = mutable.ArrayBuffer.empty[String]

    def isWsOnly(s: String): Boolean = s.forall(c => c == ' ' || c == '\t')
    // 0 = content line, 1 = part delimiter, 2 = closing terminator
    def kind(line: String): Int =
      if (!line.startsWith(delim)) 0
      else {
        val rest = line.substring(delim.length)
        if (isWsOnly(rest)) 1
        else if (rest.startsWith("--") && isWsOnly(rest.substring(2))) 2
        else 0
      }
    def flush(endRaw: Int, partStart: Int): Unit = {
      // strip the single line terminator preceding the boundary (or EOF)
      var end = endRaw
      if (end > partStart && body.charAt(end - 1) == '\n') {
        end -= 1
        if (end > partStart && body.charAt(end - 1) == '\r') end -= 1
      }
      parts += body.substring(partStart, end)
    }

    var partStart = -1 // -1 => in preamble
    var i = 0
    val n = body.length
    while (i <= n) {
      val nl = body.indexOf('\n', i)
      val lineEnd = if (nl < 0) n else nl
      val lineRaw = body.substring(i, lineEnd)
      val line = if (lineRaw.endsWith("\r")) lineRaw.dropRight(1) else lineRaw
      kind(line) match {
        case 0 => ()
        case k =>
          if (partStart >= 0) flush(i, partStart)
          if (k == 2) return parts.toSeq
          partStart = if (nl < 0) n else nl + 1
      }
      if (nl < 0) i = n + 1 else i = nl + 1
    }
    // EOF with no closing terminator: the open part still counts
    if (partStart >= 0) flush(n, partStart)
    parts.toSeq
  }

  /** Apply content-transfer-encoding then charset-decode, errors ignored
    * (`email_extractor.py:76-93`).
    */
  private def decodePayload(body: String, headers: Map[String, String]): String = {
    val cte = headers.getOrElse("content-transfer-encoding", "").trim.toLowerCase
    val charset = headers.get("content-type")
      .flatMap(param(_, "charset")).map(_.toLowerCase).getOrElse("utf-8")
    val bytes: Array[Byte] = cte match {
      case "base64" =>
        // Python's b64decode(validate=False) DISCARDS non-alphabet chars
        // then decodes, tolerating a truncated final quantum ('YWJ' → 'ab',
        // '%%%%' → b''; verified live) — java's MIME decoder has exactly
        // those semantics, the strict decoder does not
        try java.util.Base64.getMimeDecoder.decode(body)
        catch { case _: IllegalArgumentException => body.getBytes(StandardCharsets.UTF_8) }
      case "quoted-printable" => decodeQp(body)
      case _ => body.getBytes(StandardCharsets.UTF_8)
    }
    decodeIgnore(bytes, charset)
  }

  /** Python quopri.decodestring ≡ binascii.a2b_qp. The malformed-escape
    * cases follow the C implementation exactly (each verified live):
    * `=\n` soft break; `=\r` consumes the REST OF THE LINE including its
    * `\n` ('a=\rXYZ\nb' → 'ab'); `==` emits one '=' and consumes both
    * ('a==3Db' → 'a=3Db'); a trailing `=` at EOF is dropped; any other
    * invalid escape emits '=' literally WITHOUT consuming the next byte
    * ('a=4Z' → 'a=4Z', 'a= \nb' → 'a= \nb').
    */
  private def decodeQp(s: String): Array[Byte] = {
    val in = s.getBytes(StandardCharsets.UTF_8)
    val n = in.length
    val out = new java.io.ByteArrayOutputStream(n)
    var i = 0
    while (i < n) {
      val b = in(i)
      if (b == '=') {
        if (i + 1 >= n) i = n // trailing '=' dropped
        else {
          val c1 = in(i + 1)
          if (c1 == '\n') i += 2
          else if (c1 == '\r') {
            i += 2
            while (i < n && in(i) != '\n') i += 1
            if (i < n) i += 1
          } else if (c1 == '=') { out.write('='); i += 2 }
          else if (i + 2 < n && isHex(c1) && isHex(in(i + 2))) {
            out.write((hexVal(c1) << 4) | hexVal(in(i + 2)))
            i += 3
          } else { out.write(b); i += 1 }
        }
      } else { out.write(b); i += 1 }
    }
    out.toByteArray
  }

  private def isHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'F') || (b >= 'a' && b <= 'f')
  private def hexVal(b: Byte): Int =
    if (b <= '9') b - '0' else (b & 0xdf) - 'A' + 10

  /** Python `encodings.normalize_encoding` on a lowercased name (codecs.c
    * lowercases before the search function runs): alphanumerics and '.'
    * break punctuation runs, any run of other chars collapses to ONE '_',
    * no leading '_'. NON-ASCII alphanumerics clear the punctuation flag but
    * are NOT emitted (CPython skips them without marking punctuation:
    * 'latiné1' → 'latin1', not 'latin_1'; 'a é b' → 'a__b' — both verified
    * live). "Alphanumeric" is Python's `str.isalnum` = letters plus
    * Nd/Nl/No number categories — `Character.isLetterOrDigit` alone misses
    * Nl/No ('³', 'Ⅻ'). Java 17's Unicode tables predate CPython 3.11's by
    * one major version; the 56 BMP letters added in between (Arabic
    * Extended-B U+0870-U+088E plus scattered singletons, enumerated by an
    * exhaustive live diff of `str.isalnum` vs `Character.getType` over the
    * whole BMP) are carried in [[Unicode14Letters]], so the predicate now
    * matches CPython on EVERY BMP codepoint — zero known skew
    * (`EmailNormalizeSpec` pins a live-CPython fixture over all 17 ranges).
    */
  private[parse] val Unicode14Letters: Array[(Int, Int)] = Array(
    (0x0870, 0x0887), (0x0889, 0x088e), (0x08b5, 0x08b5), (0x08c8, 0x08c9),
    (0x0c5d, 0x0c5d), (0x0cdd, 0x0cdd), (0x170d, 0x170d), (0x171f, 0x171f),
    (0x1b4c, 0x1b4c), (0x2c2f, 0x2c2f), (0x2c5f, 0x2c5f), (0x9ffd, 0x9fff),
    (0xa7c0, 0xa7c1), (0xa7d0, 0xa7d1), (0xa7d3, 0xa7d3), (0xa7d5, 0xa7d9),
    (0xa7f2, 0xa7f4))

  private[parse] def pyNormalizeCharset(name: String): String = {
    def isPyAlnum(c: Char): Boolean = Character.isLetter(c) || {
      val t = Character.getType(c)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    } || Unicode14Letters.exists(r => c >= r._1 && c <= r._2)
    val sb = new StringBuilder(name.length)
    var punct = false
    name.toLowerCase.foreach { c =>
      if (isPyAlnum(c) || c == '.') {
        if (punct && sb.nonEmpty) sb.append('_')
        if (c < 128) sb.append(c)
        punct = false
      } else punct = true
    }
    sb.toString
  }

  /** Python codec aliases → Java charset names, keyed on the
    * [[pyNormalizeCharset]] form. Python's codec registry resolves many
    * spellings Java's `Charset.forName` rejects (`latin-1`, `utf_8`,
    * `macintosh`, …) — without this table those parts would wrongly decode
    * to "" while the reference decodes them. Entries derive from executing
    * `codecs.lookup` on the alias set (each maps to a codec whose decoder
    * agrees with the Java charset on valid input; errors='ignore' drops
    * invalid input on both sides). utf-7 (no Java decoder) and BOM-less
    * utf-16/utf-32 (Python defaults LE, Java BE) bypass this table — they
    * decode through the from-scratch CPython twins in [[PyCompat]]
    * (`pyDecodeUtf7Ignore` / `pyDecodeUtf16Ignore` / `pyDecodeUtf32Ignore`),
    * closing the last two known charset residuals.
    */
  private val PyCharsetAliases: Map[String, String] = Map(
    // iso8859-1 family (Python canonical latin_1)
    "latin_1" -> "ISO-8859-1", "latin1" -> "ISO-8859-1", "latin" -> "ISO-8859-1",
    "l1" -> "ISO-8859-1", "8859" -> "ISO-8859-1", "cp819" -> "ISO-8859-1",
    "iso_8859_1" -> "ISO-8859-1", "iso8859_1" -> "ISO-8859-1", "iso8859" -> "ISO-8859-1",
    // other iso8859 parts + their language aliases
    "latin2" -> "ISO-8859-2", "l2" -> "ISO-8859-2",
    "iso_8859_2" -> "ISO-8859-2", "iso8859_2" -> "ISO-8859-2",
    "cyrillic" -> "ISO-8859-5", "iso_8859_5" -> "ISO-8859-5", "iso8859_5" -> "ISO-8859-5",
    "arabic" -> "ISO-8859-6", "iso_8859_6" -> "ISO-8859-6", "iso8859_6" -> "ISO-8859-6",
    "greek" -> "ISO-8859-7", "iso_8859_7" -> "ISO-8859-7", "iso8859_7" -> "ISO-8859-7",
    "hebrew" -> "ISO-8859-8", "iso_8859_8" -> "ISO-8859-8", "iso8859_8" -> "ISO-8859-8",
    "latin9" -> "ISO-8859-15", "l9" -> "ISO-8859-15",
    "iso_8859_15" -> "ISO-8859-15", "iso8859_15" -> "ISO-8859-15",
    // unicode transforms
    "utf_8" -> "UTF-8", "utf8" -> "UTF-8", "u8" -> "UTF-8",
    "utf" -> "UTF-8", "cp65001" -> "UTF-8",
    "utf_16_le" -> "UTF-16LE", "utf_16_be" -> "UTF-16BE",
    "utf_32_le" -> "UTF-32LE", "utf_32_be" -> "UTF-32BE",
    // ascii
    "ascii" -> "US-ASCII", "us_ascii" -> "US-ASCII",
    "646" -> "US-ASCII", "cp367" -> "US-ASCII",
    // windows / dos / mac code pages
    "cp1252" -> "windows-1252", "windows_1252" -> "windows-1252",
    "1252" -> "windows-1252",
    "cp437" -> "IBM437", "437" -> "IBM437", "ibm437" -> "IBM437",
    "mac_roman" -> "x-MacRoman", "macroman" -> "x-MacRoman",
    "macintosh" -> "x-MacRoman",
    // cyrillic / cjk / thai
    "koi8_r" -> "KOI8-R",
    "shift_jis" -> "Shift_JIS", "sjis" -> "Shift_JIS", "s_jis" -> "Shift_JIS",
    "shiftjis" -> "Shift_JIS",
    "euc_jp" -> "EUC-JP", "eucjp" -> "EUC-JP",
    "gb2312" -> "GB2312",
    "gbk" -> "GBK", "936" -> "GBK", "cp936" -> "GBK",
    "big5" -> "Big5", "big5_tw" -> "Big5",
    "tis_620" -> "TIS-620")

  /** `bytes.decode(charset, errors='ignore')` — with the reference's
    * exception semantics: an UNKNOWN charset raises LookupError inside
    * `payload.decode`, which `_extract_body`'s per-part `except` swallows,
    * so that part contributes an EMPTY string (verified live:
    * charset=bogus-charset → body ''). Falling back to utf-8 here would
    * instead decode content the reference drops. Name resolution goes
    * through the Python alias table first ([[PyCharsetAliases]]) so
    * spellings Python accepts but Java rejects don't wrongly return "".
    */
  private[parse] def decodeIgnore(bytes: Array[Byte], charset: String): String = {
    val norm = pyNormalizeCharset(charset)
    // Python codecs with no (or differently-defaulted) Java twin decode
    // through the from-scratch CPython-parity decoders; alias keys are the
    // full sets from encodings.aliases for each codec
    norm match {
      case "utf_7" | "utf7" | "u7" | "unicode_1_1_utf_7" =>
        return PyCompat.pyDecodeUtf7Ignore(bytes)
      case "utf_16" | "utf16" | "u16" =>
        return PyCompat.pyDecodeUtf16Ignore(bytes)
      case "utf_32" | "utf32" | "u32" =>
        return PyCompat.pyDecodeUtf32Ignore(bytes)
      case _ => ()
    }
    val resolved = PyCharsetAliases.getOrElse(norm, charset)
    val cs = try Charset.forName(resolved) catch { case _: Exception => return "" }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => new String(bytes, StandardCharsets.UTF_8) }
  }

  /** `_create_full_text` (`email_extractor.py:96-109`): the four title-case
    * header lines (Cc/Bcc excluded), a blank line, then the body if any.
    */
  private def createFullText(headers: Map[String, String], body: String): String = {
    val lines = mutable.ArrayBuffer.empty[String]
    Seq("from", "to", "subject", "date").foreach { f =>
      headers.get(f).foreach(v => lines += s"${f.capitalize}: $v")
    }
    lines += ""
    if (body.nonEmpty) lines += body
    lines.mkString("\n")
  }

  /** `_create_layout_elements` (`email_extractor.py:111-148`): headers at
    * y=0,25,50,… (h=20, gap 5), separator +10, body height
    * max(100, len(body)//80*20); page 800x600.
    */
  private def createLayout(headers: Map[String, String], body: String): Seq[LayoutElement] = {
    val elems = mutable.ArrayBuffer.empty[LayoutElement]
    var y = 0
    val lh = 20
    val w = 800.0
    Seq("from", "to", "subject", "date").foreach { f =>
      headers.get(f).foreach { v =>
        elems += LayoutElement(s"${f.capitalize}: $v", "header",
          10, y, w - 10, y + lh, 1, w, 600.0)
        y += lh + 5
      }
    }
    y += 10
    if (body.nonEmpty) {
      val bh = math.max(100, (body.length / 80) * lh)
      elems += LayoutElement(body, "text", 10, y, w - 10, y + bh, 1, w, 600.0)
    }
    elems.toSeq
  }

  /** `convert_to_sections` (`email_extractor.py:150-190`). */
  def sections(layout: Seq[LayoutElement]): Seq[SectionOut] = {
    val headers = layout.filter(_.elementType == "header")
    val texts = layout.filter(_.elementType == "text")
    val out = mutable.ArrayBuffer.empty[SectionOut]
    if (headers.nonEmpty)
      out += SectionOut("Email Headers", headers.map(_.content).mkString("\n"), 1, Some(1))
    if (texts.nonEmpty)
      out += SectionOut("Email Body", texts.map(_.content).mkString("\n"), 1, Some(1))
    out.toSeq
  }
}
