package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** CPython codec parity for the three from-scratch decoders (utf-7,
  * BOM-less-LE utf-16, utf-32): every case in the committed fixture was
  * produced by EXECUTING `bytes.decode(codec, errors='ignore')` live
  * (tools/gen_codec_fixture.py — 37 hand-picked branch cases + 4k
  * adversarial/random; the same generator at 68k cases matched with zero
  * mismatches in round 5). Expected strings are stored as UTF-16 code
  * units so the lone surrogates CPython's utf-7 decoder legitimately
  * emits compare exactly.
  */
class PyCompatCodecSpec extends AnyFunSuite {

  private def cases: Seq[(Array[Byte], String, String)] = {
    val in = getClass.getResourceAsStream("/goldens/codec_cases.tsv")
    assert(in != null, "codec_cases.tsv fixture missing")
    val dec = java.util.Base64.getDecoder
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { line =>
      val parts = line.split('\t')
      val (b64, codec, unitsHex) =
        (parts(0), parts(1), if (parts.length > 2) parts(2) else "")
      val want =
        if (unitsHex.isEmpty) ""
        else unitsHex.split(',').map(h => Integer.parseInt(h, 16).toChar).mkString
      (dec.decode(b64), codec, want)
    }.toSeq
  }

  test("utf-7 / utf-16 / utf-32 decode exactly as CPython with errors='ignore'") {
    var n = 0
    cases.foreach { case (bytes, codec, want) =>
      val got = codec match {
        case "utf_7" => PyCompat.pyDecodeUtf7Ignore(bytes)
        case "utf_16" => PyCompat.pyDecodeUtf16Ignore(bytes)
        case "utf_32" => PyCompat.pyDecodeUtf32Ignore(bytes)
      }
      assert(got == want,
        s"$codec ${java.util.Base64.getEncoder.encodeToString(bytes)}: " +
          s"got ${got.map(c => f"${c.toInt}%04x").mkString(",")} want " +
          want.map(c => f"${c.toInt}%04x").mkString(","))
      n += 1
    }
    assert(n > 4000, s"fixture unexpectedly small: $n")
  }

  test("decodeIgnore routes the python-only codec names to the twins") {
    // utf-7 body the reference decodes via Python's codec registry
    // (email_extractor.py:82-88); before round 5 these returned ""
    val utf7 = "Caf+AOk- +ANc- d+AOk-j+AOA- vu".getBytes("US-ASCII")
    assert(EmailParser.decodeIgnore(utf7, "utf-7") == "Café × déjà vu")
    assert(EmailParser.decodeIgnore(utf7, "u7") == "Café × déjà vu")
    assert(EmailParser.decodeIgnore(utf7, "unicode-1-1-utf-7") == "Café × déjà vu")
    // BOM-less utf-16/32 default LE like Python, not BE like Java
    assert(EmailParser.decodeIgnore(Array[Byte]('a', 0, 'b', 0), "utf-16") == "ab")
    assert(EmailParser.decodeIgnore(Array[Byte]('a', 0, 0, 0), "utf-32") == "a")
    // with a BOM both endiannesses still decode (consumed)
    assert(EmailParser.decodeIgnore(
      Array[Byte](0xFE.toByte, 0xFF.toByte, 0, 'a'), "utf-16") == "a")
  }
}
