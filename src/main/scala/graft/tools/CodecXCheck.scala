package graft.tools
import graft.parse.PyCompat
/** One-off cross-check driver: /tmp/codec_xcheck.tsv vs the PyCompat decoders. */
object CodecXCheck {
  def main(args: Array[String]): Unit = {
    val dec = java.util.Base64.getDecoder
    var n = 0; var bad = 0
    scala.io.Source.fromFile(args.headOption.getOrElse("/tmp/codec_xcheck.tsv")).getLines().foreach { line =>
      val Array(b64, codec, unitsHex) = line.split('\t') match {
        case Array(a, b) => Array(a, b, "")
        case arr => arr
      }
      val bytes = dec.decode(b64)
      val want = if (unitsHex.isEmpty) "" else unitsHex.split(',').map(h => Integer.parseInt(h, 16).toChar).mkString
      val got = codec match {
        case "utf_7" => PyCompat.pyDecodeUtf7Ignore(bytes)
        case "utf_16" => PyCompat.pyDecodeUtf16Ignore(bytes)
        case "utf_32" => PyCompat.pyDecodeUtf32Ignore(bytes)
      }
      n += 1
      if (got != want) {
        bad += 1
        if (bad <= 15) println(s"MISMATCH $codec b64=$b64 want=${want.map(c => f"${c.toInt}%04x").mkString(",")} got=${got.map(c => f"${c.toInt}%04x").mkString(",")}")
      }
    }
    println(s"$n cases, $bad mismatches")
  }
}
