package graft.tools

import graft.model.{InputDoc, Span}
import graft.parse.DocParser
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Debug CLI: parse one raw document through the extraction core and print
  * the canonical span sequence — the library's smallest runtime surface.
  *
  * Usage: runMain graft.tools.ParseOne <kind> <file> [doc_id]
  *   kind ∈ {text, html, email, pdf} (pdf: file holds pages separated by
  *   a form-feed line).
  */
object ParseOne {
  def main(args: Array[String]): Unit = {
    val kind = args(0)
    val path = args(1)
    val docId = if (args.length > 2) args(2) else "doc"
    val raw = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val spans = kind match {
      case "pdf" =>
        raw.split("\f").zipWithIndex.map { case (p, i) => Span("pdf_page", p, "", i + 1) }.toSeq
      case k => Seq(Span(k, raw, "", 0))
    }
    val parsed = DocParser.parse(InputDoc(docId, spans), DocParser.pooled())
    println(s"doc_id=${parsed.docId} file_type=${parsed.fileType} " +
      s"signature=${parsed.signatureId} sim=${parsed.sigSimilarity} event=${parsed.sigEvent}")
    println(s"sections=${parsed.nSections} kvs=${parsed.nKvs} chunks=${parsed.nChunks} " +
      s"rule_coverage=${parsed.ruleCoverage} pages=${parsed.pageCount} err='${parsed.error}'")
    parsed.spans.foreach { s =>
      val t = s.text.replace("\\", "\\\\").replace("\n", "\\n").replace("\r", "\\r")
      println(s"${s.order}\t${s.kind}\t${s.media_ref}\t$t")
    }
  }
}
