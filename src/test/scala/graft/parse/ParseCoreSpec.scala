package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Unit goldens traced from executing the reference at /root/reference
  * (pinned in FIXTURES.md §3). Pure tests — no SparkSession.
  */
class ParseCoreSpec extends AnyFunSuite {

  private def refFile(rel: String): String =
    new String(Files.readAllBytes(Paths.get("/root/reference", rel)), StandardCharsets.UTF_8)

  // --- F1 HTML strip quirks -------------------------------------------------
  test("html strip: non-greedy, newline-in-tag survives, ordered entities") {
    assert(HtmlStrip.strip("<b>Hello</b> &amp; <i\nclass=x>world</i>")
      == "Hello & <i\nclass=x>world")
    assert(HtmlStrip.strip("&amp;lt;") == "<") // double-unescape quirk
    assert(HtmlStrip.strip("  <p>x</p>  ") == "x")
    assert(HtmlStrip.strip("a &nbsp;&quot;b&#39;") == "a  \"b'")
  }

  test("html strip: style/script content retained (invoice_001.html golden)") {
    val html = refFile("datasets/indian_gst/samples/invoice_001.html")
    val text = HtmlStrip.strip(html)
    assert(text.startsWith("Tax Invoice - INV-2025-7448"))
    assert(text.length == 2768) // character_count golden (FIXTURES.md §3)
    assert(text.contains("body { font-family: Arial")) // CSS text kept
  }

  // --- F8/F9 rules on the reference sample invoice -------------------------
  test("rules: sample_invoice.txt six global-rule kvs") {
    val text = refFile("test_documents/sample_invoice.txt")
    val (kvs, applied) = RulesEngine.applyAll(
      RulesEngine.GlobalCompiled, Seq.empty, "", text)
    assert(applied == Seq("global"))
    val expect = Seq(
      ("invoice_number", "INV-12345", 0.9),
      ("total_amount", "1234.56", 0.8),
      ("date", "12/15/2024", 0.7),
      ("vendor_name", "Acme Corporation", 0.6),
      ("email", "billing@acme.com", 0.9),
      ("phone_number", "(555) 123-4567", 0.8))
    assert(kvs.map(k => (k.key, k.value, k.confidence)) == expect)
    assert(kvs.forall(_.method == "rule"))
    assert(kvs.find(_.key == "total_amount").get.valueNum.contains(1234.56))
  }

  test("coercion: python int/float parity") {
    assert(RulesEngine.coerce("1,234.56", "total_amount") == ("1234.56", Some(1234.56)))
    assert(RulesEngine.coerce("$42", "unit_price") == ("42", Some(42.0)))
    assert(RulesEngine.coerce("1234.", "total_amount") == ("1234.0", Some(1234.0)))
    assert(RulesEngine.coerce("0042", "total_amount") == ("42", Some(42.0)))
    assert(RulesEngine.coerce("12ab", "total_amount") == ("12ab", None)) // ValueError path
    assert(RulesEngine.coerce("1234.56", "vendor_name") == ("1234.56", None)) // not numeric field
  }

  // --- PyCompat -------------------------------------------------------------
  test("pyFloatRepr matches CPython repr") {
    assert(PyCompat.pyFloatRepr(1234.56) == "1234.56")
    assert(PyCompat.pyFloatRepr(1234.0) == "1234.0")
    assert(PyCompat.pyFloatRepr(8274.4) == "8274.4")
    assert(PyCompat.pyFloatRepr(0.1) == "0.1")
    assert(PyCompat.pyFloatRepr(0.0001) == "0.0001")
    assert(PyCompat.pyFloatRepr(1e16) == "1e+16")
    assert(PyCompat.pyFloatRepr(1.5e-5) == "1.5e-05")
    assert(PyCompat.pyFloatRepr(-2.5) == "-2.5")
    assert(PyCompat.pyFloatRepr(1.0 / 3.0) == "0.3333333333333333")
    assert(PyCompat.pyFloatRepr(2.0 / 3.0) == "0.6666666666666666")
    assert(PyCompat.pyFloatRepr(1e22) == "1e+22")
    assert(PyCompat.pyFloatRepr(123456789012345680.0) == "1.2345678901234568e+17")
  }

  test("pyStrip/pySplit parity") {
    assert(PyCompat.pyStrip("  x ") == "x") // NBSP+NEL stripped like Python
    assert(PyCompat.pyWordCount("  a  b\tc\n") == 3)
    assert(PyCompat.pySplitLit("a\n\n\nb", "\n\n").toSeq == Seq("a", "\nb"))
    assert(PyCompat.pySplitLit("", "\n\n").toSeq == Seq(""))
    assert(PyCompat.pySplitLit("a\n\n\n\nb", "\n\n").toSeq == Seq("a", "", "b"))
  }

  // --- G1-G3 signatures ------------------------------------------------------
  test("signature: sample invoice token + id golden 6824a895b97c") {
    val text = refFile("test_documents/sample_invoice.txt")
    val el = LayoutElement(text, "text", 0, 0, 612, 792, 1, 612.0, 792.0)
    val toks = Signatures.tokens(Seq(el))
    assert(toks == Seq(SigToken(1, "text", 0, 0, 1000, 1000, 43, "6e1b728d")))
    assert(Signatures.signatureId(toks) == "6824a895b97c")
  }

  test("jaccard: content_hash excluded, bounds") {
    val a = SigToken(1, "text", 0, 0, 1000, 1000, 43, "aaaaaaaa")
    val b = a.copy(contentHash = "bbbbbbbb")
    assert(Signatures.jaccard(Seq(a), Seq(b)) == 1.0)
    assert(Signatures.jaccard(Seq(a), Seq(a.copy(tokenCount = 44))) == 0.0)
    assert(Signatures.jaccard(Seq.empty, Seq.empty) == 0.0)
  }

  // --- F4-F7 email golden (FIXTURES.md §3) ----------------------------------
  private val emlRaw =
    "From: alice@example.com\r\nTo: bob@example.com\r\nSubject: Invoice INV-99\r\n" +
      "Date: Mon, 1 Jan 2024 10:00:00 +0000\r\nCc: carol@example.com\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n\r\n" +
      "Please find attached invoice INV-99.\r\nTotal: $42.00\r\n"

  test("email: full text golden") {
    val p = EmailParser.parse(emlRaw)
    val expected = "From: alice@example.com\nTo: bob@example.com\n" +
      "Subject: Invoice INV-99\nDate: Mon, 1 Jan 2024 10:00:00 +0000\n\n" +
      "Please find attached invoice INV-99.\r\nTotal: $42.00"
    assert(p.fullText == expected) // interior \r\n kept, ends stripped
    assert(p.headers("cc") == "carol@example.com") // parsed but excluded from full text
  }

  test("email: layout geometry golden") {
    val p = EmailParser.parse(emlRaw)
    assert(p.layout.length == 5)
    assert(p.layout.take(4).map(e => (e.y1, e.y2)) ==
      Seq((0.0, 20.0), (25.0, 45.0), (50.0, 70.0), (75.0, 95.0)))
    val body = p.layout.last
    assert(body.y1 == 110.0 && body.y2 == 210.0) // height max(100, len//80*20)=100
    val secs = EmailParser.sections(p.layout)
    assert(secs.map(_.title) == Seq("Email Headers", "Email Body"))
    assert(secs.head.content.startsWith("From: alice@example.com\nTo: "))
  }

  test("email: multipart text/plain concat + base64 + qp") {
    val mp = "From: x@y.z\nContent-Type: multipart/alternative; boundary=\"BNDRY\"\n" +
      "Subject: mp\n\npreamble\n--BNDRY\nContent-Type: text/plain; charset=\"utf-8\"\n\n" +
      "plain part one\n--BNDRY\nContent-Type: text/html\n\n<b>html</b>\n--BNDRY\n" +
      "Content-Type: text/plain\nContent-Transfer-Encoding: base64\n\n" +
      "aGVsbG8gYmFzZTY0IQ==\n--BNDRY--\nepilogue\n"
    val p = EmailParser.parse(mp)
    // payloads concatenated with no separator, final strip
    assert(p.fullText.endsWith("\n\nplain part onehello base64!"))
    val qp = "From: q@p.r\nContent-Type: text/plain; charset=utf-8\n" +
      "Content-Transfer-Encoding: quoted-printable\n\nTotal =3D $42.00=\n more\n"
    assert(EmailParser.parse(qp).fullText.endsWith("\n\nTotal = $42.00 more"))
  }

  test("email: header trailing spaces kept, first duplicate wins") {
    val p = EmailParser.parse("From: a@b.com  \nFROM: z@z.z\nTo:\tc@d\n\nx")
    assert(p.headers("from") == "a@b.com  ")
    assert(p.headers("to") == "c@d")
  }

  // --- C1-C5 sectionize/chunk -----------------------------------------------
  test("sections: single para keeps full content; multi para per-paragraph") {
    val single = LayoutElement("\n\nhello world\n\n", "text", 0, 0, 612, 792, 1, 612, 792)
    val s1 = Sectionizer.textSections(Seq(single))
    assert(s1 == Seq(SectionOut("Document Content", "\n\nhello world\n\n", 1, None)))
    val multi = LayoutElement("p1\n\np2\n\np3", "text", 0, 0, 612, 792, 1, 612, 792)
    assert(Sectionizer.textSections(Seq(multi)).map(_.title)
      == Seq("Section 1", "Section 2", "Section 3"))
    assert(Sectionizer.textSections(
      Seq(LayoutElement("", "text", 0, 0, 612, 792, 1, 612, 792))).isEmpty)
  }

  test("chunks: sample invoice 4 chunks with %03d ids and word counts") {
    val text = refFile("test_documents/sample_invoice.txt")
    val cs = Sectionizer.chunks(text, "d1")
    assert(cs.length == 4)
    assert(cs.head.content == "Sample Invoice Document")
    assert(cs.head.chunkId == "d1_chunk_000")
    assert(cs.head.tokens == 3)
    assert(cs.last.chunkId == "d1_chunk_003")
  }

  // --- End-to-end DocParser on the sample text doc (FIXTURES.md §4 worked ex.)
  test("docparser: worked example span sequence") {
    val text = refFile("test_documents/sample_invoice.txt")
    val doc = InputDoc("d1", Seq(Span("text", text, "", 0)))
    val parsed = DocParser.parse(doc, DocParser.pooled())
    assert(parsed.error.isEmpty)
    assert(parsed.fileType == "text")
    val spans = parsed.spans
    assert(spans.map(_.order) == spans.indices)
    assert(spans.take(4).forall(_.kind == "section"))
    assert(spans(0).text.startsWith("Section 1\n"))
    assert(spans(4) == OutSpan("kv", "invoice_number=INV-12345", "rule", 4))
    assert(spans(5) == OutSpan("kv", "total_amount=1234.56", "rule", 5))
    assert(spans.slice(4, 10).forall(_.kind == "kv"))
    assert(spans.slice(10, 14).forall(_.kind == "chunk"))
    assert(spans(10).media_ref == "d1_chunk_000")
    assert(parsed.nKvs == 6 && parsed.nChunks == 4 && parsed.nSections == 4)
    assert(parsed.ruleCoverage == 1.0)
    assert(parsed.signatureId == "6824a895b97c") // new_family -> own id
    assert(parsed.sigSimilarity == 1.0 && parsed.sigEvent == "new_family")
  }

  test("docparser: media interleaving and pdf pages") {
    val doc = InputDoc("d2", Seq(
      Span("media", "", "img://a", 0),
      Span("pdf_page", "page one text", "", 1),
      Span("media", "", "img://b", 2),
      Span("pdf_page", "", "", 3), // empty page: feeds full_text, no section
      Span("pdf_page", "page three", "", 4),
      Span("media", "", "img://c", 9)))
    val parsed = DocParser.parse(doc, DocParser.pooled())
    assert(parsed.fileType == "pdf")
    val s = parsed.spans
    assert(s(0) == OutSpan("media", "", "img://a", 0))
    assert(s(1) == OutSpan("section", "Page 1\npage one text", "page:1", 1))
    assert(s(2) == OutSpan("media", "", "img://b", 2))
    assert(s(3) == OutSpan("section", "Page 3\npage three", "page:3", 3))
    assert(s(4) == OutSpan("media", "", "img://c", 4))
    // full text "page one text\n\npage three\n" -> 2 chunks
    assert(parsed.nChunks == 2)
    assert(parsed.pageCount == 3)
  }

  test("docparser: signature families cache/override/email") {
    // CACHE family: any 14-word single-element text doc
    val cacheTxt = "Internal Routing Slip\n\nRef: R-1\nDesk: D7\nBatch: B2\n\n" +
      "Routed for archival storage processing."
    assert(PyCompat.pyWordCount(cacheTxt) == SignatureTable.CacheFamilyWordCount)
    val pc = DocParser.parse(InputDoc("c1", Seq(Span("text", cacheTxt, "", 0))), DocParser.pooled())
    assert(pc.sigEvent == "same_version" && pc.sigSimilarity == 1.0)
    assert(pc.signatureId == SignatureTable.CacheFamily.signatureId)
    val kvSpans = pc.spans.filter(_.kind == "kv")
    assert(kvSpans.map(_.media_ref).forall(_ == "cache"))
    assert(kvSpans.map(_.text) ==
      Seq("form_type=routing_slip", "department=archives", "priority=standard"))
    assert(pc.ruleCoverage == 0.0)

    // OVERRIDE family: 20-word invoice, rules + gstin/po overrides
    val ovTxt = "Vendor Services Invoice\n\nInvoice Number: INV-7\nTotal: $12.50\n" +
      "Date: 1/2/2024\nGSTIN: 29ABCDE1234F1Z5\nPO Number: PO-99\n\n" +
      "Payment due within thirty days."
    assert(PyCompat.pyWordCount(ovTxt) == SignatureTable.OverrideFamilyWordCount)
    val po = DocParser.parse(InputDoc("o1", Seq(Span("text", ovTxt, "", 0))), DocParser.pooled())
    assert(po.sigEvent == "same_version")
    assert(po.signatureId == SignatureTable.OverrideFamily.signatureId)
    val keys = po.spans.filter(_.kind == "kv").map(_.text.split("=")(0))
    assert(keys.contains("gstin") && keys.contains("po_number"))
    assert(keys.indexOf("gstin") > keys.indexOf("phone_number") ||
      !keys.contains("phone_number")) // overrides after globals

    // EMAIL family: 4 standard headers + body -> jaccard 0.8 -> new_version
    val pe = DocParser.parse(InputDoc("e1", Seq(Span("email", emlRaw, "", 0))), DocParser.pooled())
    assert(pe.sigEvent == "new_version")
    assert(pe.sigSimilarity == 0.8)
    assert(pe.signatureId == SignatureTable.EmailFamily.signatureId)
  }

  test("docparser: error channel on unknown kind") {
    val bad = DocParser.parse(InputDoc("x", Seq(Span("weird", "?", "", 0))), DocParser.pooled())
    assert(bad.error.nonEmpty && bad.spans.isEmpty && bad.fileType == "unknown")
  }
}
