package graft.corpus

import graft.model.{InputDoc, Span}

/** Deterministic synthetic corpus of interleaved text+media documents
  * (FIXTURES.md §1-2). Pure function docIndex → InputDoc via a counter-based
  * splittable PRNG (no shared Random — each row derives its own stream from
  * the doc index, SURVEY §7.1 step 3), so generation parallelizes across
  * executors and the Python golden harness sees the identical corpus
  * through parquet.
  *
  * Format mix ≈ 40% html / 25% text / 20% email / 15% pdf; ~30% of docs
  * carry 1-3 interleaved media spans; ~0.5% of docs are heavy-tail
  * multi-page PDFs (SURVEY §7.3 R8) so skew handling is actually exercised.
  * Text docs plant the CACHE (14-word) and OVERRIDE (20-word) signature
  * families; half the emails use the fixed 4-header shape that matches the
  * EMAIL canonical family (see [[graft.parse.SignatureTable]]).
  */
object CorpusGen {

  val Seed: Long = 0x6a61676e5261616aL // deterministic corpus seed

  def numDocs(sf: Double): Int = math.round(sf * 600000).toInt

  /** splitmix64 — counter-based, one independent stream per doc. */
  final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = java.lang.Math.floorMod(nextLong(), n.toLong).toInt
    def range(lo: Int, hi: Int): Int = lo + nextInt(hi - lo + 1) // inclusive
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def chance(p: Double): Boolean = nextDouble() < p
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  private val WordBank: IndexedSeq[String] = Vector(
    "the", "shipment", "ledger", "quarterly", "reconciliation", "warehouse",
    "dispatch", "manifest", "terms", "net", "thirty", "days", "remittance",
    "advice", "statement", "balance", "carried", "forward", "approved",
    "pending", "review", "audit", "finance", "operations", "purchase",
    "order", "receipt", "grand", "subtotal", "freight", "insurance",
    "handling", "charges", "customer", "account", "reference", "settlement",
    "wire", "transfer", "goods", "services", "rendered", "period", "closing")

  private val Vendors: IndexedSeq[String] = Vector(
    "Acme Corporation", "Globex Industrial", "Initech Solutions",
    "Umbrella Logistics", "Stark Supplies", "Wayne Freight",
    "Meridian Paper Co", "Cascade Metal Works", "Harbor Light Trading",
    "Bluefield Textiles")

  private val EmailNames: IndexedSeq[String] = Vector(
    "billing", "accounts", "finance", "ap", "invoices", "support",
    "orders", "admin")
  private val EmailDomains: IndexedSeq[String] = Vector(
    "acme.com", "globex.net", "initech.io", "umbrella.org", "stark.co",
    "meridianpaper.com", "cascade.example", "harborlight.biz")

  private val Dows = Vector("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val Mons = Vector("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private def commaGrouped(n: Long): String = {
    val s = n.toString
    val sb = new StringBuilder
    val off = s.length % 3
    var i = 0
    while (i < s.length) {
      if (i > 0 && (i - off) % 3 == 0) sb.append(',')
      sb.append(s.charAt(i))
      i += 1
    }
    sb.toString
  }

  private def amount(rng: Rng): String =
    s"${commaGrouped(rng.range(10, 99999).toLong)}.${f"${rng.nextInt(100)}%02d"}"

  private def dateStr(rng: Rng): String =
    s"${rng.range(1, 12)}/${rng.range(1, 28)}/${rng.range(2020, 2025)}"

  private def phone(rng: Rng): String =
    f"(${rng.range(200, 999)}%03d) ${rng.range(200, 999)}%03d-${rng.range(1000, 9999)}%04d"

  private def emailAddr(rng: Rng): String =
    s"${rng.pick(EmailNames)}${rng.nextInt(100)}@${rng.pick(EmailDomains)}"

  private def invNum(rng: Rng): String = s"INV-${rng.range(1000, 99999)}"

  private def sentence(rng: Rng, words: Int): String = {
    val w = (0 until words).map(_ => rng.pick(WordBank))
    w.head.capitalize + " " + w.tail.mkString(" ") + "."
  }

  private def paragraph(rng: Rng): String =
    (0 until rng.range(1, 3)).map(_ => sentence(rng, rng.range(5, 14))).mkString(" ")

  // ---- text docs -----------------------------------------------------------

  private def genericText(rng: Rng): String = {
    val sb = new StringBuilder
    sb.append(sentence(rng, 3).dropRight(1)) // title line, no period
    sb.append("\n\n")
    val fields = new StringBuilder
    if (rng.chance(0.8)) fields.append(s"Invoice Number: ${invNum(rng)}\n")
    if (rng.chance(0.8)) fields.append(s"Date: ${dateStr(rng)}\n")
    if (rng.chance(0.85)) fields.append(s"Total Amount: $$${amount(rng)}\n")
    if (fields.nonEmpty) { sb.append(fields.toString.stripSuffix("\n")); sb.append("\n\n") }
    val contact = new StringBuilder
    if (rng.chance(0.75)) contact.append(s"From: ${rng.pick(Vendors)}\n")
    if (rng.chance(0.7)) contact.append(s"Email: ${emailAddr(rng)}\n")
    if (rng.chance(0.7)) contact.append(s"Phone: ${phone(rng)}\n")
    if (contact.nonEmpty) { sb.append(contact.toString.stripSuffix("\n")); sb.append("\n\n") }
    sb.append((0 until rng.range(1, 3)).map(_ => paragraph(rng)).mkString("\n\n"))
    sb.toString
  }

  /** Fixed 14-word routing slip — matches SignatureTable.CacheFamily
    * (placeholders are single tokens so the word count is invariant).
    */
  private def cacheFamilyText(rng: Rng): String =
    s"Internal Routing Slip\n\nRef: R-${rng.range(100, 999)}\n" +
      s"Desk: D${rng.range(1, 9)}\nBatch: B${rng.range(10, 99)}\n\n" +
      "Routed for archival storage processing."

  /** Fixed 20-word invoice — matches SignatureTable.OverrideFamily. */
  private def overrideFamilyText(rng: Rng): String = {
    val gstin = (0 until 15).map(_ =>
      "0123456789ABCDEFGHJKLMNPQRSTUVWXYZ".charAt(rng.nextInt(34))).mkString
    s"Vendor Services Invoice\n\nInvoice Number: ${invNum(rng)}\n" +
      s"Total: $$${amount(rng)}\nDate: ${dateStr(rng)}\n" +
      s"GSTIN: $gstin\nPO Number: PO-${rng.range(100, 9999)}\n\n" +
      "Payment due within thirty days."
  }

  // ---- html docs -----------------------------------------------------------

  private def htmlDoc(rng: Rng): String = {
    val inv = invNum(rng)
    val vendor = rng.pick(Vendors)
    val rows = (0 until rng.range(1, 5)).map { _ =>
      val q = rng.range(1, 20)
      val rate = amount(rng)
      s"<tr><td>${rng.pick(WordBank)} ${rng.pick(WordBank)}</td>" +
        s"<td>$q</td><td>$rate</td><td>${amount(rng)}</td></tr>"
    }.mkString("\n")
    val oddTag = if (rng.chance(0.05))
      "<span\nclass=\"note\">expedited handling requested</span>" else ""
    val entity = if (rng.chance(0.3)) " &amp; Associates" else ""
    val nbsp = if (rng.chance(0.3)) "Amount&nbsp;due on receipt." else "Amount due on receipt."
    s"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Billing Statement $inv</title>
<style>
body { font-family: Helvetica, sans-serif; margin: 24px; }
table { border-collapse: collapse; width: 100%; }
td { padding: 4px 8px; border: 1px solid #ccc; }
</style>
</head>
<body>
<h1>Billing Statement</h1>
<p>Invoice Number: $inv<br>
Date: ${dateStr(rng)}</p>
<p>Company: $vendor$entity</p>
<table>
<tr><th>Item</th><th>Qty</th><th>Rate</th><th>Amount</th></tr>
$rows
</table>
<p class="total">Total Amount: $$${amount(rng)}</p>
<p>$nbsp $oddTag</p>
<p>Questions? Email ${emailAddr(rng)} or call ${phone(rng)}.</p>
</body>
</html>"""
  }

  // ---- email docs ----------------------------------------------------------

  private def rfcDate(rng: Rng): String =
    s"${rng.pick(Dows)}, ${rng.range(1, 28)} ${rng.pick(Mons)} ${rng.range(2020, 2025)} " +
      f"${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d +0000"

  private def emailBody(rng: Rng): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"Please find attached invoice ${invNum(rng)}."
    if (rng.chance(0.7)) parts += s"Total: $$${amount(rng)}"
    if (rng.chance(0.5)) parts += paragraph(rng)
    parts.mkString("\n")
  }

  private def emailDoc(rng: Rng): String = {
    val nl = if (rng.chance(0.7)) "\r\n" else "\n"
    val shape = rng.nextDouble()
    val sb = new StringBuilder
    if (shape < 0.5) {
      // family shape: all four headers, 3-word subject, single-part
      sb.append(s"From: ${emailAddr(rng)}$nl")
      sb.append(s"To: ${emailAddr(rng)}$nl")
      sb.append(s"Subject: Invoice ${invNum(rng)}$nl")
      sb.append(s"Date: ${rfcDate(rng)}$nl")
      if (rng.chance(0.3)) sb.append(s"Cc: ${emailAddr(rng)}$nl")
      sb.append(s"Content-Type: text/plain; charset=utf-8$nl$nl")
      if (rng.chance(0.9)) sb.append(emailBody(rng).replace("\n", nl)).append(nl)
    } else if (shape < 0.8) {
      // odd shape: random subject length, headers sometimes missing
      sb.append(s"From: ${emailAddr(rng)}$nl")
      if (rng.chance(0.8)) sb.append(s"To: ${emailAddr(rng)}$nl")
      val subjWords = (0 until rng.range(1, 6)).map(_ => rng.pick(WordBank)).mkString(" ")
      sb.append(s"Subject: $subjWords$nl")
      if (rng.chance(0.7)) sb.append(s"Date: ${rfcDate(rng)}$nl")
      if (rng.chance(0.2)) sb.append(s"Bcc: ${emailAddr(rng)}$nl")
      sb.append(nl)
      sb.append(emailBody(rng).replace("\n", nl)).append(nl)
    } else {
      // multipart with base64 / quoted-printable parts
      val b = s"part${rng.range(1000, 9999)}"
      sb.append(s"From: ${emailAddr(rng)}$nl")
      sb.append(s"To: ${emailAddr(rng)}$nl")
      sb.append(s"Subject: Invoice ${invNum(rng)}$nl")
      sb.append(s"Date: ${rfcDate(rng)}$nl")
      sb.append(s"""Content-Type: multipart/alternative; boundary="$b"$nl$nl""")
      sb.append(s"--$b$nl")
      val enc = rng.nextInt(3)
      val plain = emailBody(rng)
      if (enc == 0) {
        sb.append(s"Content-Type: text/plain; charset=utf-8$nl$nl")
        sb.append(plain.replace("\n", nl)).append(nl)
      } else if (enc == 1) {
        sb.append(s"Content-Type: text/plain; charset=utf-8$nl")
        sb.append(s"Content-Transfer-Encoding: base64$nl$nl")
        val b64 = java.util.Base64.getEncoder.encodeToString(
          plain.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        b64.grouped(60).foreach(line => sb.append(line).append(nl))
      } else {
        sb.append(s"Content-Type: text/plain; charset=utf-8$nl")
        sb.append(s"Content-Transfer-Encoding: quoted-printable$nl$nl")
        sb.append(plain.replace("=", "=3D").replace("\n", nl)).append(nl)
      }
      sb.append(s"--$b$nl")
      sb.append(s"Content-Type: text/html; charset=utf-8$nl$nl")
      sb.append(s"<p>see plain text part</p>$nl")
      sb.append(s"--$b--$nl")
    }
    sb.toString
  }

  // ---- pdf docs ------------------------------------------------------------

  private def pdfPages(rng: Rng): Seq[String] = {
    val heavy = rng.chance(0.03) // ~0.45% of all docs: the planted skew tail
    val n = if (heavy) rng.range(80, 250) else rng.range(1, 6)
    (1 to n).map { p =>
      if (rng.chance(0.08)) (if (rng.chance(0.5)) "" else "   \n  ")
      else {
        val sb = new StringBuilder
        if (p == 1 && rng.chance(0.6)) {
          sb.append(s"Invoice Number: ${invNum(rng)}\n")
          sb.append(s"Total Amount: $$${amount(rng)}\n\n")
        }
        sb.append((0 until rng.range(1, 3)).map(_ => paragraph(rng)).mkString("\n\n"))
        sb.toString
      }
    }
  }

  // ---- assembly ------------------------------------------------------------

  def gen(i: Long): InputDoc = {
    val rng = new Rng(Seed ^ (i * 0x9e3779b97f4a7c15L + 0x243f6a8885a308d3L))
    val docId = f"doc_$i%08d"
    val roll = rng.nextDouble()
    val content: Seq[(String, String)] =
      if (roll < 0.40) Seq("html" -> htmlDoc(rng))
      else if (roll < 0.65) {
        val sub = rng.nextDouble()
        val t = if (sub < 0.15) cacheFamilyText(rng)
        else if (sub < 0.30) overrideFamilyText(rng)
        else genericText(rng)
        Seq("text" -> t)
      } else if (roll < 0.85) Seq("email" -> emailDoc(rng))
      else pdfPages(rng).map("pdf_page" -> _)

    // interleave media spans at random insertion points (~30% of docs)
    val nMedia = if (rng.chance(0.3)) rng.range(1, 3) else 0
    val media = (0 until nMedia).map { k =>
      val mtype = rng.pick(Vector("img", "audio", "video"))
      val pos = rng.nextInt(content.length + 1) // insertion index
      (pos, s"media://$mtype/${docId}_$k")
    }.sortBy(_._1)

    assemble(docId, content, media)
  }

  /** Interleave media refs (at their content insertion indices) with the
    * content spans, assigning contiguous offsets — the ONE definition of
    * the corpus doc shape, shared with [[FuzzGen]] so the fuzz corpus can
    * never drift from the main corpus's span/offset semantics.
    */
  private[corpus] def assemble(
      docId: String,
      content: Seq[(String, String)],
      media: Seq[(Int, String)]): InputDoc = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
    var offset = 0
    var mIdx = 0
    content.zipWithIndex.foreach { case ((kind, text), ci) =>
      while (mIdx < media.length && media(mIdx)._1 <= ci) {
        spans += Span("media", "", media(mIdx)._2, offset)
        offset += 1; mIdx += 1
      }
      spans += Span(kind, text, "", offset)
      offset += 1
    }
    while (mIdx < media.length) {
      spans += Span("media", "", media(mIdx)._2, offset)
      offset += 1; mIdx += 1
    }
    InputDoc(docId, spans.toSeq)
  }
}
