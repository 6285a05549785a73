package graft.parse

import graft.model._
import scala.collection.mutable

/** The per-document extraction core: `InputDoc` → `ParsedDoc` with the
  * canonical output span sequence (FIXTURES.md §4). Pure function of the
  * input row + the broadcast signature/rule table — the statelessness that
  * makes span-equality testing and partition-granular resume sound
  * (SURVEY §3 E1). Runs inside `Dataset.mapPartitions` with per-partition
  * [[DocParser.Pooled]] state (precompiled regexes — the "pooled parsers" of
  * the north star).
  */
object DocParser {

  /** Standard letter-size page for text/html (`text_extractor.py:38`) and
    * for our synthesized pdf_page spans (reference uses pdfplumber page
    * dims, `pdf_extractor.py:41-48`; the corpus fixes 612x792).
    */
  private val PageW = 612.0
  private val PageH = 792.0

  /** Per-partition reusable parser state: compiled rule patterns + the
    * signature table. Build once per partition, reuse across rows.
    */
  final class Pooled(val table: Seq[CanonicalSignature]) {
    val globalRules: Seq[RulesEngine.CompiledRule] = RulesEngine.GlobalCompiled
    val overrideRules: Map[String, Seq[RulesEngine.CompiledRule]] =
      table.map(c => c.signatureId -> RulesEngine.compile(c.overrideRules)).toMap
  }

  def pooled(table: Seq[CanonicalSignature] = SignatureTable.Default): Pooled =
    new Pooled(table)

  def parse(doc: InputDoc, pool: Pooled): ParsedDoc =
    try parseUnsafe(doc, pool)
    catch {
      case e: Exception =>
        // Error channel (P2): unknown formats / malformed docs become rows,
        // not task failures.
        ParsedDoc(doc.doc_id, "unknown", Seq.empty, "", 0.0, "error",
          0, 0, 0, 0.0, 0L, 1, "", String.valueOf(e.getMessage))
    }

  private def parseUnsafe(doc: InputDoc, pool: Pooled): ParsedDoc = {
    val sorted = doc.spans.sortBy(_.offset)
    val media = sorted.filter(_.kind == "media")
    val content = sorted.filter(_.kind != "media")
    val kinds = content.map(_.kind).distinct

    val fileType = kinds match {
      case Seq("html") if content.length == 1 => "html"
      case Seq("text") if content.length == 1 => "text"
      case Seq("email") if content.length == 1 => "email"
      case Seq("pdf_page") => "pdf"
      case _ => throw new IllegalArgumentException(
        s"Unsupported file type: ${kinds.mkString(",")}")
    }

    // --- Extract: full text, layout elements, sections with anchor offsets.
    var fullText = ""
    var nBlocks = 0
    var nBlocksKept = 0
    var elements: Seq[LayoutElement] = Seq.empty
    // (anchorOffset, section) — anchor = offset of the input span that
    // produced the section, for media interleaving (FIXTURES.md §4 part 1).
    var sections: Seq[(Int, SectionOut)] = Seq.empty

    fileType match {
      case "text" | "html" =>
        val span = content.head
        val text = if (fileType == "html") HtmlStrip.strip(span.text) else span.text
        if (fileType == "html") {
          // R1 stage ii: density-based block labels, metrics-only — the
          // canonical text above stays reference-exact (golden equality).
          val blocks = BlockClassifier.classify(span.text)
          nBlocks = blocks.size
          nBlocksKept = blocks.count(_.kept)
        }
        fullText = text
        elements = Seq(LayoutElement(text, "text", 0, 0, PageW, PageH, 1, PageW, PageH))
        sections = Sectionizer.textSections(elements).map(span.offset -> _)

      case "email" =>
        val span = content.head
        val parsed = EmailParser.parse(span.text)
        fullText = parsed.fullText
        elements = parsed.layout
        sections = EmailParser.sections(parsed.layout).map(span.offset -> _)

      case "pdf" =>
        // Page number = 1-based rank among pdf_page spans in offset order
        // (`enumerate(pdf.pages, 1)`, pdf_extractor.py:35); full_text gets
        // "\n" appended per page even when the page is empty.
        val sb = new StringBuilder
        val elems = mutable.ArrayBuffer.empty[LayoutElement]
        val secs = mutable.ArrayBuffer.empty[(Int, SectionOut)]
        content.zipWithIndex.foreach { case (pageSpan, idx) =>
          val pageNum = idx + 1
          sb.append(pageSpan.text).append('\n')
          val strippedPage = PyCompat.pyStrip(pageSpan.text)
          if (strippedPage.nonEmpty) {
            val el = LayoutElement(strippedPage, "text", 0, 0, PageW, PageH,
              pageNum, PageW, PageH)
            elems += el
            secs += pageSpan.offset ->
              SectionOut(s"Page $pageNum", strippedPage, 1, Some(pageNum))
          }
        }
        fullText = sb.toString
        elements = elems.toSeq
        sections = secs.toSeq
    }

    // --- Signature (G1-G5): pure per-doc tokens matched against the
    // broadcast table.
    val toks = Signatures.tokens(elements)
    val m = Signatures.matchSignature(toks, pool.table)

    // --- Key-values: signature-cache reuse gate (G6) else rules (F8-F10).
    val kvs: Seq[KeyValue] =
      if (m.similarity >= Signatures.SameVersionThreshold &&
        m.matched.exists(_.cachedFields.nonEmpty)) {
        m.matched.get.cachedFields.map { case (k, v, num, conf) =>
          KeyValue(k, v, num, conf, "cache")
        }
      } else {
        val overrides = m.matched
          .map(c => pool.overrideRules(c.signatureId)).getOrElse(Seq.empty)
        RulesEngine.applyAll(pool.globalRules, overrides, m.signatureId, fullText)._1
      }

    // --- Chunks (C4) + aggregates (A1, C5).
    val chunks = Sectionizer.chunks(fullText, doc.doc_id)
    val ruleBased = kvs.count(_.method == "rule")
    val ruleCoverage = if (kvs.nonEmpty) ruleBased.toDouble / kvs.size else 0.0
    val pageCount = if (elements.nonEmpty) elements.map(_.page).max else 1

    // --- Canonical span flattening (FIXTURES.md §4).
    val out = mutable.ArrayBuffer.empty[OutSpan]
    // Part 1: media spans and section spans merged by (offset, tie-index);
    // input offsets are unique per doc, sections sharing an anchor keep
    // extractor order.
    val events = mutable.ArrayBuffer.empty[((Int, Int), OutSpan)]
    media.foreach(s => events += ((s.offset, 0) -> OutSpan("media", "", s.media_ref, -1)))
    sections.zipWithIndex.foreach { case ((anchor, sec), i) =>
      val ref = sec.bboxPage.map(p => s"page:$p").getOrElse("")
      events += ((anchor, i) -> OutSpan("section", sec.title + "\n" + sec.content, ref, -1))
    }
    events.sortBy(_._1).foreach(out += _._2)
    // Part 2: kv spans in extraction order.
    kvs.foreach(kv => out += OutSpan("kv", kv.key + "=" + kv.value, kv.method, -1))
    // Part 3: chunk spans in paragraph order.
    chunks.foreach(c => out += OutSpan("chunk", c.content, c.chunkId, -1))
    val spans = out.toSeq.zipWithIndex.map { case (s, i) => s.copy(order = i) }

    val contentHash = PyCompat.sha256Hex(
      sorted.map(s => s.kind + "\u0000" + s.text + "\u0000" + s.media_ref)
        .mkString("\u0001"))

    ParsedDoc(
      docId = doc.doc_id,
      fileType = fileType,
      spans = spans,
      signatureId = m.signatureId,
      sigSimilarity = m.similarity,
      sigEvent = m.event,
      nSections = sections.size,
      nKvs = kvs.size,
      nChunks = chunks.size,
      ruleCoverage = ruleCoverage,
      charCount = fullText.length.toLong,
      pageCount = pageCount,
      contentHash = contentHash,
      error = "",
      nBlocks = nBlocks,
      nBlocksKept = nBlocksKept)
  }

  /** Stable digest of a doc's span sequence — the compact golden-comparison
    * form used for large-SF goldens (full span JSON is kept only at
    * SF=0.001). Must match `tools/gen_goldens.py::span_hash`.
    */
  def spanHash(spans: Seq[OutSpan]): String =
    PyCompat.sha256Hex(spans.map(s =>
      s.kind + "\u0000" + s.text + "\u0000" + s.media_ref + "\u0000" + s.order)
      .mkString("\u001e"))
}
