package graft.model

/** Core data model for the extraction engine.
  *
  * Input shape follows the contract in FIXTURES.md §1: one row per document,
  * `spans` carrying the raw interleaved payloads. Output shape is the
  * canonical flattened span sequence (FIXTURES.md §4), the equality contract
  * against the reference parser (reference: `src/normalization/schema.py:90-124`).
  */

/** One raw input span. `kind` ∈ {html, text, email, pdf_page, media}.
  * `offset` totally orders spans within a doc; for `pdf_page` it is also the
  * page number when no media interleaves (page number is the 1-based rank of
  * the pdf_page span among pdf_page spans in offset order, matching
  * `pdf_extractor.py:35` `enumerate(pdf.pages, 1)`).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One input document row. */
final case class InputDoc(doc_id: String, spans: Seq[Span])

/** One canonical output span. `kind` ∈ {section, kv, chunk, media}. */
final case class OutSpan(kind: String, text: String, media_ref: String, order: Int)

/** Intermediate layout element, mirror of the reference's dict
  * (`text_extractor.py:35-42`, `email_extractor.py:121-146`,
  * `pdf_extractor.py:41-48`). Never a Spark column — lives only inside the
  * typed map.
  */
final case class LayoutElement(
    content: String,
    elementType: String, // 'text' | 'header'
    x1: Double, y1: Double, x2: Double, y2: Double,
    page: Int,
    pageWidth: Double,
    pageHeight: Double)

/** Extracted key-value (reference `schema.py:25-32`). `value` is the
  * canonical Python-`str()` rendering; `valueNum` carries the numeric form
  * when the reference would have held an int/float (R4 in SURVEY §7.3).
  */
final case class KeyValue(
    key: String,
    value: String,
    valueNum: Option[Double],
    confidence: Double,
    method: String) // "rule" | "cache"

/** Document section (reference `schema.py:35-42`). */
final case class SectionOut(
    title: String,
    content: String,
    level: Int,
    bboxPage: Option[Int]) // page of the bbox when present, else None

/** Chunk (reference `schema.py:54-63`). */
final case class ChunkOut(content: String, chunkId: String, tokens: Int)

/** Quantized structural token (reference `signatures.py:16-24`). */
final case class SigToken(
    page: Int,
    elementType: String,
    b1: Int, b2: Int, b3: Int, b4: Int,
    tokenCount: Int,
    contentHash: String)

/** One extraction rule (reference `rules/global_rules.yml` +
  * `rules_engine.py:82-112`).
  */
final case class Rule(
    fieldName: String,
    pattern: String,
    confidence: Double,
    required: Boolean)

/** A canonical signature in the broadcast signature table — the
  * deterministic replacement for the reference's stateful signature store
  * (`signatures.py:77-130`), per the north rule. `cachedFields` mirrors
  * `DocumentSignature.cached_fields` (`signatures.py:47`): when the match
  * similarity ≥ 0.90 these are emitted verbatim (method "cache") and rules
  * are skipped (`pipeline.py:148-181`).
  */
final case class CanonicalSignature(
    signatureId: String,
    tokens: Seq[SigToken],
    cachedFields: Seq[(String, String, Option[Double], Double)], // key, value, valueNum, confidence
    overrideRules: Seq[Rule])

/** Full parse result for one document (pre-flattening). */
final case class ParsedDoc(
    docId: String,
    fileType: String,
    spans: Seq[OutSpan],
    signatureId: String,
    sigSimilarity: Double,
    sigEvent: String, // same_version | new_version | new_family
    nSections: Int,
    nKvs: Int,
    nChunks: Int,
    ruleCoverage: Double,
    charCount: Long,
    pageCount: Int,
    contentHash: String,
    error: String, // "" when ok; error-channel rows carry the message
    nBlocks: Int = 0, // html only: text blocks seen by the block classifier
    nBlocksKept: Int = 0) // … of which labelled content (R1 stage ii)

/** Per-partition lineage/metrics row (north rule: "per-partition lineage +
  * metrics rows written alongside results").
  */
final case class PartitionMetrics(
    partitionId: Int,
    docsIn: Long,
    docsOk: Long,
    docsErr: Long,
    spansOut: Long,
    bytesIn: Long,
    wallMs: Long)
