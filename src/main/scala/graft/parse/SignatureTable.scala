package graft.parse

import graft.model.{CanonicalSignature, LayoutElement, Rule}

/** The deterministic broadcast signature/rule table — the north rule's
  * replacement for the reference's stateful signature store + LLM gap-fill
  * (`signatures.py:77-130`, `pipeline.py:148-181`). Three planted canonical
  * families exercise the reference's decision branches:
  *
  *  - CACHE family (fixed 14-word routing-slip text layout): similarity 1.0
  *    → same_version; `cachedFields` present → cached kvs emitted (method
  *    "cache"), rules skipped (G6, `pipeline.py:148-181`);
  *  - OVERRIDE family (fixed 20-word invoice text layout): similarity 1.0 →
  *    same_version, no cached fields → global rules + signature override
  *    rules (F10, `rules_engine.py:73-78`);
  *  - EMAIL family (the four standard header tokens): a doc with a body has
  *    5 tokens of which 4 match → Jaccard 0.8 → new_version; override rules
  *    apply (reference applies overrides for any returned match ≥ 0.70).
  *
  * Canonical tokens are derived from representative layout elements through
  * the same quantizer as real docs, so the table stays consistent with the
  * extractors by construction.
  */
object SignatureTable {

  /** Word-count invariants the corpus generator upholds. */
  val CacheFamilyWordCount = 14
  val OverrideFamilyWordCount = 20

  private def textElement(words: Int): LayoutElement = {
    val content = (1 to words).map(i => s"w$i").mkString(" ")
    LayoutElement(content, "text", 0, 0, 612, 792, 1, 612.0, 792.0)
  }

  /** The four fixed-shape email header elements (word counts 2/2/3/7 —
    * upheld by the corpus generator's email templates).
    */
  private def emailHeaderElements: Seq[LayoutElement] = {
    val reps = Seq(
      "From: sender@example.com", // 2 words
      "To: recipient@example.com", // 2 words
      "Subject: Invoice INV-0", // 3 words
      "Date: Mon, 1 Jan 2024 10:00:00 +0000") // 7 words
    reps.zipWithIndex.map { case (c, i) =>
      LayoutElement(c, "header", 10, i * 25, 790, i * 25 + 20, 1, 800.0, 600.0)
    }
  }

  val CacheFamily: CanonicalSignature = {
    val toks = Signatures.tokens(Seq(textElement(CacheFamilyWordCount)))
    CanonicalSignature(
      signatureId = Signatures.signatureId(toks),
      tokens = toks,
      cachedFields = Seq(
        ("form_type", "routing_slip", None, 0.95),
        ("department", "archives", None, 0.9),
        ("priority", "standard", None, 0.85)),
      overrideRules = Seq.empty)
  }

  val OverrideFamily: CanonicalSignature = {
    val toks = Signatures.tokens(Seq(textElement(OverrideFamilyWordCount)))
    CanonicalSignature(
      signatureId = Signatures.signatureId(toks),
      tokens = toks,
      cachedFields = Seq.empty,
      overrideRules = Seq(
        Rule("gstin", "GSTIN\\s*:?\\s*([0-9A-Z]{15})", 0.85, required = false),
        Rule("po_number", "(?:PO|P\\.O\\.)\\s*(?:number|no\\.?)?\\s*:?\\s*([A-Z0-9-]+)",
          0.75, required = false)))
  }

  val EmailFamily: CanonicalSignature = {
    val toks = Signatures.tokens(emailHeaderElements)
    CanonicalSignature(
      signatureId = Signatures.signatureId(toks),
      tokens = toks,
      cachedFields = Seq.empty,
      overrideRules = Seq(
        Rule("reply_to", "Reply-To\\s*:?\\s*([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+)",
          0.8, required = false)))
  }

  val Default: Seq[CanonicalSignature] = Seq(CacheFamily, OverrideFamily, EmailFamily)
}
