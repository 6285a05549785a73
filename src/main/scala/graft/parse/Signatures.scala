package graft.parse

import graft.model.{CanonicalSignature, LayoutElement, SigToken}

/** Layout-signature computation and deterministic matching
  * (reference: `src/normalization/signatures.py`).
  *
  * Token quantization, signature-id hashing and Jaccard similarity are exact
  * ports of the reference's pure functions (`signatures.py:195-292`). The
  * stateful on-disk signature store is replaced — per the north rule — by a
  * fixed broadcast table of canonical signatures ([[SignatureTable]]); the
  * version-decision thresholds (`signatures.py:26-27`) are retained to
  * classify each doc as same_version / new_version / new_family.
  */
object Signatures {

  val SameVersionThreshold = 0.90
  val NewVersionThreshold = 0.70

  /** `_generate_tokens` (`signatures.py:195-228`): bbox normalized by page
    * dims, ×1000, Python `int()` truncation; md5(content)[:8]; word count.
    */
  def tokens(elements: Seq[LayoutElement]): Seq[SigToken] = elements.map { e =>
    val q = (v: Double, dim: Double, dflt: Int) =>
      if (dim > 0) ((v / dim) * 1000).toInt else dflt
    SigToken(
      page = e.page,
      elementType = e.elementType,
      b1 = q(e.x1, e.pageWidth, 0),
      b2 = q(e.y1, e.pageHeight, 0),
      b3 = q(e.x2, e.pageWidth, 1000),
      b4 = q(e.y2, e.pageHeight, 1000),
      tokenCount = if (e.content.nonEmpty) PyCompat.pyWordCount(e.content) else 0,
      contentHash = PyCompat.md5Hex(e.content).substring(0, 8))
  }

  /** Byte-exact replica of
    * `json.dumps([asdict(t) for t in tokens], sort_keys=True)`
    * (`signatures.py:267-272`): keys sorted alphabetically, separators
    * `", "` / `": "`, tuples as arrays. Verified against the live reference
    * id `6824a895b97c` (FIXTURES.md §3).
    */
  def canonicalJson(toks: Seq[SigToken]): String =
    toks.map { t =>
      s"""{"bbox_bucket": [${t.b1}, ${t.b2}, ${t.b3}, ${t.b4}], """ +
        s""""content_hash": "${t.contentHash}", """ +
        s""""element_type": "${t.elementType}", """ +
        s""""page": ${t.page}, "token_count": ${t.tokenCount}}"""
    }.mkString("[", ", ", "]")

  /** sha1-of-canonical-JSON; signature_id = first 12 hex chars. */
  def signatureId(toks: Seq[SigToken]): String =
    PyCompat.sha1Hex(canonicalJson(toks)).substring(0, 12)

  /** `_calculate_jaccard_similarity` (`signatures.py:243-265`): sets of
    * (page, element_type, bbox_bucket, token_count) — content_hash excluded;
    * 0.0 on empty union.
    */
  def jaccard(a: Seq[SigToken], b: Seq[SigToken]): Double = {
    def key(t: SigToken) = (t.page, t.elementType, t.b1, t.b2, t.b3, t.b4, t.tokenCount)
    val s1 = a.map(key).toSet
    val s2 = b.map(key).toSet
    val union = s1.union(s2).size
    if (union == 0) 0.0 else s1.intersect(s2).size.toDouble / union
  }

  final case class MatchResult(
      signatureId: String,
      similarity: Double,
      event: String, // same_version | new_version | new_family
      matched: Option[CanonicalSignature])

  /** Deterministic analog of `create_or_match_signature`
    * (`signatures.py:132-193`): argmax Jaccard over the broadcast canonical
    * table (G4); thresholds decide the event (G5); a brand-new signature
    * reports similarity 1.0 like the reference (`signatures.py:193`).
    */
  def matchSignature(toks: Seq[SigToken], table: Seq[CanonicalSignature]): MatchResult = {
    var best: CanonicalSignature = null
    var bestSim = 0.0
    table.foreach { c =>
      val sim = jaccard(toks, c.tokens)
      if (sim > bestSim) { bestSim = sim; best = c }
    }
    if (best != null && bestSim >= SameVersionThreshold)
      MatchResult(best.signatureId, bestSim, "same_version", Some(best))
    else if (best != null && bestSim >= NewVersionThreshold)
      MatchResult(best.signatureId, bestSim, "new_version", Some(best))
    else
      MatchResult(signatureId(toks), 1.0, "new_family", None)
  }
}
