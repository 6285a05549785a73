package graft.parse

import java.util.regex.Pattern

/** Boilerpipe-style main-content block classifier (north_star: "strips HTML
  * boilerplate with a … text-density + link-density DOM block classifier";
  * SURVEY §7.3 R1 stage ii).
  *
  * This is OUR added segmentation stage on top of the reference-exact strip
  * (HtmlStrip — which defines the canonical span text and golden equality):
  * the classifier segments the HTML into text blocks at block-level tag
  * boundaries, computes per-block word count, link density (words inside
  * `<a>` / words) and text density (words per 80-char wrapped line), and
  * labels each block content/boilerplate with the published
  * NumWordsRulesClassifier decision rule from the Boilerpipe paper
  * (Kohlschütter et al., WSDM 2010): a block is boilerplate when its link
  * density exceeds 1/3; otherwise it is content when — in the context of
  * its neighbours — it (or its successor) carries enough words, with
  * higher thresholds after a link-dense predecessor.
  *
  * The labels feed per-doc metrics (`n_blocks`/`n_blocks_kept`) and the
  * [[mainContent]] extraction surface; on boilerplate-free documents (the
  * deterministic corpus) the retained text is exactly the content the
  * reference-exact strip yields, keeping both R1 constraints honest.
  */
object BlockClassifier {

  final case class Block(
      text: String,
      words: Int,
      linkDensity: Double,
      textDensity: Double,
      kept: Boolean)

  /** Tags that terminate a text block (standard HTML block-level set;
    * `<br>` intentionally not included — Boilerpipe folds soft breaks).
    */
  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "head", "header", "hr", "html", "li", "main",
    "nav", "ol", "option", "p", "pre", "section", "select", "table", "tbody",
    "td", "tfoot", "th", "thead", "title", "tr", "ul")

  /** Content of these elements never reaches a text block (classifier-side
    * choice; the reference-exact strip deliberately KEEPS style/script text
    * and stays authoritative for canonical spans).
    */
  private val IgnoredContent: Set[String] = Set("script", "style")

  private val TagRe = Pattern.compile("<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?>",
    Pattern.DOTALL)

  /** Segment + measure + classify. Pure, deterministic. */
  def classify(html: String): Seq[Block] = {
    val raw = segment(html)
    val n = raw.length
    raw.zipWithIndex.map { case (b, i) =>
      val prev = if (i > 0) Some(raw(i - 1)) else None
      val next = if (i + 1 < n) Some(raw(i + 1)) else None
      val kept = decide(
        prevWords = prev.map(_.words).getOrElse(0),
        prevLinkDensity = prev.map(_.linkDensity).getOrElse(0.0),
        currWords = b.words,
        currLinkDensity = b.linkDensity,
        nextWords = next.map(_.words).getOrElse(0))
      b.copy(kept = kept && b.words > 0)
    }
  }

  /** The NumWordsRulesClassifier decision function (public algorithm). */
  def decide(
      prevWords: Int, prevLinkDensity: Double,
      currWords: Int, currLinkDensity: Double,
      nextWords: Int): Boolean =
    if (currLinkDensity > 0.333333) false
    else if (prevLinkDensity <= 0.555556)
      currWords > 16 || nextWords > 15 || prevWords > 4
    else
      currWords > 40 || nextWords > 17

  /** Main-content text: kept blocks joined by blank lines. */
  def mainContent(html: String): String =
    classify(html).filter(_.kept).map(_.text).mkString("\n\n")

  // --- segmentation -----------------------------------------------------

  private def measure(text: String, linkWords: Int): Block = {
    val t = PyCompat.pyStrip(unescape(text))
    val words = PyCompat.pyWordCount(t)
    val lines = math.max(1, (t.length + 79) / 80)
    Block(t, words,
      if (words == 0) 0.0 else math.min(1.0, linkWords.toDouble / words),
      words.toDouble / lines, kept = false)
  }

  // the canonical 6-entity table lives in HtmlStrip (order matters there);
  // block word counts must use the same one
  private def unescape(s: String): String =
    HtmlStrip.Entities.foldLeft(s) { case (acc, (e, r)) => acc.replace(e, r) }

  private def segment(html: String): Vector[Block] = {
    val blocks = Vector.newBuilder[Block]
    val sb = new StringBuilder
    var linkWords = 0
    var anchorDepth = 0
    var ignoreDepth = 0
    val m = TagRe.matcher(html)
    var pos = 0

    def flushText(upTo: Int): Unit = {
      if (upTo > pos && ignoreDepth == 0) {
        val piece = html.substring(pos, upTo)
        if (anchorDepth > 0)
          linkWords += PyCompat.pyWordCount(unescape(piece))
        sb.append(piece)
      }
      pos = upTo
    }

    def endBlock(): Unit = {
      val b = measure(sb.toString, linkWords)
      if (b.text.nonEmpty) blocks += b
      sb.clear(); linkWords = 0
    }

    while (m.find()) {
      flushText(m.start())
      val closing = m.group(1) == "/"
      val name = m.group(2).toLowerCase
      if (name == "a") {
        anchorDepth = math.max(0, anchorDepth + (if (closing) -1 else 1))
        sb.append(' ') // anchor boundary separates words
      } else if (IgnoredContent(name)) {
        ignoreDepth = math.max(0, ignoreDepth + (if (closing) -1 else 1))
      } else if (BlockTags(name)) endBlock()
      else sb.append(' ') // inline tag = word boundary, same as strip+space
      pos = m.end()
    }
    flushText(html.length)
    endBlock()
    blocks.result()
  }
}
