package graft.parse

import java.util.regex.Pattern

/** HTML tag stripping with the reference's exact quirks
  * (reference: `src/normalization/extractors/text_extractor.py:56-75`):
  *
  *  - tags removed by a non-greedy `<.*?>` with `.` NOT matching `\n`
  *    (a tag containing a newline survives) — Java's `.` additionally
  *    excludes `\r`, U+0085, U+2028, U+2029, so we use `[^\n]` explicitly
  *    to get CPython's exact "anything but \n" semantics;
  *  - `<style>`/`<script>` CONTENT is retained (only the tags go);
  *  - six entity replacements applied afterwards, in insertion order
  *    (`&amp;lt;` double-unescapes to `<`);
  *  - final Python `str.strip()`.
  */
object HtmlStrip {
  private val TagRe = Pattern.compile("<[^\n]*?>")

  private[parse] val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&amp;" -> "&",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'")

  def strip(html: String): String = {
    val noTags = TagRe.matcher(html).replaceAll("")
    val unescaped = Entities.foldLeft(noTags) { case (acc, (e, r)) =>
      acc.replace(e, r)
    }
    PyCompat.pyStrip(unescaped)
  }
}
