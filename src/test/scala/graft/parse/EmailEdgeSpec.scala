package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Reference-verified edge case (`email_extractor.py:64` — `if value:`):
  * an empty-valued header contributes NOTHING — no headers entry, no
  * full-text line, no layout element. Golden traced live:
  * `extract_content` on "From: a@b.c\nSubject:\nDate: X\n\nbody here"
  * returns full text 'From: a@b.c\nDate: X\n\nbody here' and layout
  * contents ['From: a@b.c', 'Date: X', 'body here'].
  */
class EmailEdgeSpec extends AnyFunSuite {

  test("empty-valued header is dropped like the reference") {
    val p = EmailParser.parse("From: a@b.c\nSubject:\nDate: X\n\nbody here")
    assert(!p.headers.contains("subject"))
    assert(p.headers("from") == "a@b.c")
    assert(p.fullText == "From: a@b.c\nDate: X\n\nbody here")
    assert(p.layout.map(_.content) == Seq("From: a@b.c", "Date: X", "body here"))
  }
}
