package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class BlockClassifierSpec extends AnyFunSuite {

  private val article =
    "The quarterly reconciliation statement was approved by the finance " +
      "operations review board after the warehouse dispatch manifest and " +
      "remittance advice were checked against the ledger balance carried forward."

  private val boilerplateHtml =
    s"""<html><head><title>Portal</title>
<style>body { color: red; }</style></head><body>
<nav><a href="/">Home</a> <a href="/a">News</a> <a href="/b">Archive</a> <a href="/c">About us</a></nav>
<div><p>$article</p>
<p>Payment is due within thirty days of the statement closing period and the
settlement wire transfer must reference the purchase order receipt number.</p></div>
<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a> copyright</footer>
</body></html>"""

  test("nav/footer link lists are boilerplate; long paragraphs are content") {
    val blocks = BlockClassifier.classify(boilerplateHtml)
    val kept = blocks.filter(_.kept)
    assert(kept.nonEmpty)
    assert(kept.forall(b => b.linkDensity <= 0.333333))
    assert(kept.exists(_.text.contains("quarterly reconciliation")))
    assert(!kept.exists(_.text.contains("Home")), "nav link list leaked into content")
    assert(!kept.exists(_.text.contains("Privacy")), "footer leaked into content")
    assert(!kept.exists(_.text.contains("color: red")), "style content leaked")
    val main = BlockClassifier.mainContent(boilerplateHtml)
    assert(main.contains(article))
  }

  test("link density and text density are measured per block") {
    val blocks = BlockClassifier.classify(
      """<p>plain words only here today</p><p><a href="x">all link words</a></p>""")
    assert(blocks.length == 2)
    assert(blocks(0).linkDensity == 0.0)
    assert(blocks(1).linkDensity == 1.0)
    assert(blocks.forall(_.textDensity > 0.0))
  }

  test("boilerplate-free corpus html: content blocks kept, their text ⊆ the reference-exact strip") {
    val rng = new graft.corpus.CorpusGen.Rng(42L)
    val doc = graft.corpus.CorpusGen.gen(12345L)
    assert(rng.nextLong() != 0L) // rng sanity, keeps the import honest
    doc.spans.filter(_.kind == "html").foreach { s =>
      val stripped = HtmlStrip.strip(s.text)
      val kept = BlockClassifier.classify(s.text).filter(_.kept)
      assert(kept.nonEmpty)
      // every retained block's words appear in the canonical stripped text
      kept.foreach { b =>
        PyCompat.pySplitWs(b.text).foreach { w =>
          assert(stripped.contains(w), s"word '$w' missing from stripped text")
        }
      }
    }
  }

  test("classifier decision matches the published rule table") {
    // link-dense → boilerplate regardless of words
    assert(!BlockClassifier.decide(0, 0.0, 100, 0.5, 100))
    // normal predecessor: 17 words suffice
    assert(BlockClassifier.decide(0, 0.0, 17, 0.0, 0))
    assert(!BlockClassifier.decide(0, 0.0, 16, 0.0, 0))
    // short block rescued by wordy successor or predecessor context
    assert(BlockClassifier.decide(0, 0.0, 3, 0.0, 16))
    assert(BlockClassifier.decide(5, 0.0, 3, 0.0, 0))
    // link-dense predecessor raises the bar
    assert(!BlockClassifier.decide(10, 0.6, 17, 0.0, 0))
    assert(BlockClassifier.decide(10, 0.6, 41, 0.0, 0))
  }
}
