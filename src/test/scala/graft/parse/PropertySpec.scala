package graft.parse

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.corpus.CorpusGen
import graft.model.{LayoutElement, OutSpan}

/** Property-based invariants (SURVEY §5.2 item 2) over the pure parse core
  * and the deterministic corpus generator. Plain scalacheck `Properties`
  * (sbt runs it natively; the scalatest bridge artifact is not in the
  * offline cache).
  */
object PropertySpec extends Properties("parse-core") {

  private val tagFree: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(" ", "\n", "\t", ".", ",", "!")))
      .map(_.mkString.replaceAll("[<>&]", ""))

  property("html strip idempotent on tag-free text") = forAll(tagFree) { s =>
    val once = HtmlStrip.strip(s)
    HtmlStrip.strip(once) == once
  }

  property("html strip removes single-line tags") = forAll(tagFree, tagFree) { (a, b) =>
    val out = HtmlStrip.strip(s"$a<b\tclass=x>$b</b>")
    !out.contains("<b\tclass=x>") && !out.contains("</b>")
  }

  private val elemGen: Gen[LayoutElement] = for {
    content <- Gen.alphaNumStr
    et <- Gen.oneOf("text", "header")
    page <- Gen.choose(1, 5)
    x1 <- Gen.choose(0.0, 500.0); y1 <- Gen.choose(0.0, 500.0)
    w <- Gen.choose(1.0, 300.0); h <- Gen.choose(1.0, 300.0)
  } yield LayoutElement(content, et, x1, y1, x1 + w, y1 + h, page, 800.0, 600.0)

  property("jaccard in [0,1], symmetric, self=1") =
    forAll(Gen.listOf(elemGen), Gen.listOf(elemGen)) { (ae, be) =>
      val (a, b) = (Signatures.tokens(ae), Signatures.tokens(be))
      val s = Signatures.jaccard(a, b)
      s >= 0.0 && s <= 1.0 &&
        s == Signatures.jaccard(b, a) &&
        (a.isEmpty || Signatures.jaccard(a, a) == 1.0)
    }

  property("signature id: 12 hex chars, deterministic") =
    forAll(Gen.listOf(elemGen)) { es =>
      val t = Signatures.tokens(es)
      val id = Signatures.signatureId(t)
      id.matches("[0-9a-f]{12}") && id == Signatures.signatureId(t)
    }

  // no clamping: the reference's int(coord/dim*1000) can exceed 1000 when a
  // bbox overruns the page (email body synth does) — assert the exact formula
  property("token quantization matches int(coord/dim*1000) truncation") =
    forAll(elemGen) { e =>
      val t = Signatures.tokens(Seq(e)).head
      t.b1 == (e.x1 / e.pageWidth * 1000).toInt &&
        t.b2 == (e.y1 / e.pageHeight * 1000).toInt &&
        t.b3 == (e.x2 / e.pageWidth * 1000).toInt &&
        t.b4 == (e.y2 / e.pageHeight * 1000).toInt &&
        t.contentHash.length == 8 && t.tokenCount >= 0
    }

  property("chunks = stripped non-empty paragraphs with dense %03d ids") =
    forAll(Gen.listOf(Gen.oneOf(tagFree, Gen.const(""))), Gen.identifier) { (paras, id) =>
      val full = paras.mkString("\n\n")
      val cs = Sectionizer.chunks(full, id)
      val expected = PyCompat.pySplitLit(full, "\n\n").map(PyCompat.pyStrip)
        .filter(_.nonEmpty).toSeq
      cs.map(_.content) == expected &&
        cs.zipWithIndex.forall { case (c, i) =>
          c.chunkId == f"${id}_chunk_$i%03d" &&
            c.tokens == PyCompat.pyWordCount(c.content)
        }
    }

  property("coercion: amount fields parse numerics, others unchanged") =
    forAll(Gen.choose(0, 999999), Gen.choose(0, 99)) { (a, b) =>
      val raw = f"$a.$b%02d"
      val (v, num) = RulesEngine.coerce(raw, "total_amount")
      val (v2, num2) = RulesEngine.coerce(a.toString, "invoice_number")
      num.isDefined && v.toDouble == num.get &&
        v2 == a.toString && num2.isEmpty
    }

  private val pool = DocParser.pooled()

  property("corpus gen pure; parse error-free; order is 0..n-1; kinds total") =
    forAll(Gen.choose(0L, 2000000L)) { i =>
      val d = CorpusGen.gen(i)
      val p = DocParser.parse(d, pool)
      d == CorpusGen.gen(i) &&
        p.error.isEmpty &&
        p.spans.map(_.order) == p.spans.indices &&
        p.spans.forall(s => Set("section", "kv", "chunk", "media")(s.kind))
    }

  property("span hash separates differing texts") =
    forAll(Gen.identifier, Gen.identifier) { (a, b) =>
      (a != b) ==> Prop {
        DocParser.spanHash(Seq(OutSpan("section", a, "", 0))) !=
          DocParser.spanHash(Seq(OutSpan("section", b, "", 0)))
      }
    }
}
