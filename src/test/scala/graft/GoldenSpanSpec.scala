package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.route.Extract

/** Golden span-sequence fixtures — the BASELINE.json correctness invariant:
  * per-row span-sequence equality (kind, text, media_ref, order) against
  * hand-derived expected outputs, mirroring the reference's golden-output
  * tests (`ExtractorTest.java:328` vs the checked-in expected HTML). Fixture categories
  * follow FIXTURES.md §3.
  */
class GoldenSpanSpec extends AnyFunSuite {

  private def spansOf(d: DocIn) = Extract.extractDoc(d).spans.toSeq

  test("golden: interleaved mix preserves global order across kinds") {
    val d = DocIn(100, Array(
      SpanIn("html", "<body><nav><a href='/'>nav</a></nav><p>main content here</p></body>", "", 0),
      SpanIn("media", "HEAVY\nMETAL", "art/ab/cdef", 1),
      SpanIn("pdf", "0|1|0|world;0|0|0|hello", "", 2),
      SpanIn("text", "plain tail", "", 3)))
    assert(spansOf(d) == Seq(
      SpanOut("html", "main content here", "", 0),
      SpanOut("media", "HEAVY\nMETAL", "art/ab/cdef", 1),
      SpanOut("pdf", "hello world", "", 2),
      SpanOut("text", "plain tail", "", 3)))
  }

  test("golden: boilerplate page strips to title+content") {
    val html = "<html><head><title>skip me</title></head><body>" +
      "<div id=\"nav\"><ul><li><a href=\"/h\">home</a></li><li><a href=\"/a\">about</a></li></ul></div>" +
      "<div id=\"main\"><h1>Heading</h1><p>The actual body of the document, long enough to dominate.</p></div>" +
      "<div id=\"footer\"><a href=\"/p\">privacy</a></div>" +
      "<script>tracker()</script></body></html>"
    val d = DocIn(101, Array(SpanIn("html", html, "", 0)))
    assert(spansOf(d) == Seq(SpanOut("html",
      "Heading\nThe actual body of the document, long enough to dominate.", "", 0)))
  }

  test("golden: two-page pdf-like span (embedded.pdf analog)") {
    // page 0: 'first page' at y0; page 1: 'second page' — emitted shuffled
    val payload = "0|0|1|second;1|0|1|page;1|0|0|page;0|0|0|first"
    val d = DocIn(102, Array(SpanIn("pdf", payload, "", 0)))
    assert(spansOf(d) == Seq(SpanOut("pdf", "first page second page", "", 0)))
  }

  test("golden: media passthrough preserves (kind,text,media_ref,order) exactly") {
    val d = DocIn(103, Array(
      SpanIn("media", "ocr line one", "art/00/aaa", 0),
      SpanIn("media", "", "art/00/bbb", 1)))
    assert(spansOf(d) == Seq(
      SpanOut("media", "ocr line one", "art/00/aaa", 0),
      SpanOut("media", "", "art/00/bbb", 1)))
  }

  test("golden: recursive embeds 3 levels of media-span docs keep id chain") {
    // level-by-level manual expansion: root -> child; the child id feeds the
    // grandchild as its parent (DigestIdentifier recursion)
    val rootId = Ids.rootId(104)
    val c1 = Ids.embedId("inner", rootId, 0)
    assert(Extract.explode(DocIn(104, Array(SpanIn("media", "inner", "m", 0))))
      .map(_.doc_id) == Seq(rootId, c1))
    val c2 = Ids.embedId("deeper", c1, 0)
    assert(c2 == Ids.sha256(s"64:${Ids.sha256("deeper")}64:${c1}1:00:0:"))
  }

  test("golden: duplicates — identical content distinct docs keep distinct root ids") {
    val a = Extract.extractDoc(DocIn(105, Array(SpanIn("text", "same", "", 0))))
    val b = Extract.extractDoc(DocIn(106, Array(SpanIn("text", "same", "", 0))))
    assert(a.doc_id != b.doc_id)
    assert(a.spans.toSeq == b.spans.toSeq)
  }

  test("golden: unparseable/garbage and empty docs degrade with reasons") {
    // all-garbage -> unsupported-media-type (the reference's garbage.bin golden)
    assert(Extract.extractDoc(DocIn(107, Array(SpanIn("bin", "\u0000\u0001garbage", "", 0))))
      .no_content_reason == Reason.Unsupported)
    assert(Extract.extractDoc(DocIn(108, Array.empty[SpanIn])).no_content_reason == Reason.Empty)
    assert(Extract.extractDoc(DocIn(109, Array(SpanIn("text", "", "", 0))))
      .no_content_reason == Reason.Empty)
  }

  test("golden: utf16-ish non-ascii content survives byte-for-byte") {
    val t = "café 中文 😀 naïve"
    val d = DocIn(110, Array(SpanIn("text", t, "", 0)))
    assert(spansOf(d) == Seq(SpanOut("text", t, "", 0)))
  }

  test("golden: reference embedded-pdf analog (2 pages, image + OCR text per page)") {
    // Mirrors /root/reference/extract-lib/src/test/resources/expected/
    // embedded-pdf.html: two <div class="page"> each holding an embedded
    // image reference and the OCRed text "HEAVY\nMETAL". In the span model
    // the pages arrive as one positioned-word pdf span plus one media span
    // per page image, OCR text passed through verbatim.
    val d = DocIn(200, Array(
      SpanIn("pdf", "0|0|1|page-two;0|0|0|page-one", "", 0),
      SpanIn("media", "HEAVY\nMETAL", "embedded:image0.png", 1),
      SpanIn("media", "HEAVY\nMETAL", "embedded:image1.png", 2)))
    assert(spansOf(d) == Seq(
      SpanOut("pdf", "page-one page-two", "", 0),
      SpanOut("media", "HEAVY\nMETAL", "embedded:image0.png", 1),
      SpanOut("media", "HEAVY\nMETAL", "embedded:image1.png", 2)))
    // the images spawn children with ids chained per page ordinal
    val outs = Extract.explode(d)
    assert(outs.size == 3)
    assert(outs(1).doc_id != outs(2).doc_id) // same content, distinct ordinals
  }

  test("golden: reference utf16-txt analog (charset-decoded text verbatim)") {
    // Mirrors expected/utf16-txt.html: the UTF-16LE file decodes to exactly
    // "This is a test.\n" (ExtractorTest.java:328). Decoding happens
    // upstream of the span model; the engine must not alter the text.
    val t = "This is a test.\n"
    val d = DocIn(201, Array(SpanIn("text", t, "", 0)))
    assert(spansOf(d) == Seq(SpanOut("text", t, "", 0)))
  }

  test("golden: corpus synthesis fixture matches the published spec") {
    // words 0..11 -> i1=4, i2=8
    val d = Corpus.synthesizeOne(21L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11")
    val out = Extract.extractDoc(d)
    assert(out.spans(0) == SpanOut("html", "title 21\nw0 w1 w2 w3", "", 0))
    assert(out.spans(1) == SpanOut("text", "w4 w5 w6 w7", "", 1))
    assert(out.spans(2) == SpanOut("pdf", "w8 w9 w10 w11", "", 2))
    // 21 % 3 == 0 and 21 % 21 == 0: content-less media span
    assert(out.spans(3) == SpanOut("media", "", Ids.artifactRef(21), 3))
    assert(out.spans.size == 4)
  }
}
