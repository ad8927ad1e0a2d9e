package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.route.Extract

class ExtractSpec extends AnyFunSuite {

  private def doc(id: Long, spans: SpanIn*): DocIn = DocIn(id, spans.toArray)

  test("kinds route to the right parsers") {
    val d = doc(1,
      SpanIn("text", "plain body", "", 0),
      SpanIn("html", "<p>from html</p>", "", 1),
      SpanIn("pdf", "0|0|0|from;1|0|0|pdf", "", 2),
      SpanIn("media", "ocr text", "ref/1", 3))
    val out = Extract.extractDoc(d)
    assert(out.spans.map(_.text).toSeq == Seq("plain body", "from html", "from pdf", "ocr text"))
    assert(out.spans.map(_.kind).toSeq == Seq("text", "html", "pdf", "media"))
    assert(out.spans(3).media_ref == "ref/1")
  }

  test("order is densely re-indexed in input offset order") {
    val d = doc(1,
      SpanIn("text", "c", "", 9),
      SpanIn("text", "a", "", 2),
      SpanIn("text", "b", "", 5))
    val out = Extract.extractDoc(d)
    assert(out.spans.map(s => (s.order, s.text)).toSeq == Seq((0, "a"), (1, "b"), (2, "c")))
  }

  test("unsupported kind yields empty span, never a failure (FallbackParser)") {
    val d = doc(1, SpanIn("bin", "\u0000junk", "", 0), SpanIn("text", "ok", "", 1))
    val out = Extract.extractDoc(d)
    assert(out.spans(0).text == "")
    assert(out.spans(1).text == "ok")
    assert(out.no_content_reason == "")
  }

  test("encrypted payloads classify as encrypted, outranking empty") {
    val d = doc(1, SpanIn("pdf", "ENCRYPTED:v1:aabbcc", "", 0))
    val out = Extract.extractDoc(d)
    assert(out.spans(0).text == "")
    assert(out.no_content_reason == Reason.Encrypted)
    // content elsewhere -> doc still has content, no reason
    val mixed = doc(2, SpanIn("pdf", "ENCRYPTED:x", "", 0), SpanIn("text", "ok", "", 1))
    assert(Extract.extractDoc(mixed).no_content_reason == "")
  }

  test("no-content reasons: unsupported for garbage, empty for nothing") {
    val d = doc(1, SpanIn("bin", "junk", "", 0))
    assert(Extract.extractDoc(d).no_content_reason == Reason.Unsupported)
    assert(Extract.extractDoc(DocIn(2, Array.empty[SpanIn])).no_content_reason == Reason.Empty)
    // an empty-text span of a SUPPORTED kind is still an empty file
    assert(Extract.extractDoc(doc(3, SpanIn("text", "", "", 0)))
      .no_content_reason == Reason.Empty)
    // an OVERSIZED span of a supported kind is not an unsupported media
    // type — the size guard's refusal stays empty-file at doc level
    assert(Extract.extractDoc(doc(4, SpanIn("text", "x" * 50, "", 0)),
      Extract.Config(maxSpanChars = 10)).no_content_reason == Reason.Empty)
  }

  test("size guard: oversized span becomes empty, siblings unaffected") {
    val cfg = Extract.Config(maxSpanChars = 10)
    val d = doc(1, SpanIn("text", "x" * 11, "", 0), SpanIn("text", "small", "", 1))
    val out = Extract.extractDoc(d, cfg)
    assert(out.spans(0).text == "")
    assert(out.spans(1).text == "small")
  }

  test("root id is the content-style digest of the doc id") {
    assert(Extract.extractDoc(doc(7, SpanIn("text", "t", "", 0))).doc_id == Ids.sha256("7"))
  }

  test("embed explosion: children per media span with recursive ids") {
    val d = doc(3,
      SpanIn("media", "first ocr", "r1", 0),
      SpanIn("text", "body", "", 1),
      SpanIn("media", "second ocr", "r2", 2))
    val outs = Extract.explode(d)
    assert(outs.size == 3)
    val root = outs.head
    assert(root.level == 0 && root.parent_id == "")
    val Seq(c0, c1) = outs.tail
    assert(c0.doc_id == Ids.embedId("first ocr", root.doc_id, 0))
    assert(c1.doc_id == Ids.embedId("second ocr", root.doc_id, 1))
    assert(c0.parent_id == root.doc_id && c0.root_id == root.doc_id && c0.level == 1)
    assert(c0.spans.toSeq == Seq(SpanOut("text", "first ocr", "", 0)))
  }

  test("content-less embed drops the hash component and is marked empty") {
    val d = doc(3, SpanIn("media", "", "r1", 0))
    val child = Extract.explode(d)(1)
    // contentPart is the EMPTY length-prefixed field ('0:'); parent id is a
    // 64-byte hex hash; ordinal 0; rel/res empty
    assert(child.doc_id == Ids.sha256(s"0:64:${Ids.sha256("3")}1:00:0:"))
    assert(child.spans.isEmpty && child.no_content_reason == Reason.Empty)
  }

  test("determinism: extraction is invariant under input span permutation") {
    val base = Vector(
      SpanIn("text", "alpha", "", 0), SpanIn("html", "<p>beta</p>", "", 1),
      SpanIn("media", "gamma", "m", 2), SpanIn("pdf", "0|0|0|delta", "", 3))
    def norm(d: DocOut) = (d.doc_id, d.parent_id, d.root_id, d.level, d.spans.toSeq, d.no_content_reason)
    val expected = norm(Extract.extractDoc(DocIn(5, base.toArray)))
    base.permutations.foreach { perm =>
      assert(norm(Extract.extractDoc(DocIn(5, perm.toArray))) == expected)
    }
  }

  test("embed ids are pure functions of content+position (never order-sensitive)") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val content = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val parent = rnd.alphanumeric.take(16).mkString
      val ord = rnd.nextInt(50)
      assert(Ids.embedId(content, parent, ord) == Ids.embedId(content, parent, ord))
      // distinct ordinals give distinct ids even for identical content
      assert(Ids.embedId(content, parent, ord) != Ids.embedId(content, parent, ord + 1))
    }
  }

  test("recursive chain embeds expand depth-first with level/parent wiring") {
    val d = doc(11, SpanIn("media", "chain:a>b>c", "m", 0))
    val outs = Extract.explode(d)
    assert(outs.map(_.level) == Seq(0, 1, 2, 3))
    val Seq(root, ca, cb, cc) = outs
    assert(ca.parent_id == root.doc_id && cb.parent_id == ca.doc_id && cc.parent_id == cb.doc_id)
    assert(outs.tail.forall(_.root_id == root.doc_id))
    assert(ca.spans.head.text == "a" && cb.spans.head.text == "b" && cc.spans.head.text == "c")
    // each level's id chains through its parent's id (DigestIdentifier recursion)
    assert(ca.doc_id == Ids.embedId("chain:a>b>c", root.doc_id, 0))
    assert(cb.doc_id == Ids.embedId("chain:b>c", ca.doc_id, 0))
  }

  test("depth guard refuses embeds beyond maxEmbedDepth and counts skips") {
    val deep = "chain:" + (1 to 25).map("l" + _).mkString(">")
    val d = doc(12, SpanIn("media", deep, "m", 0))
    val (outs, skipped) = Extract.explodeCounted(d, Extract.Config(maxEmbedDepth = 20))
    assert(outs.map(_.level).max == 20)
    assert(skipped == 1) // the level-21 spawn was refused BEFORE recursion
    assert(outs.size == 21) // root + 20 levels
  }

  test("identical sibling embeds get distinct ids via per-parent ordinal") {
    val d = doc(9, SpanIn("media", "dup", "r", 0), SpanIn("media", "dup", "r", 1))
    val ids = Extract.explode(d).tail.map(_.doc_id)
    assert(ids.distinct.size == 2)
  }
}
