package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.core._
import graft.core.html.HtmlExtractor
import graft.core.pdf.PdfLayout
import graft.core.meta.Meta
import graft.core.text.TextStats

/** ScalaCheck property suite for the core invariants the reference pins by
  * example (SURVEY §5): id determinism, offset-order preservation, guard
  * monotonicity, date-cascade round-trips.
  */
object CoreProps extends Properties("graft.core") {

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val words: Gen[Array[String]] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, word).map(_.toArray))

  property("pdf payload round-trips through the layout parser") =
    Prop.forAll(words) { w =>
      PdfLayout.text(Corpus.pdfPayload(w)) == w.mkString(" ")
    }

  property("real PDF bytes round-trip through PdfMini (Tm-positioned lines)") =
    Prop.forAll(words) { w =>
      val sb = new StringBuilder("%PDF-1.4\nstream\nBT ")
      val lines = w.grouped(5).map(_.mkString(" ")).toVector
      lines.zipWithIndex.foreach { case (line, i) =>
        sb.append(s"1 0 0 1 72 ${720 - i * 14} Tm ($line) Tj ")
      }
      sb.append("ET\nendstream")
      graft.core.pdf.PdfMini.textFromLatin1(sb.toString) == lines.mkString("\n")
    }

  property("corpus html wrap round-trips through the boilerplate stripper") =
    Prop.forAll(Gen.choose(0L, 1000000L), words) { (id, w) =>
      val a = w.mkString(" ")
      HtmlExtractor.mainText(Corpus.htmlWrap(id, a)) == s"title $id\n$a"
    }

  property("html stripper never emits markup characters from tags") =
    Prop.forAll(words) { w =>
      val html = s"<div><p>${w.mkString(" ")}</p><span>tail</span></div>"
      val out = HtmlExtractor.mainText(html)
      !out.contains("<") && !out.contains(">")
    }

  property("extraction order equals rank of input offset") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 1000)).map(_.distinct)) { offsets =>
      val spans = offsets.map(o => SpanIn("text", s"t$o", "", o))
      val out = graft.core.route.Extract.extractDoc(DocIn(1, spans.toArray))
      val expected = offsets.sorted.map(o => s"t$o")
      out.spans.sortBy(_.order).map(_.text).toSeq == expected
    }

  property("size guard is monotone: tightening never adds content") =
    Prop.forAll(Gen.choose(0, 30), Gen.choose(0, 30), words) { (c1, c2, w) =>
      val (lo, hi) = (math.min(c1, c2), math.max(c1, c2))
      val d = DocIn(1, Array(SpanIn("text", w.mkString(" "), "", 0)))
      val outLo = graft.core.route.Extract
        .extractDoc(d, graft.core.route.Extract.Config(maxSpanChars = lo)).spans.head.text
      val outHi = graft.core.route.Extract
        .extractDoc(d, graft.core.route.Extract.Config(maxSpanChars = hi)).spans.head.text
      outLo.length <= outHi.length
    }

  property("date cascade round-trips epoch seconds") =
    Prop.forAll(Gen.choose(0L, 4102444799L)) { es =>
      Meta.parseDate(es.toString).contains(java.time.Instant.ofEpochSecond(es)) ||
        es.toString.length != 10 // only 10-digit epochs take the epoch path
    }

  property("date cascade: compact14 and rfc1123 agree with the epoch") =
    Prop.forAll(Gen.choose(0L, 4102444799L)) { es =>
      val i = java.time.Instant.ofEpochSecond(es)
      Meta.parseDate(Meta.formatCompact14(es)).contains(i) &&
        Meta.parseDate(Meta.formatRfc1123(es)).contains(i)
    }

  property("implausible epochs are rejected, never misparsed") =
    Prop.forAll(Gen.choose(4200000000L, 9999999999L)) { es =>
      Meta.parseDate(es.toString).isEmpty
    }

  property("iso array is all-or-nothing") =
    Prop.forAll(Gen.choose(0L, 4102444799L)) { es =>
      Meta.toIsoArray(Seq(es.toString.takeRight(10), "not a date")).isEmpty ||
        es.toString.length != 10
    }

  private val tagSoup: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("<"), Gen.const(">"), Gen.const("</"), Gen.const("/>"),
      Gen.const("<div"), Gen.const("<a href='"), Gen.const("\""),
      Gen.const("&amp;"), Gen.const("&#"), Gen.const("&#x"),
      Gen.const("<!--"), Gen.const("-->"), Gen.const("<script>"),
      Gen.const("</script"), Gen.const("<!"), Gen.const("="),
      Gen.const(" "), Gen.const("\n"), Gen.const("\u0000"))
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, frag).map(_.mkString))
  }

  property("html extractor terminates and never throws on arbitrary tag soup") =
    Prop.forAll(tagSoup) { soup =>
      HtmlExtractor.mainText(soup); true // no exception, no hang
    }

  property("pdf parser terminates and never throws on arbitrary payloads") =
    Prop.forAll(tagSoup.map(_.replace('<', '|').replace('>', ';'))) { junk =>
      PdfLayout.text(junk); true
    }

  property("date cascade never throws on arbitrary strings") =
    Prop.forAll(tagSoup) { s => Meta.parseDate(s); true }

  property("full synthesis+extraction matches the published spec on all branches") =
    Prop.forAll(Gen.choose(0L, 10000L), Gen.choose(10, 99).flatMap(n =>
      Gen.listOfN(n, word).map(_.toArray))) { (id, w) =>
      val text = w.mkString(" ")
      val out = graft.core.route.Extract.extractDoc(Corpus.synthesizeOne(id, text))
      val m = w.length
      val (i1, i2) = Corpus.splitPoints(m)
      val expected = Vector.newBuilder[SpanOut]
      expected += SpanOut("html", s"title $id\n${w.slice(0, i1).mkString(" ")}", "", 0)
      expected += SpanOut("text", w.slice(i1, i2).mkString(" "), "", 1)
      expected += SpanOut("pdf", w.slice(i2, m).mkString(" "), "", 2)
      var next = 3
      if (id % 3 == 0) {
        val t =
          if (id % 21 == 0) ""
          else if (id % 27 == 0) s"chain:ocr $id>sub $id"
          else s"ocr $id"
        expected += SpanOut("media", t, Ids.artifactRef(id), next)
        next += 1
      }
      if (id % 13 == 0) expected += SpanOut("bin", "", "", next)
      out.spans.toSeq == expected.result()
    }

  private val maybeStr: Gen[String] =
    Gen.oneOf(Gen.const(""), word)

  property("embedId composition is exact on every branch (length-prefixed encoding)") =
    Prop.forAll(maybeStr, word, Gen.choose(0, 9), maybeStr, maybeStr, maybeStr) {
      (content, parent, ord, rel, res, salt) =>
        val got = Ids.embedId(content, parent, ord, rel, res, salt)
        val contentPart = if (content.isEmpty) "" else Ids.sha256(salt + content)
        def enc(s: String) = s"${s.getBytes("UTF-8").length}:$s"
        got == Ids.sha256(enc(contentPart) + enc(parent) + enc(ord.toString) +
            enc(rel) + enc(res)) &&
          // defaults reproduce the bare composition (back-compat with roots)
          Ids.embedId(content, parent, ord) == Ids.embedId(content, parent, ord, "", "", "")
    }

  property("embedId is injective across field boundaries (no ':'-shift collisions)") =
    Prop.forAll(word, word, Gen.choose(0, 9), word, word) { (content, parent, ord, x, y) =>
      // the classic ambiguity of separator joins: (rel='', res='x:y') vs
      // (rel='x', res='y') — length-prefixing must keep them distinct
      Ids.embedId(content, parent, ord, "", s"$x:$y") !=
        Ids.embedId(content, parent, ord, x, y)
    }

  property("project salt changes every contentful id, never the content-less ones") =
    Prop.forAll(word, word, Gen.choose(0, 9)) { (content, parent, ord) =>
      Ids.embedId(content, parent, ord, salt = "p1") !=
        Ids.embedId(content, parent, ord, salt = "p2") &&
        Ids.embedId("", parent, ord, salt = "p1") ==
          Ids.embedId("", parent, ord, salt = "p2")
    }

  property("embed naming: resource name wins; untitled falls back per mode") =
    Prop.forAll(maybeStr, Gen.choose(0, 5), Gen.choose(6, 11)) { (res, perParent, global) =>
      val std = Ids.embedName(res, perParent, global)
      val legacy = Ids.embedName(res, perParent, global, legacy = true)
      if (res.nonEmpty) std == res && legacy == res
      else std == s"untitled_$perParent" && legacy == s"untitled_$global"
    }

  property("concatEmbeds fails exactly the marked entries, parent never throws") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.const(("", "plain content")),
      Gen.const(("named.txt", "more content")),
      Gen.const(("", "ENCRYPTED:blob")),
      Gen.const(("", "POISON:crash"))))) { entries =>
      val (html, failed) = graft.core.route.Extract.concatEmbeds(entries)
      val expectFail = entries.count { case (_, c) =>
        c.startsWith("ENCRYPTED:") || c.startsWith("POISON:") }
      failed == expectFail &&
        html.sliding("package-entry".length).count(_ == "package-entry") == entries.length
    }

  property("cleanInfo never throws and is idempotent on arbitrary junk") =
    Prop.forAll(tagSoup) { junk =>
      val c = graft.core.pdf.PdfMini.cleanInfo("/Title (" + junk + ") /Author (x)")
      graft.core.pdf.PdfMini.cleanInfo(c) == c
    }

  property("cleanInfo never throws on TRUNCATED input (mid-escape / unclosed)") =
    Prop.forAll(tagSoup, Gen.oneOf("\\", "(", "\\(", "")) { (junk, tail) =>
      // the value string ends mid-escape or unclosed at end-of-file — the
      // escape skip must clamp, never step past the input
      val c = graft.core.pdf.PdfMini.cleanInfo("/Title (" + junk + tail)
      graft.core.pdf.PdfMini.cleanInfo(c) == c
    }

  property("WAV encode/decode round-trips rate, frames, and amplitude") =
    Prop.forAll(Gen.choose(0, 3), Gen.choose(1, 200), Gen.choose(0, 999)) {
      (ri, n, amp) =>
        val rate = 8000 + ri * 4000
        val wav = graft.multimodal.Media.encodeWav(rate, n, amp.toShort)
        val (r, ch, bits, frames, first) = graft.multimodal.Media.decodeAudio(wav)
        r == rate && ch == 1 && bits == 16 && frames == n.toLong && first == amp
    }

  property("simhash of identical texts is identical; fingerprint likewise") =
    Prop.forAll(words) { w =>
      val t = w.mkString(" ")
      TextStats.simhash32(t) == TextStats.simhash32(t) &&
        TextStats.fingerprint(t) == TextStats.fingerprint(t)
    }

  property("minhash signature is permutation-insensitive at the set level") =
    Prop.forAll(words) { w =>
      // identical shingle multisets -> identical signatures
      val t = w.mkString(" ")
      graft.operators.Dedup.minhashSig(t).toSeq ==
        graft.operators.Dedup.minhashSig(t).toSeq
    }
}
