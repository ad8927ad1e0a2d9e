package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.pdf.PdfLayout
import graft.core.Corpus

class PdfLayoutSpec extends AnyFunSuite {

  test("reading order: sorted by page, then line y, then x") {
    val payload = "1|0|0|b;0|0|0|a;0|1|0|c;0|0|1|d"
    assert(PdfLayout.text(payload) == "a b c d")
  }

  test("out-of-order emission is fully recovered") {
    val words = Array("the", "quick", "brown", "fox", "jumps", "over", "it")
    val payload = Corpus.pdfPayload(words)
    assert(PdfLayout.text(payload) == words.mkString(" "))
  }

  test("line clustering tolerance groups near-y words") {
    // y=10.0 and y=10.3 same line (tol 0.5); 11.0 new line
    val payload = "5|10.3|0|b;1|10.0|0|a;1|11.0|0|c"
    assert(PdfLayout.text(payload) == "a b c")
  }

  test("multi-page payloads keep page order ahead of y order") {
    val payload = "0|5|1|second;0|9|0|first"
    assert(PdfLayout.text(payload) == "first second")
  }

  test("malformed records are skipped, not fatal") {
    val payload = "0|0|0|ok;garbage;1|x|0|bad;|||;2|0|0|fine"
    assert(PdfLayout.text(payload) == "ok fine")
  }

  test("empty and null payloads") {
    assert(PdfLayout.text("") == "")
    assert(PdfLayout.text(null) == "")
  }

  test("large synthetic payload round-trips (2+ pages)") {
    val words = (0 until 50).map(i => s"w$i").toArray
    assert(PdfLayout.text(Corpus.pdfPayload(words)) == words.mkString(" "))
  }

  test("acroform: field values append as body text, kids dot-qualified") {
    import graft.core.pdf.PdfMini
    val pdf = PdfMini.buildForm(Seq("page line"),
      ("who", "W. Name"), ("ok", "Yes"), ("outer", "inner", "kid value"))
    assert(PdfMini.formFields(pdf) == Vector(
      ("who", "W. Name"), ("ok", "Yes"), ("outer.inner", "kid value")))
    assert(PdfMini.textFromLatin1(pdf) ==
      "page line\nwho: W. Name\nok: Yes\nouter.inner: kid value")
    // a form-less pdf is untouched by the walker
    assert(PdfMini.formFields(PdfMini.buildCid(Seq("x"))).isEmpty)
  }

  test("objstm: the modern layout (fields in an object stream) extracts identically") {
    import graft.core.pdf.PdfMini
    val classic = PdfMini.buildForm(Seq("same doc"),
      ("who", "Q"), ("ok", "Off"), ("g", "k", "v2"))
    val modern = PdfMini.buildFormObjStm(Seq("same doc"),
      ("who", "Q"), ("ok", "Off"), ("g", "k", "v2"))
    assert(!modern.contains("trailer")) // really the xref-stream layout
    assert(PdfMini.textFromLatin1(modern) == PdfMini.textFromLatin1(classic))
    assert(PdfMini.formFields(modern) ==
      Vector(("who", "Q"), ("ok", "Off"), ("g.k", "v2")))
    // a corrupt object stream degrades to formless, never throws
    val broken = modern.replace("/First", "/Fxrst")
    assert(PdfMini.formFields(broken).isEmpty)
    val junkStm = modern.replaceFirst("stream", "strxam")
    PdfMini.formFields(junkStm) // must not throw
  }

  test("acroform: escapes, hex UTF-16BE values, cycles, junk all classify") {
    import graft.core.pdf.PdfMini
    // literal-string escapes and nested parens in values
    val esc =
      """1 0 obj << /AcroForm << /Fields [2 0 R] >> >> endobj
        |2 0 obj << /T (a) /V (line1\nline(2) 50\% \(x\)) >> endobj
        |trailer << /Root 1 0 R >>""".stripMargin
    assert(PdfMini.formFields(esc) == Vector(("a", "line1\nline(2) 50% (x)")))
    // hex string with UTF-16BE BOM
    val hex =
      """1 0 obj << /AcroForm << /Fields [2 0 R] >> >> endobj
        |2 0 obj << /T (u) /V <FEFF00480069> >> endobj
        |trailer << /Root 1 0 R >>""".stripMargin
    assert(PdfMini.formFields(hex) == Vector(("u", "Hi")))
    // /T must not match /TU (name-token boundary)
    val tu =
      """1 0 obj << /AcroForm << /Fields [2 0 R] >> >> endobj
        |2 0 obj << /TU (tooltip) /T (real) /V (v) >> endobj
        |trailer << /Root 1 0 R >>""".stripMargin
    assert(PdfMini.formFields(tu) == Vector(("real", "v")))
    // a kids CYCLE terminates (visited set + depth cap)
    val cyc =
      """1 0 obj << /AcroForm << /Fields [2 0 R] >> >> endobj
        |2 0 obj << /T (p) /Kids [3 0 R] >> endobj
        |3 0 obj << /T (k) /Kids [2 0 R] >> endobj
        |trailer << /Root 1 0 R >>""".stripMargin
    assert(PdfMini.formFields(cyc).isEmpty)
    // junk never throws
    assert(PdfMini.formFields("/Root 9 0 R garbage").isEmpty)
    assert(PdfMini.formFields("").isEmpty)
  }

  test("xfa: the datasets packet's values surface as body text") {
    import graft.core.pdf.PdfMini
    val pdf = PdfMini.buildXfa(Seq("page one"),
      Seq(("who", "Some Body"), ("where", "A Town")))
    assert(PdfMini.xfaText(pdf) == "Some Body\nA Town")
    assert(PdfMini.textFromLatin1(pdf) == "page one\nSome Body\nA Town")
    // no XFA entry: empty, instantly
    assert(PdfMini.xfaText(PdfMini.buildCid(Seq("x"))).isEmpty)
    // a broken packet stream degrades to no XFA text, never a throw
    val broken = pdf.replace("/FlateDecode", "/LZWDecode")
    assert(PdfMini.xfaText(broken).isEmpty)
    assert(PdfMini.textFromLatin1(broken) == "page one")
  }

  test("acroform: review findings — octal, dict /V, refs, radio kids, bad hex") {
    import graft.core.pdf.PdfMini
    def doc(fields: String): String =
      s"""1 0 obj << /AcroForm << /Fields [2 0 R] >> >> endobj
         |$fields
         |trailer << /Root 1 0 R >>""".stripMargin
    // octal escapes (how writers encode non-ASCII PDFDocEncoding bytes)
    // and the backslash-EOL line continuation
    assert(PdfMini.formFields(doc(
      "2 0 obj << /T (o) /V (\\101\\102\\7C) >> endobj")) ==
      Vector(("o", "ABC")))
    assert(PdfMini.formFields(doc(
      "2 0 obj << /T (c) /V (long\\\nvalue) >> endobj")) ==
      Vector(("c", "longvalue")))
    // an inline signature DICTIONARY value must not crash (it is not a
    // printed value) — the pre-fix parser fed '<< /Type /Sig' to parseInt
    assert(PdfMini.formFields(doc(
      "2 0 obj << /T (sig) /V << /Type /Sig /Contents <ABCD> >> >> endobj")).isEmpty)
    // non-hex inside <> degrades to no value, never NumberFormatException
    assert(PdfMini.formFields(doc(
      "2 0 obj << /T (zz) /V <zz> >> endobj")).isEmpty)
    // indirect /V (near-universal for long values): one level resolves
    assert(PdfMini.formFields(doc(
      "2 0 obj << /T (ind) /V 7 0 R >> endobj\n7 0 obj (resolved text) endobj")) ==
      Vector(("ind", "resolved text")))
    // the RADIO-GROUP shape: /T and /V on the field, kids are widget
    // annotations without /T or /V — the value must not be lost
    assert(PdfMini.formFields(
      """1 0 obj << /AcroForm << /Fields [2 0 R] >> >> endobj
        |2 0 obj << /FT /Btn /T (choice) /V /Opt2 /Kids [3 0 R 4 0 R] >> endobj
        |3 0 obj << /Subtype /Widget >> endobj
        |4 0 obj << /Subtype /Widget >> endobj
        |trailer << /Root 1 0 R >>""".stripMargin) ==
      Vector(("choice", "Opt2")))
  }
}
