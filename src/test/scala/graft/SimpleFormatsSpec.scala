package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.text.{Csv, Rtf}

/** RTF/CSV goldens mirroring the reference's rtf and csv fixture asserts
  * (`ExtractorTest.java:132-148` exact-string semantics).
  */
class SimpleFormatsSpec extends AnyFunSuite {

  test("rtf: control words, destinations, hex escapes, par/tab") {
    val rtf = """{\rtf1\ansi{\fonttbl{\f0 Times New Roman;}}{\info{\author Eve}}""" +
      """\f0 first line\par second\tab cell\par \'e9t\'e9 caf\'e9}"""
    assert(Rtf.text(rtf) == "first line\nsecond\tcell\nété café")
    // escaped braces/backslash are literal text; author never leaks
    assert(Rtf.text("""{\rtf1 a \{b\} c \\ d}""") == "a {b} c \\ d")
    assert(!Rtf.text(rtf).contains("Eve"))
    // {\*\generator ...} destination skipped
    assert(Rtf.text("""{\rtf1{\*\generator Tool 1.0;}visible}""") == "visible")
    // junk never throws
    Rtf.text("""{\rtf1 \dangling""") // unterminated group
    Rtf.text("""\'zz \par""")
    assert(Rtf.text("") == "")
  }

  test("rtf: picture/object destinations skip; cp1252 smart quotes decode") {
    // Word emits {\nonshppict{\pict ...}} WITHOUT \* — hex must not leak
    val withPict = """{\rtf1\ansi before {\nonshppict{\pict\jpegblip 01050000ffd8ffe0}} after}"""
    assert(Rtf.text(withPict) == "before  after")
    assert(Rtf.text("""{\rtf1{\footnote see below}body}""") == "body")
    // \ansi means Windows-1252: \'93..\'94 are smart quotes, \'96 en dash
    assert(Rtf.text("""{\rtf1 \'93q\'94 \'96 x}""") == "“q” – x")
  }

  test("rtf: \\uN unicode escapes emit the code point and skip \\uc fallbacks") {
    // NOTE: scalac processes \uXXXX even inside triple quotes, so the RTF
    // \u control word is spelled "\\" + "u..." throughout this test.
    val U = "\\" + "u"
    // Word emits \uN + a '?' fallback for every non-ANSI char (default \uc1)
    assert(Rtf.text(s"{\\rtf1 caf${U}233? and ${U}1055?${U}1088?}") == "café and Пр")
    // negative N is the signed-16-bit form of a >32767 code point
    // (U+D83D U+DE00 surrogate pair = 😀)
    assert(Rtf.text(s"{\\rtf1 ${U}-10179?${U}-8704? x}") == "😀 x")
    // \uc0: no fallback chars to skip
    assert(Rtf.text(s"{\\rtf1 \\uc0 ${U}233 y}") == "éy")
    // \uc2 skips two fallback chars, including \'hh escapes
    assert(Rtf.text(s"{\\rtf1 \\uc2 ${U}233ab.z}") == "é.z")
    assert(Rtf.text(s"{\\rtf1 ${U}233\\'e9tail}") == "étail")
    // fallback skipping never crosses a group boundary
    assert(Rtf.text(s"{\\rtf1 \\uc2 {${U}233}after}") == "éafter")
  }

  test("csv: quoted fields, embedded commas/quotes/newlines, CRLF") {
    assert(Csv.text("a,b\nc,d") == "a\tb\nc\td")
    assert(Csv.text("a,\"b,c\",d\r\ne,\"f\"\"g\"\"\"") == "a\tb,c\td\ne\tf\"g\"")
    assert(Csv.text("\"multi\nline\",x") == "multi\nline\tx")
    assert(Csv.text("a,b\n") == "a\tb") // trailing newline: no dangling row
    // a newline INSIDE the final quoted field is data, not a row terminator
    assert(Csv.text("a,\"b\n\"") == "a\tb\n")
    assert(Csv.text("") == "")
    Csv.text("\"unclosed") // junk never throws
  }

  test("rtf: \\ansicpg switches the hex-escape codepage (cp1251 Cyrillic)") {
    // \'ef\'f0 are 'пр' in cp1251 but 'ïð' in cp1252
    assert(Rtf.text("""{\rtf1\ansi\ansicpg1251 \'ef\'f0}""") == "пр")
    assert(Rtf.text("""{\rtf1\ansi \'ef\'f0}""") == "ïð")
    // unknown / DBCS codepages fall back to 1252, never throw
    assert(Rtf.text("""{\rtf1\ansicpg932 \'93x}""") == "“x")
    assert(Rtf.text("""{\rtf1\ansicpg999999 ok}""") == "ok")
  }

  test("failure-injection markers in ENTRY bytes are content, never failures") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    import graft.core.{DocIn, SpanIn}
    import graft.core.route.Extract
    val zip = graft.sources.Archive.zipBytes(Seq(
      ("a.txt", "POISON: looks like a marker".getBytes(UTF_8)),
      ("b.txt", "SLOW:999999 also content".getBytes(UTF_8))))
    val out = Extract.explode(DocIn(51, Array(SpanIn("zip",
      new String(zip, ISO_8859_1), "", 0)))) // must neither throw nor hang
    assert(out(1).spans.head.text == "POISON: looks like a marker")
    assert(out(2).spans.head.text == "SLOW:999999 also content")
  }

  test("nested rtf/pdf entries extract clean text, same as standalone") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    import graft.core.{DocIn, SpanIn}
    import graft.core.route.Extract
    val rtf = """{\rtf1\ansi nested rtf body}"""
    val pdf = "%PDF-1.4\n1 0 obj << /Length 9 >>\nstream\nBT 72 700 Td (pdf inside) Tj ET\nendstream\n%%EOF"
    val zip = graft.sources.Archive.zipBytes(Seq(
      ("doc.rtf", rtf.getBytes(ISO_8859_1)),
      ("doc.pdf", pdf.getBytes(ISO_8859_1))))
    val out = Extract.explode(DocIn(50, Array(SpanIn("zip",
      new String(zip, ISO_8859_1), "", 0))))
    assert(out(1).spans.head.kind == "rtf")
    assert(out(1).spans.head.text == "nested rtf body")
    assert(out(2).spans.head.kind == "pdf_bytes")
    assert(out(2).spans.head.text == "pdf inside")
  }

  test("Jsonl.textField: depth tracking, escapes, malformed resilience") {
    import graft.core.text.Jsonl
    assert(Jsonl.textField("""{"text": "hello world"}""").contains("hello world"))
    // nested decoy must not win; top-level key later in the line must
    assert(Jsonl.textField("""{"meta": {"text": "decoy"}, "text": "real"}""").contains("real"))
    // full escape set incl. \uXXXX (the escape spelled via concat — Scala
    // would otherwise process a literal \u in SOURCE at compile time)
    val uline = "{\"text\": \"a\\\"b\\\\c\\n" + "\\" + "u0041d\"}"
    assert(Jsonl.textField(uline).contains("a\"b\\c\nAd"))
    // braces INSIDE string values must not corrupt depth
    assert(Jsonl.textField("""{"pre": "}{", "text": "after brace"}""").contains("after brace"))
    // non-string value, absent key, malformed line
    assert(Jsonl.textField("""{"text": 42}""").isEmpty)
    assert(Jsonl.textField("""{"other": "x"}""").isEmpty)
    assert(Jsonl.textField("""{"text": "unterminated""").isEmpty)
    assert(Jsonl.textField("""{"text": "bad \q escape"}""").isEmpty)
  }

  test("jsonl nested in a gzip explodes per line under a container child") {
    import graft.core.route.Extract
    import graft.core.{DocIn, SpanIn}
    import graft.sources.Archive
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    val payload = "{\"text\": \"zipped one\"}\n{\"text\": \"zipped two\"}"
    val gz = Archive.gzipBytes(payload.getBytes(UTF_8), "dump.jsonl")
    val nodes = Extract.explode(
      DocIn(99L, Array(SpanIn("gzip", new String(gz, ISO_8859_1), "", 0))))
    // gzip member -> jsonl container node -> two line children
    val texts = nodes.filter(_.level == 2).map(_.spans.map(_.text).mkString)
    assert(texts.toSet == Set("zipped one", "zipped two"))
  }

  test("jsonl sniff handles first records longer than the probe window") {
    import graft.core.text.Jsonl
    val big = "{\"text\": \"" + "x" * 10000 + "\"}\n{\"text\": \"b\"}"
    assert(Jsonl.looksJsonl(big.getBytes))
    // plain text that merely opens with a brace is NOT jsonl
    assert(!Jsonl.looksJsonl(("{ a brace then prose " + "y" * 10000).getBytes))
    // strict \uXXXX: parseInt would accept a sign and fabricate a char
    assert(Jsonl.textField("{\"text\": \"bad \\" + "u+041 escape\"}").isEmpty)
  }

  test("jsonl span explodes one child per line via the sniffed route") {
    import graft.core.route.Extract
    import graft.core.{DocIn, SpanIn}
    val payload = "{\"text\": \"first doc\"}\n{\"text\": \"second doc\"}\n{\"notext\": 1}"
    assert(graft.sources.Ingest.sniffKind(
      payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)) == "jsonl")
    val nodes = Extract.explode(DocIn(88L, Array(SpanIn("jsonl", payload, "", 0))))
    assert(nodes.count(_.level == 1) == 3)
    val texts = nodes.filter(_.level == 1).map(_.spans.map(_.text).mkString)
    assert(texts.toSet == Set("first doc", "second doc", ""))
    assert(nodes.exists(n => n.level == 1 && n.spans.isEmpty &&
      n.no_content_reason == graft.core.Reason.Empty))
  }

  test("vcard: unfolds, unescapes, filters to human-facing properties") {
    import graft.core.text.Contact
    val vcf = "BEGIN:VCARD\r\nVERSION:4.0\r\nFN:Ada\r\n Lovelace\r\n" +
      "ORG:Analytical\\, Ltd\r\nEMAIL:ada@example.org\r\n" +
      "NOTE:line one\\nline two\r\nX-SOMETHING:skip\r\nEND:VCARD\r\n"
    assert(Contact.isVcard(vcf.toLowerCase))
    assert(Contact.vcardText(vcf) ==
      "AdaLovelace\nAnalytical, Ltd\nada@example.org\nline one\nline two")
    // sniffed as its own kind from bytes
    assert(graft.sources.Ingest.sniffKind(vcf.getBytes("UTF-8"), "x.vcf") == "vcard")
  }

  test("ics: event summary/location/description extract in order") {
    import graft.core.text.Contact
    val ics = "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:Meet\r\n" +
      "LOCATION:Room 1\r\nDESCRIPTION:notes here\r\nDTSTART:20240101T000000Z\r\n" +
      "END:VEVENT\r\nEND:VCALENDAR\r\n"
    assert(Contact.isIcs(ics.toLowerCase))
    assert(Contact.icsText(ics) == "Meet\nRoom 1\nnotes here")
    assert(graft.sources.Ingest.sniffKind(ics.getBytes("UTF-8"), "c.ics") == "ics")
  }

  test("vcard: group prefixes, quoted-param colons, and BOM heads handle") {
    import graft.core.text.Contact
    // iOS/Google export shape: grouped properties still extract
    val grouped = "BEGIN:VCARD\r\nitem1.EMAIL;type=INTERNET:a@b.com\r\nitem1.X-ABLabel:work\r\nEND:VCARD\r\n"
    assert(Contact.vcardText(grouped) == "a@b.com")
    // a quoted LABEL param containing ':' must not truncate the value
    val quoted = "BEGIN:VCARD\r\nADR;LABEL=\"12 Main St: Apt 4\":the address\r\nEND:VCARD\r\n"
    assert(Contact.vcardText(quoted) == "the address")
    // UTF-8 BOM prefixed exports still sniff as their kind
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "BEGIN:VCARD\r\nFN:B\r\nEND:VCARD\r\n".getBytes("UTF-8")
    assert(graft.sources.Ingest.sniffKind(bom, "b.vcf") == "vcard")
    assert(Contact.isIcs("\ufeffBEGIN:VCALENDAR"))
    // nested non-ASCII vcard text decodes as UTF-8 through the entry path
    assert(graft.sources.Ingest.decodePayload("vcard",
      "BEGIN:VCARD\r\nFN:Jos\u00e9\r\nEND:VCARD\r\n".getBytes("UTF-8")).contains("Jos\u00e9"))
  }

  test("contact extractors are junk-tolerant, never throw") {
    import graft.core.text.Contact
    assert(Contact.vcardText("no colons here at all") == "")
    assert(Contact.icsText(":::") == "")
    assert(Contact.vcardText("FN:odd\nEMAIL:x@y") == "odd\nx@y")
  }

  test("xml: markup stripped, entities decoded, CDATA verbatim, comments skipped") {
    import graft.core.text.Xml
    val doc = "<?xml version=\"1.0\"?><!-- skip --><root a=\"dropped\">" +
      "<t>A &amp; B &#65; &#x42;</t><b>mid</b>tail" +
      "<![CDATA[raw <kept> &amp; undecoded]]><e/></root>"
    assert(Xml.text(doc) == "A & B A B\nmid\ntail\nraw <kept> &amp; undecoded")
    // unknown/unterminated entities pass through verbatim
    assert(Xml.text("<r>x &unknown; y &brok</r>") == "x &unknown; y &brok")
    // truncated structures stop cleanly
    assert(Xml.text("<r>ok<!-- never closed") == "ok")
    assert(Xml.text("<r><![CDATA[tail chars") == "tail chars")
    assert(Xml.text("<r>ok<unclosed") == "ok")
  }

  test("xml sniff: declaration-led xml routes, XHTML stays html") {
    import graft.sources.Ingest.sniffKind
    val xml = "<?xml version=\"1.0\"?><feed><entry>e</entry></feed>".getBytes("UTF-8")
    assert(sniffKind(xml, "feed.xml") == "xml")
    val xhtml = ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Strict//EN\" " +
      "\"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd\">\n" +
      "<html xmlns=\"http://www.w3.org/1999/xhtml\"><body><p>x</p></body></html>").getBytes("UTF-8")
    assert(sniffKind(xhtml, "page.xhtml") == "html")
    // the xml route through the span dispatch
    val (txt, why) = graft.core.route.Extract.extractSpan("xml", "<r><a>one</a><b>two</b></r>")
    assert(txt == "one\ntwo" && why == "")
    // nested non-ASCII xml decodes as UTF-8 through the entry path
    assert(graft.sources.Ingest.decodePayload("xml",
      "<?xml version=\"1.0\"?><r>café</r>".getBytes("UTF-8")).contains("café"))
  }
}
