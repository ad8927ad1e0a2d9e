package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.pdf.PdfMini
import graft.sources.Ingest

/** Real byte-stream ingestion: magic-byte sniffing, binaryFile source, and
  * the uncompressed-PDF parser against hand-written fixture bytes (golden —
  * the expected text is written next to the fixture, reference-style).
  */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val fixturePdf: String =
    """%PDF-1.4
      |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
      |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
      |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
      |4 0 obj << /Length 120 >>
      |stream
      |BT /F1 12 Tf 72 720 Td (Hello world) Tj 0 -14 Td (second \(escaped\) line) Tj T* (third line) Tj ET
      |endstream
      |endobj
      |trailer << /Root 1 0 R >>
      |%%EOF""".stripMargin

  test("PdfMini extracts Td/T*/escape text from a real uncompressed PDF") {
    val txt = PdfMini.text(fixturePdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(txt == "Hello world\nsecond (escaped) line\nthird line")
  }

  test("HTML bytes decode via their declared meta charset") {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val html = "<html><head><meta charset=\"windows-1252\"></head>" +
      "<body><p>café déjà vu money</p></body></html>"
    val bytes = html.getBytes(cp1252)
    assert(Ingest.sniffKind(bytes) == "html")
    assert(Ingest.htmlCharset(bytes).map(_.name).contains("windows-1252"))
    assert(Ingest.decodePayload("html", bytes).contains("café déjà vu"))
    // http-equiv form + unknown charset fallback
    val equiv = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head><body>olé</body></html>").getBytes(cp1252)
    assert(Ingest.decodePayload("html", equiv).contains("olé"))
    val junkCharset = "<html><head><meta charset=\"no-such-cs\"></head><body>x</body></html>".getBytes
    assert(Ingest.decodePayload("html", junkCharset).contains("x")) // utf-8 fallback
    // a charset token OUTSIDE a meta tag (URL, script text) must not
    // hijack the decode — Tika's detector only honors meta-scoped tokens
    val urlToken = ("<html><head><title>t</title></head><body>" +
      "<a href=\"/search?charset=utf-16le\">démo</a></body></html>")
      .getBytes(StandardCharsets.UTF_8)
    assert(Ingest.htmlCharset(urlToken).isEmpty)
    assert(Ingest.decodePayload("html", urlToken).contains("démo"))
  }

  test("text starting with BZh digits is not misclassified as bzip2") {
    // base64-ish text can begin with the 4 printable bzip2 prefix bytes;
    // only the full block signature (BCD pi) marks a real stream
    val fakey = "BZh9AbCdEfGh plain text that merely starts like bzip2".getBytes
    assert(!graft.sources.Archive.isBzip2(fakey))
    assert(Ingest.sniffKind(fakey) == "text")
    assert(graft.sources.Archive.isBzip2(
      graft.sources.Archive.bzip2Bytes("real stream".getBytes)))
  }

  test("PdfMini classifies /Encrypt trailers, not content-stream mentions") {
    val enc = "%PDF-1.4\nstream\nBT (x) Tj ET\nendstream\ntrailer << /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF"
    assert(PdfMini.isEncryptedLatin1(enc))
    // the word '/Encrypt' INSIDE a content stream string is not encryption
    val mention = "%PDF-1.4\nstream\nBT (/Encrypt is a pdf key) Tj ET\nendstream\ntrailer << /Root 1 0 R >>\n%%EOF"
    assert(!PdfMini.isEncryptedLatin1(mention))
    assert(PdfMini.textFromLatin1(mention) == "/Encrypt is a pdf key")
    // routed: encrypted yields the reason, never garbage text
    val (txt, why) = graft.core.route.Extract.extractSpan("pdf_bytes", enc)
    assert(txt == "" && why == graft.core.Reason.Encrypted)
    // PDF 1.5+ cross-reference-stream layout: no 'trailer' keyword,
    // /Encrypt lives in the xref stream dict (outside any payload)
    val xref = "%PDF-1.5\n5 0 obj << /Type /XRef /Encrypt 9 0 R /W [1 2 1] >>\nstream\nxx\nendstream\nendobj\nstartxref\n9\n%%EOF"
    assert(PdfMini.isEncryptedLatin1(xref))
    // .../Encrypt appearing only after 'endstream' inside ANOTHER payload
    val after = "%PDF-1.4\nstream\nBT (a) Tj ET\nendstream\ntrailer << /Root 1 0 R >>\n%%EOF"
    assert(!PdfMini.isEncryptedLatin1(after))
  }

  test("PdfMini handles Tm positioning, TJ arrays, and reading order") {
    val pdf =
      "%PDF-1.4\nstream\n" +
        "BT 1 0 0 1 72 700 Tm [(out) -20 ( of)] TJ 1 0 0 1 72 714 Tm (first) Tj ET\n" +
        "endstream\n%%EOF"
    // the 714-line sorts ABOVE the 700-line (PDF y axis points up)
    assert(PdfMini.textFromLatin1(pdf) == "first\nout of")
  }

  test("PdfMini decodes every PDF 7.4 text filter and the array chain") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val content = "BT 1 0 0 1 72 700 Tm (filter line) Tj ET".getBytes(ISO_8859_1)
    def pdfWith(fspec: String, enc: Array[Byte]): String =
      s"1 0 obj << /Filter $fspec >>\nstream\n${new String(enc, ISO_8859_1)}\nendstream"
    assert(PdfMini.textFromLatin1(
      pdfWith("/ASCIIHexDecode", PdfMini.asciiHexEncode(content))) == "filter line")
    assert(PdfMini.textFromLatin1(
      pdfWith("/ASCII85Decode", PdfMini.ascii85Encode(content))) == "filter line")
    assert(PdfMini.textFromLatin1(
      pdfWith("/RunLengthDecode", PdfMini.runLengthEncode(content))) == "filter line")
    assert(PdfMini.textFromLatin1(
      pdfWith("/LZWDecode", PdfMini.lzwEncode(content))) == "filter line")
    // array chain, applied in order: ASCII85 first, then Flate
    assert(PdfMini.textFromLatin1(
      pdfWith("[ /ASCII85Decode /FlateDecode ]",
        PdfMini.ascii85Encode(PdfMini.deflate(content)))) == "filter line")
    // abbreviated names (PDF 7.4 table 6 inline-image forms)
    assert(PdfMini.textFromLatin1(
      pdfWith("/AHx", PdfMini.asciiHexEncode(content))) == "filter line")
    // an image filter marks the stream non-text: skipped, never garbage
    assert(PdfMini.textFromLatin1(
      pdfWith("/DCTDecode", Array[Byte](-1, -40, -1, 0x2e))) == "")
    // malformed filter data degrades to a skipped stream
    assert(PdfMini.textFromLatin1(
      pdfWith("/ASCII85Decode", "vvvvv~>".getBytes(ISO_8859_1))) == "")
  }

  test("PdfMini LZW width growth and z-shorthand survive large payloads") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // enough distinct material to push the code width past 9 bits (>253
    // table adds) — exactness proves the early-change alignment
    val big = (0 until 600).map(i => s"w$i").mkString(" ").getBytes(ISO_8859_1)
    assert(PdfMini.lzwDecode(PdfMini.lzwEncode(big)).map(_.toSeq).contains(big.toSeq))
    val zeros = new Array[Byte](64) // all-zero groups exercise 'z'
    assert(PdfMini.ascii85Decode(PdfMini.ascii85Encode(zeros)).map(_.toSeq).contains(zeros.toSeq))
    val runs = Array.fill(300)(7.toByte) ++ "literal tail".getBytes(ISO_8859_1)
    assert(PdfMini.runLengthDecode(PdfMini.runLengthEncode(runs)).map(_.toSeq).contains(runs.toSeq))
  }

  test("PdfCrypt opens owner-restricted RC4 PDFs with the empty user password") {
    import graft.core.pdf.PdfCrypt
    import graft.core.route.Extract
    val content = "BT 1 0 0 1 72 700 Tm (secret line) Tj ET"
    val body = s"%PDF-1.4\n1 0 obj << /Length ${content.length} >>\n" +
      s"stream\n$content\nendstream\nendobj\n"
    // AES-256 (V5/R6), AES-128 (V4/R4), R3 / RC4-128, R2 / RC4-40 —
    // all owner-password-only, all must open with the empty user password
    for (r <- Seq(6, 4, 3, 2)) {
      val enc = PdfCrypt.encrypt(body, "owner-pw", "", r, 128, "fid")
      assert(PdfMini.isEncryptedLatin1(enc)) // ciphertext until decrypted
      assert(enc.indexOf(content) < 0)       // stream really is encrypted
      val (txt, why) = Extract.extractSpan("pdf_bytes", enc)
      assert(txt == "secret line" && why == "", s"r=$r")
    }
    // a REAL user password must classify encrypted, never emit garbage
    val locked = PdfCrypt.encrypt(body, "owner-pw", "user-pw", 3, 128, "fid")
    val (txt2, why2) = Extract.extractSpan("pdf_bytes", locked)
    assert(txt2 == "" && why2 == graft.core.Reason.Encrypted)
    // AES files with a REAL user password classify too (128 and 256)
    for (r <- Seq(4, 6)) {
      val lockedAes = PdfCrypt.encrypt(body, "owner-pw", "user-pw", r, 128, "fid")
      val (txt4, why4) = Extract.extractSpan("pdf_bytes", lockedAes)
      assert(txt4 == "" && why4 == graft.core.Reason.Encrypted, s"r=$r")
    }
  }

  test("PdfMini shows hex-string operands, alone and inside TJ arrays") {
    val pdf = "stream\nBT 1 0 0 1 72 700 Tm <48656C6C6F> Tj " +
      "1 0 0 1 72 686 Tm [<776F72> 5 <6C6421>] TJ ET\nendstream"
    assert(PdfMini.textFromLatin1(pdf) == "Hello\nworld!")
    // odd final digit pads low nibble with zero: <48656C6C6F2> = "Hello "
    assert(PdfMini.textFromLatin1(
      "stream\nBT <48656C6C6F2> Tj ET\nendstream") == "Hello ")
  }

  test("a UTF-8 BOM never leads the extracted text or blinds the sniff") {
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    val bytes = bom ++ "bom-led windows note".getBytes(StandardCharsets.UTF_8)
    assert(Ingest.sniffKind(bytes) == "text")
    assert(Ingest.decodePayload("text", bytes) == "bom-led windows note")
    // BOM'd markup still routes by its head magic (Tika strips pre-detect)
    val html = bom ++ "<html><body><p>bom page body</p></body></html>".getBytes(StandardCharsets.UTF_8)
    assert(Ingest.sniffKind(html) == "html")
    assert(Ingest.decodePayload("html", html).charAt(0) != '\uFEFF')
    val xml = bom ++ "<?xml version=\"1.0\"?><r><e>bom xml</e></r>".getBytes(StandardCharsets.UTF_8)
    assert(Ingest.sniffKind(xml) == "xml")
  }

  test("prose starting like a netpbm magic stays text; real pnm is image") {
    // "P4 500 errors" reads like a magic but fails structural validation
    val prose = "P4 500 errors observed in the last deploy window".getBytes
    assert(Ingest.sniffKind(prose) == "text")
    val p3 = "P3 2 1 255\n255 0 0  0 255 0\n".getBytes
    assert(Ingest.sniffKind(p3) == "image")
    val p6 = ("P6\n# made by hand\n2 1\n255\n" + " ÿ ÿ ÿ").getBytes("ISO-8859-1")
    assert(Ingest.sniffKind(p6) == "image")
  }

  test("content streams MENTIONING bfchar still extract; only referenced CMaps are tables") {
    val pdf = "%PDF-1.4\n7 0 obj << /Length 60 >>\nstream\n" +
      "BT 1 0 0 1 10 700 Tm (the beginbfchar operator) Tj ET\nendstream endobj\n%%EOF"
    assert(PdfMini.textFromLatin1(pdf) == "the beginbfchar operator")
  }

  test("ToUnicode CMaps decode CID glyph codes to text; bfrange forms work") {
    import graft.core.pdf.{PdfCmap, PdfMini}
    // the builder round-trips arbitrary line text through 2-byte codes
    val lines = Seq("heavy métal lives", "second line")
    assert(PdfMini.textFromLatin1(PdfMini.buildCid(lines)) == lines.mkString("\n"))
    // bfrange: incrementing destination and the bracketed array form
    val cm = PdfCmap.parse(
      """2 beginbfrange
        |<0001> <0003> <0041>
        |<0010> <0011> [<00480069> <0079006F>]
        |endbfrange""".stripMargin)
    assert(cm.codeBytes == 2)
    assert(PdfCmap.mapString("\u0000\u0001\u0000\u0003\u0000\u0010", cm) == "ACHi")
    // unmapped 2-byte codes emit nothing, never raw code units
    assert(PdfCmap.mapString("\u0000\u00ff", cm) == "")
    // junk CMaps parse best-effort without throwing
    PdfCmap.parse("beginbfchar <zz> <qq> endbfchar beginbfrange <1> endbfrange")
    PdfCmap.parse("beginbfrange <0001> <ffffffffffffffff> <41> endbfrange")
  }

  test("PdfMini never throws on arbitrary junk") {
    PdfMini.textFromLatin1("stream BT ( unclosed \\ ET endstream ((( [ /// 1 2")
    PdfMini.textFromLatin1("")
    PdfMini.textFromLatin1("no streams here")
    // malformed numerics from corrupt PDFs: bare signs, multi-dot, dangling
    PdfMini.textFromLatin1("stream\nBT - . -. 1.2.3 +. (x) Tj ET\nendstream")
    // legal '+'-signed numbers position correctly
    assert(PdfMini.textFromLatin1(
      "stream\nBT 1 0 0 1 +72 +700 Tm (a) Tj ET\nendstream") == "a")
  }

  test("FlateDecode: compressed content streams round-trip through inflate") {
    val content =
      "BT /F1 12 Tf 72 720 Td (Hello flate) Tj 0 -14 Td (compressed \\(line\\) two) Tj ET"
    val comp = new String(
      PdfMini.deflate(content.getBytes(StandardCharsets.ISO_8859_1)),
      StandardCharsets.ISO_8859_1)
    val pdf = s"%PDF-1.4\n4 0 obj << /Length ${comp.length} /Filter /FlateDecode >>\nstream\n$comp\nendstream\nendobj\n%%EOF"
    assert(PdfMini.textFromLatin1(pdf) == "Hello flate\ncompressed (line) two")
    // mixed document: one Flate stream + one raw stream, both extracted
    val mixed = pdf.replace("endobj\n%%EOF",
      "endobj\n5 0 obj << /Length 30 >>\nstream\nBT 72 600 Td (raw tail) Tj ET\nendstream\nendobj\n%%EOF")
    assert(PdfMini.textFromLatin1(mixed) ==
      "Hello flate\ncompressed (line) two\nraw tail")
  }

  test("FlateDecode: malformed/truncated/bomb-ish streams degrade, never throw") {
    // garbage bytes behind a Flate filter: stream skipped, parse continues
    val bad = "%PDF-1.4\n1 0 obj << /Filter /FlateDecode >>\nstream\nnot deflate at all\nendstream\n" +
      "2 0 obj << /Length 5 >>\nstream\nBT 72 700 Td (ok) Tj ET\nendstream\n%%EOF"
    assert(PdfMini.textFromLatin1(bad) == "ok")
    // truncated deflate payload
    val content = "BT (x) Tj ET"
    val comp = PdfMini.deflate(content.getBytes(StandardCharsets.ISO_8859_1))
    val trunc = new String(comp.take(comp.length / 2), StandardCharsets.ISO_8859_1)
    PdfMini.textFromLatin1(
      s"stream-owner obj << /Filter /FlateDecode >>\nstream\n$trunc\nendstream")
    assert(PdfMini.inflate(comp.take(comp.length / 2)).isEmpty)
    assert(PdfMini.inflate(comp).map(new String(_, StandardCharsets.ISO_8859_1))
      .contains(content))
  }

  test("cleanInfo strips document-information values, content byte-identical") {
    val withInfo = fixturePdf.replace("trailer << /Root 1 0 R >>",
      "5 0 obj << /Title (secret \\(draft\\)) /Author (alice) /Producer (tool v1) >> endobj\n" +
        "trailer << /Root 1 0 R /Info 5 0 R >>")
    val cleaned = PdfMini.cleanInfo(withInfo)
    assert(!cleaned.contains("secret") && !cleaned.contains("alice") && !cleaned.contains("tool v1"))
    assert(cleaned.contains("/Title ()") && cleaned.contains("/Author ()"))
    // extracted text content is untouched
    assert(PdfMini.textFromLatin1(cleaned) == PdfMini.textFromLatin1(withInfo))
    // idempotent
    assert(PdfMini.cleanInfo(cleaned) == cleaned)
  }

  test("cleanDoc blanks .doc SummaryInformation, content text identical") {
    import graft.core.office.{Cfb, SummaryInfo, WordDoc}
    val info = SummaryInfo.buildMixed(Seq(
      2 -> Right("Quarterly Report"), // title
      4 -> Right("alice"),            // author
      6 -> Right("do not share"),     // comments
      14 -> Left(7),                  // page count: NOT identifying, kept
      9 -> Right("rev 3")))           // revision: not in the blank set
    val doc = Cfb.build(WordDoc.buildStreams("legacy doc body text") :+
      ((SummaryInfo.StreamName, SummaryInfo.build(Seq.empty) /*placeholder*/)))
    // rebuild with the real info stream (placeholder kept build simple)
    val doc2 = Cfb.build(WordDoc.buildStreams("legacy doc body text") :+
      ((SummaryInfo.StreamName, info)))
    val cleaned = SummaryInfo.cleanDoc(doc2, 1 << 20)
    val entries = Cfb.streamEntries(cleaned, 1 << 20)
    // extracted text identical
    assert(graft.core.office.Msg.docText(entries).contains(
      graft.core.office.Msg.docText(Cfb.streamEntries(doc2, 1 << 20)).get))
    val props = SummaryInfo.parse(
      entries.collectFirst { case (n, Some(b)) if n == SummaryInfo.StreamName => b }.get)
    assert(props(2) == "" && props(4) == "" && props(6) == "")
    assert(props(9) == "rev 3") // non-identifying string preserved
    // raw bytes of the cleaned stream never leak the originals
    assert(!new String(cleaned, StandardCharsets.ISO_8859_1).contains("alice"))
    assert(!new String(cleaned, StandardCharsets.ISO_8859_1).contains("Quarterly"))
    // idempotent; a file without the stream passes through unchanged
    assert(SummaryInfo.cleanDoc(cleaned, 1 << 20).sameElements(cleaned))
    assert(SummaryInfo.cleanDoc(doc, 1 << 20) ne null)
    val plain = WordDoc.build("no info here")
    assert(SummaryInfo.cleanDoc(plain, 1 << 20) eq plain)
    // the VT_I4 page count survives byte-exactly through blank()
    val blanked = SummaryInfo.blank(info)
    assert(SummaryInfo.blank(blanked).sameElements(blanked)) // idempotent
    val reparsed = SummaryInfo.parse(blanked)
    assert(reparsed(2) == "" && reparsed(9) == "rev 3")
  }

  test("sniffKind detects pdf/html/zip/text/bin from magic bytes") {
    assert(Ingest.sniffKind("%PDF-1.7 x".getBytes) == "pdf_bytes")
    assert(Ingest.sniffKind("<!DOCTYPE html><p>x</p>".getBytes) == "html")
    assert(Ingest.sniffKind("<html><body>x".getBytes) == "html")
    assert(Ingest.sniffKind(Array[Byte](0x50, 0x4b, 0x03, 0x04, 9, 9)) == "zip")
    assert(Ingest.sniffKind("plain words only".getBytes) == "text")
    assert(Ingest.sniffKind(Array[Byte](0, 1, 2, 3, 4, 5, 0, 1)) == "bin")
  }

  test("binaryFile ingestion end-to-end: sniff, route, extract real files") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-ingest")
    Files.write(dir.resolve("a.pdf"), fixturePdf.getBytes(StandardCharsets.ISO_8859_1))
    Files.write(dir.resolve("b.html"),
      "<html><body><div><p>real page body</p></div></body></html>".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("c.txt"), "just plain text".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("d.bin"), Array[Byte](0, 1, 2, 3, 0, 1, 2, 3))

    val docs = Ingest.readDir(spark, dir.toString)
    val extracted = graft.pipeline.ExtractJob
      .extractPartitions(docs, graft.pipeline.ExtractJob.JobConfig())
      .collect()
    val byId = extracted.flatMap(_._1).map(d => d.doc_id -> d).toMap
    def textOf(name: String) = {
      val id = graft.core.Ids.rootId(Ingest.pathId(s"file:${dir.resolve(name)}"))
      byId(id).spans.map(_.text).mkString("\n")
    }
    assert(textOf("a.pdf") == "Hello world\nsecond (escaped) line\nthird line")
    assert(textOf("b.html") == "real page body")
    assert(textOf("c.txt") == "just plain text")
    assert(byId(graft.core.Ids.rootId(Ingest.pathId(s"file:${dir.resolve("d.bin")}")))
      .no_content_reason == graft.core.Reason.Unsupported) // the reference's garbage.bin golden
    // lineage: all four SUCCESS
    assert(extracted.flatMap(_._2).count(_.status == graft.core.Status.Success) == 4)
  }

  test("UTF-16 text (either BOM) ingests byte-exact (utf16-txt fixture analog)") {
    val txt = "heavy métal 中文 content"
    for (cs <- Seq(StandardCharsets.UTF_16LE, StandardCharsets.UTF_16BE)) {
      val bom: Array[Byte] =
        if (cs == StandardCharsets.UTF_16LE) Array(0xff.toByte, 0xfe.toByte)
        else Array(0xfe.toByte, 0xff.toByte)
      val bytes = bom ++ txt.getBytes(cs)
      assert(Ingest.sniffKind(bytes) == "text")
      assert(Ingest.decodeText(bytes) == txt)
    }
    val dir = Files.createTempDirectory("graft-utf16")
    Files.write(dir.resolve("u16.txt"),
      Array(0xff.toByte, 0xfe.toByte) ++ txt.getBytes(StandardCharsets.UTF_16LE))
    val got = Ingest.readDir(spark, dir.toString).collect()
    assert(got.head.spans.head.text == txt)
  }

  test("hidden/system matchers exclude dotfiles and OS junk from the walk") {
    val dir = Files.createTempDirectory("graft-hidden")
    Files.write(dir.resolve("normal.txt"), "keep me".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve(".hidden.txt"), "dotfile".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("Thumbs.db"), Array[Byte](0, 1, 2, 3))
    Files.write(dir.resolve("desktop.ini"), "[junk]".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("~$lock.docx"), Array[Byte](4, 5))
    val kept = Ingest.readDir(spark, dir.toString).collect()
    assert(kept.length == 1)
    assert(kept.head.spans.head.text == "keep me")
    // opt-out keeps the junk (dotfiles stay excluded — Spark's file index
    // drops '.'/'_' prefixed names at LISTING time, before any read)
    val all = Ingest.readDir(spark, dir.toString, excludeHidden = false).collect()
    assert(all.length == 4)
    // the predicate itself
    assert(Ingest.isHiddenOrSystem("/a/b/.profile"))
    assert(Ingest.isHiddenOrSystem("/a/b/Thumbs.db"))
    assert(Ingest.isHiddenOrSystem("/a/~$doc.docx"))
    assert(!Ingest.isHiddenOrSystem("/a/b/report.pdf"))
  }

  test("a corpus rooted under a dot-directory scans via a trailing-slash URI root") {
    // components ABOVE the scan root must never junk-match — including
    // when the root arrives as a scheme'd URI with a trailing slash
    // (file:/x/), where the quoted pattern used to end '//' and never
    // strip, junk-checking the dot-directory root itself
    val base = Files.createTempDirectory("graft-dotroot")
    val dotRoot = base.resolve(".archive")
    Files.createDirectories(dotRoot.resolve("sub"))
    Files.write(dotRoot.resolve("sub").resolve("keep.txt"),
      "kept under dot root".getBytes(StandardCharsets.UTF_8))
    Files.write(dotRoot.resolve("sub").resolve(".drop.txt"),
      "dropped".getBytes(StandardCharsets.UTF_8))
    val uriRoot = "file:" + dotRoot.toString + "/"
    val got = Ingest.readDir(spark, uriRoot).collect()
    assert(got.length == 1)
    assert(got.head.spans.head.text == "kept under dot root")
    // the column predicate directly: above-root dot component is immune,
    // below-root one matches
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val paths = Seq(
      "file:/corpus/.archive/data/report.pdf",
      "file:/corpus/.archive/data/.hidden.pdf").toDF("path")
    val junk = paths.filter(Ingest.junkNameFilter(col("path"), "file:/corpus/.archive/"))
      .as[String].collect().toSet
    assert(junk == Set("file:/corpus/.archive/data/.hidden.pdf"))
  }

  test("decodeAviMjpeg round-trips and rejects malformed containers cleanly") {
    import graft.multimodal.Media
    val avi = Media.encodeAviMjpeg(40, 28, Seq(0xff0000, 0x00ff00, 0x0000ff))
    assert(Media.decodeAviMjpeg(avi) == (3, 40, 28, 3, 40, 28))
    // malformed inputs: classified failures, never hangs/overruns/NPEs
    def rejects(b: Array[Byte]): Unit =
      intercept[Exception](Media.decodeAviMjpeg(b)): Unit
    rejects(Array[Byte](1, 2, 3))                       // truncated
    rejects("RIFF\u0000\u0000\u0000\u0000AVI ".getBytes("ISO-8859-1") ++
      "00dc".getBytes ++ Array[Byte](-1, -1, -1, -1))   // negative chunk size
    rejects("RIFFxxxxAVI 00dc".getBytes("ISO-8859-1") ++
      Array[Byte](100, 0, 0, 0))                        // size beyond buffer
    val notJpeg = {
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(16).put("AVI ".getBytes)
        .put("00dc".getBytes).putInt(4).put("junk".getBytes)
      bb.array()
    }
    rejects(notJpeg)                                    // undecodable frame
  }
}
