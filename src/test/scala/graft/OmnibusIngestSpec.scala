package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.office.{Cfb, Msg, Ppt, WordDoc, Xls}
import graft.core.route.Extract
import graft.sources.{Archive, Ingest, Warc}

/** The whole sniff surface in one real directory: every supported format
  * written to disk, walked by the actual binaryFile ingestion, and
  * extracted end-to-end — the closest thing to dropping the reference's
  * test-documents folder on the engine. Each format asserts its canonical
  * text (or child explosion) so a sniff-precedence regression in any one
  * route fails loudly here.
  */
class OmnibusIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("a mixed-format directory ingests and extracts end-to-end") {
    val dir = Files.createTempDirectory("graft-omnibus")
    def put(name: String, bytes: Array[Byte]): Unit =
      Files.write(Paths.get(dir.toString, name), bytes)

    put("page.html",
      "<html><head><meta charset=\"windows-1252\"></head><body><p>page café body</p></body></html>"
        .getBytes(java.nio.charset.Charset.forName("windows-1252")))
    put("note.txt", "plain text note here".getBytes(UTF_8))
    put("doc.pdf",
      ("%PDF-1.4\n1 0 obj << /Length 30 >>\nstream\nBT (pdf text line) Tj ET\nendstream\nendobj\ntrailer\n%%EOF")
        .getBytes(ISO_8859_1))
    put("sheet.rtf", """{\rtf1\ansi{\fonttbl{\f0 F;}}\f0 rtf body text}""".getBytes(ISO_8859_1))
    put("table.csv", "a,b\nc,d".getBytes(UTF_8))
    put("arch.zip", Archive.zipBytes(Seq(("in.txt", "zip member".getBytes(UTF_8)))))
    put("roll.tgz", Archive.gzipBytes(
      Archive.tarBytes(Seq(("t.txt", "tar member".getBytes(UTF_8)))), "roll.tar"))
    put("frame.zst", Archive.zstdBytes("zstd member".getBytes(UTF_8)))
    put("block.bz2", Archive.bzip2Bytes("bzip2 member".getBytes(UTF_8)))
    put("mail.eml",
      ("From: a@example.com\r\nTo: b@example.com\r\nSubject: s\r\n" +
        "Content-Type: text/plain\r\n\r\neml body text").getBytes(UTF_8))
    put("msg.msg", Msg.build(Msg.MsgDoc("subj", "from", "msg body text",
      Vector(Msg.FileAtt("a.txt", "msg attachment".getBytes(UTF_8))))))
    put("old.doc", WordDoc.build("legacy doc text"))
    put("old.xls", Xls.build(Seq(Seq(("cell one", false), ("2", true)))))
    put("old.ppt", Ppt.build(Seq("slide text")))
    put("crawl.warc", Warc.build(Seq(
      ("conversion", "http://x.example/a", "text/plain", "wet record text".getBytes(UTF_8)))))
    put("dump.jsonl",
      "{\"text\": \"jsonl one\"}\n{\"text\": \"jsonl two\"}".getBytes(UTF_8))
    put("generic.cfb", Cfb.build(Seq(("s.txt", "cfb stream text".getBytes(UTF_8)))))
    put("mail.pst", graft.core.office.Pst.build(Seq(
      graft.core.office.Pst.BuildFolder("inbox", Seq(
        graft.core.office.Pst.BuildMsg("s", "pst message body"))))))
    // extensionless mail detected by its strong Received: header
    put("relayed_mail",
      ("Received: from relay.example\r\nFrom: x@example.com\r\n" +
        "Content-Type: text/plain\r\n\r\nextensionless mail body").getBytes(UTF_8))
    put("win.tnef", graft.core.mail.Tnef.build("ts", "tf", "tnef body text",
      Seq(("t.txt", "tnef attachment".getBytes(UTF_8)))))
    put("card.vcf",
      "BEGIN:VCARD\r\nFN:Card Name\r\nEMAIL:card@example.org\r\nEND:VCARD\r\n".getBytes(UTF_8))
    put("cal.ics",
      ("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:cal event\r\n" +
        "END:VEVENT\r\nEND:VCALENDAR\r\n").getBytes(UTF_8))
    put("list.mbox",
      ("From a@x Mon Jan  1 00:00:00 2024\nSubject: m1\n\nmbox msg one\n" +
        "From b@y Tue Jan  2 00:00:00 2024\nSubject: m2\n\nmbox msg two\n").getBytes(UTF_8))
    put("frame.xz", Archive.xzBytes("xz member".getBytes(UTF_8)))
    put("frame.lz4", Archive.lz4Bytes("lz4 member".getBytes(UTF_8)))
    put("frame.sz", Archive.snappyBytes("snappy member".getBytes(UTF_8)))
    put("old.pst", graft.core.office.Pst.build(Seq(
      graft.core.office.Pst.BuildFolder("box", Seq(
        graft.core.office.Pst.BuildMsg("a", "ansi permute pst body")))),
      crypt = 1, ansi = true))
    put("dump.parquet", graft.sources.ParquetDump.build(Seq("parquet row text")))
    put("app.db", graft.core.db.Sqlite.build(Seq(("notes", Seq("body"),
      Seq(Seq(graft.core.db.Sqlite.TextCell("sqlite row text")))))))
    put("state.plist", graft.core.db.Plist.build(graft.core.db.Plist.PDict(Vector(
      "status" -> graft.core.db.Plist.PString("plist status text")))))
    put("dump.avro", graft.sources.AvroDump.build(Seq("avro row text")))
    put("feed.xml",
      "<?xml version=\"1.0\"?><feed><entry>xml feed text</entry></feed>".getBytes(UTF_8))
    put("book.epub", graft.core.office.Epub.build("Omni Book",
      Seq(("c.xhtml", "<html><body><p>epub chapter text</p></body></html>"))))
    put("photo.jpg", graft.core.media.Probe.jpegWithExif(
      graft.multimodal.Media.encodeSolid(8, 6, 0x123456, "jpg"), 1, "Cam", "M"))
    put("shot.png", graft.core.media.Probe.pngWithText(
      graft.multimodal.Media.encodePng(5, 4, 0xabcdef), Seq(("Title", "shot"))))
    put("anim.gif", graft.multimodal.Media.encodeSolid(7, 3, 0x00ff00, "gif"))
    put("clip.mp4", graft.core.media.Probe.buildMp4("isom", 600, 1200, 1))
    put("song.mp3", graft.core.media.Probe.buildMp3(3))
    put("tone.wav", graft.multimodal.Media.encodeWav(8000, 16, 5))
    put("lib.a", Archive.arBytes(Seq(("member.txt", "ar member text".getBytes(UTF_8)))))
    put("pack.deb", Archive.arBytes(Seq(
      ("debian-binary", "2.0\n".getBytes(UTF_8)),
      ("control.tar.gz", Archive.gzipBytes(
        Archive.tarBytes(Seq(("control", "deb control text".getBytes(UTF_8)))), "control.tar")),
      ("data.tar.xz", Archive.xzBytes(
        Archive.tarBytes(Seq(("usr/doc.txt", "deb data text".getBytes(UTF_8)))))))))
    put("boot.cpio", Archive.cpioBytes(Seq(("init.txt", "cpio member text".getBytes(UTF_8)))))
    put("pkg.rpm", Archive.rpmBytes(Archive.gzipBytes(
      Archive.cpioBytes(Seq(("bin/t.txt", "rpm file text".getBytes(UTF_8)))))))
    put("scan.tiff", graft.core.media.Probe.buildTiff(9, 7, 1, "Mk", "Md"))
    put("img.bmp", graft.core.media.Probe.buildBmp(6, 4, topDown = false))
    put("pic.webp", graft.core.media.Probe.buildWebpLossless(12, 8))
    put("fav.ico", graft.core.media.Probe.buildIco(
      graft.multimodal.Media.encodePng(16, 16, 0), 16, 16))
    put("sheet.ods", graft.core.office.Odf.buildSpreadsheet(
      Seq(Seq("ods alpha", "ods beta"))))
    put("deck.odp", graft.core.office.Odf.buildPresentation(
      Seq(Seq("odp slide text"))))
    put("notes.txt.Z", Archive.compressZBytes("compress member text".getBytes(UTF_8)))
    put("pack.rar", graft.sources.Rar.buildRar4(Seq(("m.txt", "rar member text".getBytes(UTF_8)))))
    put("pack5.rar", graft.sources.Rar.buildRar5(Seq(("n.txt", "rar5 member text".getBytes(UTF_8)))))
    put("doc.xps", graft.core.office.Xps.build(Seq(Seq("xps glyph text"))))
    put("msg.emlx", ("From: e@x\r\nContent-Type: text/plain\r\n\r\nemlx store body").getBytes(UTF_8).length.toString.getBytes(UTF_8)
      ++ "\n".getBytes(UTF_8)
      ++ ("From: e@x\r\nContent-Type: text/plain\r\n\r\nemlx store body").getBytes(UTF_8)
      ++ "<plist/>".getBytes(UTF_8))
    put("saved.mht", graft.core.mail.Mhtml.build("https://x.example/p.html",
      "<html><body><p>mhtml page body</p></body></html>",
      Seq("https://x.example/r/res.txt" -> "mht resource text".getBytes(UTF_8))))
    put("evidence.iso", graft.sources.Iso.build(Seq(
      ("R.TXT", "iso root text".getBytes(UTF_8)),
      ("D/N.TXT", "iso nested text".getBytes(UTF_8)))))
    put("gis.dbf", graft.core.db.Dbf.build(Seq("COL"), Seq(Seq("dbf cell text"))))
    put("brief.wpd", graft.core.office.Wpd.build(Seq("wpd brief text")))
    put("recent.lnk", graft.core.office.Lnk.build("C:\\omni\\seen.doc"))
    put("old.lzma", graft.sources.Archive.lzmaBytes("lzma member text".getBytes(UTF_8)))
    put("help.chm", graft.sources.Chm.build(Seq(("t.txt", "chm topic text".getBytes(UTF_8))), compress = true))
    put("driver.cab", graft.sources.Cab.build(Seq(("t.txt", "cab member text".getBytes(UTF_8))), compress = true))
    put("sealed.docx", graft.core.office.OoxmlCrypt.buildEncrypted(
      graft.core.office.Docx.buildMinimal(Seq("velvet docx text")), "VelvetSweatshop"))
    put("book.xlsb", graft.core.office.Xlsb.buildMinimal(Seq(Seq(("xlsb cell text", false)))))
    put("brief.pages", graft.core.office.Iwork.buildPages(Seq("iwork pages text")))
    put("notes.one", graft.core.office.OneNote.build(Seq("onenote note text")))
    put("flyer.pub", graft.core.office.Pub.build(Seq("publisher story text")))
    put("rich.msg", graft.core.office.Msg.buildRtfBody(graft.core.office.Msg.MsgDoc(
      "rich", "r@example.com", "compressed rtf body text", Vector.empty)))
    put("brief.hwp", graft.core.office.Hwp.build(Seq("hangul body text")))
    put("diagram.vsdx", graft.core.office.Vsdx.buildMinimal(Seq(Seq("visio shape text"))))
    put("memo.as", graft.sources.Apple.build("memo.txt", "apple fork text".getBytes(UTF_8)))
    put("Thumbs.db", Array[Byte](1, 2, 3)) // junk: must be excluded

    val docs = Ingest.readDir(spark, dir.toString).collect()
    assert(docs.length == 71) // every file except the junk one

    // media classify by magic and parse to empty-file (metadata, no OCR)
    val kinds = docs.flatMap(_.spans.map(_.kind))
    assert(kinds.count(_ == "image") == 7 && kinds.count(_ == "av") == 3)
    val mediaDocs = docs.filter(_.spans.exists(s => s.kind == "image" || s.kind == "av"))
    assert(mediaDocs.flatMap(d => Extract.explode(d))
      .forall(o => o.no_content_reason == graft.core.Reason.Empty))

    val texts = docs.flatMap(d => Extract.explode(d))
      .flatMap(o => o.spans.map(_.text)).filter(_.nonEmpty).toSet
    val expected = Set(
      "page café body", "plain text note here", "pdf text line",
      "rtf body text", "a\tb\nc\td", "zip member", "tar member",
      "zstd member", "bzip2 member", "eml body text", "msg body text",
      "msg attachment", "legacy doc text", "cell one\t2", "slide text",
      "wet record text", "jsonl one", "jsonl two", "cfb stream text",
      "extensionless mail body", "pst message body",
      "tnef body text", "tnef attachment", "Card Name" + "\n" + "card@example.org",
      "cal event", "mbox msg one", "mbox msg two",
      "xz member", "lz4 member", "snappy member", "ansi permute pst body",
      "parquet row text", "avro row text", "Omni Book\nepub chapter text",
      "xml feed text", "body\nsqlite row text", "status: plist status text",
      "ar member text", "2.0\n", "deb control text", "deb data text",
      "cpio member text", "rpm file text",
      "mhtml page body", "mht resource text",
      "ods alpha\tods beta", "odp slide text", "compress member text",
      "rar member text", "rar5 member text", "xps glyph text", "emlx store body",
      "iso root text", "iso nested text", "COL\ndbf cell text", "wpd brief text",
      "target: C:\\omni\\seen.doc", "lzma member text", "chm topic text",
      "cab member text", "velvet docx text", "xlsb cell text",
      "iwork pages text", "onenote note text", "publisher story text",
      "compressed rtf body text", "hangul body text\n", "visio shape text",
      "apple fork text")
    val missing = expected -- texts
    assert(missing.isEmpty, s"formats missing from extraction: $missing")
  }
}
