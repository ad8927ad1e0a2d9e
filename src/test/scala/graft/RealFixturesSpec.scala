package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DocIn, Reason, SpanIn}
import graft.core.route.Extract
import graft.sources.Ingest

/** The reference's OWN test corpus (`extract-lib/src/test/resources/
  * documents/` — real Word/Outlook/Tika-authored files, not synthetic
  * fixtures) run end-to-end, asserting the same golden expectations the
  * reference's `ExtractorTest`/`EmbeddedDocumentMemoryExtractorTest`
  * assert: exact texts, the 4-level recursive-embed chain, duplicate
  * content at distinct tree positions, and the failure taxonomy.
  */
class RealFixturesSpec extends AnyFunSuite {

  private val D = "/root/reference/extract-lib/src/test/resources/documents"

  private def bytesOf(rel: String): Array[Byte] =
    Files.readAllBytes(Paths.get(D, rel))

  private def explodeFile(rel: String): Vector[graft.core.DocOut] = {
    val bytes = bytesOf(rel)
    val kind = Ingest.sniffKind(bytes, rel.split('/').last)
    val payload = Ingest.decodePayload(kind, bytes)
    Extract.explode(DocIn(1L, Array(SpanIn(kind, payload, "", 0)))).toVector
  }

  private def rootText(rel: String): String =
    explodeFile(rel).find(_.level == 0).get.spans.map(_.text).mkString("")

  test("text fixtures: plain, UTF-16 (BOM stripped), RTF golden text") {
    assert(rootText("text/plain.txt") == "This is a test.\n")
    // the reference's expected/utf16-txt.html golden body
    assert(rootText("text/utf16.txt") == "This is a test.\n")
    // ExtractorTest: Assert.assertEquals("RTF Text Document", text.trim())
    assert(rootText("text/doc.rtf").trim == "RTF Text Document")
  }

  test("csv_document.csv extracts all rows with accents intact") {
    val txt = rootText("csv_document.csv")
    // header + 10 rows (the reference's own count of 12 includes its
    // HTML rendering's trailing line, not the table's content)
    assert(txt.split("\n", -1).count(_.nonEmpty) == 11)
    assert(txt.contains("Prénom") && txt.contains("Téléphone"))
    assert(txt.contains("Anaïs")) // row accents survive the decode
  }

  test("garbage.bin classifies unsupported-media-type with empty content") {
    val root = explodeFile("garbage.bin").head
    assert(root.spans.map(_.text).mkString("").isEmpty)
    assert(root.no_content_reason == Reason.Unsupported) // ExtractorTest golden
  }

  test("a real Word-authored .doc extracts its body text") {
    assert(rootText("office_document.doc").trim == "Test something")
  }

  test("recursive_embedded.docx: the full 4-level Ole10Native chain extracts") {
    val nodes = explodeFile("recursive_embedded.docx")
    val texts = nodes.map(n => n.spans.map(_.text).mkString("").trim).toSet
    assert(texts.exists(_.startsWith("embed_0"))) // root document body
    // EmbeddedDocumentMemoryExtractorTest: "embed_1a" is the exact content
    // of the first nested text file; the chain runs to embed_4
    Seq("embed_1a", "embed_1b", "embed_2a", "embed_2b", "embed_4").foreach(t =>
      assert(texts.contains(t), s"missing $t in ${texts.take(20)}"))
    assert(texts.exists(_.startsWith("embed_3"))) // the long declaration text
    assert(nodes.map(_.level).max >= 6) // docx > ole > zip > zip > zip > zip > txt
    assert(nodes.map(_.doc_id).distinct.length == nodes.length) // ids all distinct
    // the real EMF print image (word/media/image1.emf) sniffs as an image
    val zipEntries = graft.sources.Archive.unzip(
      bytesOf("recursive_embedded.docx"), 1 << 24)
    val emf = zipEntries.collectFirst { case (n, Some(b)) if n.endsWith(".emf") => b }.get
    assert(Ingest.sniffKind(emf, "image1.emf") == "image")
  }

  test("3rd-level-bug-732.msg: real Outlook nesting explodes three levels") {
    val nodes = explodeFile("3rd-level-bug-732.msg")
    def levelTexts(l: Int) =
      nodes.filter(_.level == l).map(_.spans.map(_.text).mkString("").trim)
    assert(levelTexts(0).exists(_.contains("Test3")))
    assert(levelTexts(1).exists(_.contains("Test2")))
    assert(levelTexts(2).exists(_.contains("test")))
    assert(nodes.exists(_.level >= 3)) // the innermost attachment
  }

  test("embedded_with_duplicate.tgz: duplicate content keeps distinct ids") {
    val nodes = explodeFile("embedded_with_duplicate.tgz")
    val texts = nodes.map(n => n.spans.map(_.text).mkString("").trim)
    assert(texts.contains("level1") && texts.contains("level2"))
    // the one-pixel jpg rides at BOTH levels with IDENTICAL bytes — the
    // "duplicate" in the fixture's name: verify the premise on the raw
    // entries, and that the tree keeps every node id distinct anyway
    val outer = graft.sources.Archive.untar(
      graft.sources.Archive.gunzip(bytesOf("embedded_with_duplicate.tgz"), 1 << 24)._2.get, 1 << 24)
    val jpgOuter = outer.collectFirst {
      case (n, Some(b)) if n.endsWith(".jpg") => b }.get
    val inner = graft.sources.Archive.untar(
      graft.sources.Archive.gunzip(outer.collectFirst {
        case (n, Some(b)) if n.endsWith(".tgz") => b }.get, 1 << 24)._2.get, 1 << 24)
    val jpgInner = inner.collectFirst {
      case (n, Some(b)) if n.endsWith(".jpg") => b }.get
    assert(java.util.Arrays.equals(jpgOuter, jpgInner)) // true duplicates
    assert(nodes.map(_.doc_id).distinct.length == nodes.length)
  }

  test("pdf fixtures: encrypted classifies, image-only parses to empty") {
    assert(explodeFile("pdf/encrypted.pdf").head.no_content_reason == Reason.Encrypted)
    val imageOnly = explodeFile("ocr/embedded.pdf").head // reference (no OCR): whitespace only
    assert(imageOnly.spans.map(_.text).mkString("").trim.isEmpty)
  }

  test("real mail fixtures extract bodies and spawn attachments") {
    val n1 = explodeFile("image_attachment.eml")
    assert(n1.head.spans.map(_.text).mkString("").trim ==
      "This email has an attached PNG image for testing deferred OCR determinism.")
    assert(n1.exists(_.level == 1)) // the PNG attachment child
    val n2 = explodeFile("embedded_file_bug.eml")
    assert(n2.head.spans.map(_.text).mkString("").trim == "mail body")
    assert(n2.exists(_.level >= 1))
  }

  test("ocr image fixtures sniff as media kinds") {
    Seq("ocr/test.png" -> "image", "ocr/test.jpg" -> "image",
      "ocr/test.tif" -> "image", "ocr/test.gif" -> "image",
      "ocr/test.bmp" -> "image",
      // the 2.4 MB netpbm file must NEVER index its pixels as prose, and
      // the JP2 signature box is an image, not bin
      "ocr/test.ppm" -> "image", "ocr/test.jp2" -> "image",
      "ocr/test.jpx" -> "image",
      "ocr/test_tiff_multipage.tif" -> "image").foreach { case (f, k) =>
      assert(Ingest.sniffKind(bytesOf(f), f.split('/').last) == k, f)
    }
    // the embedded-doc mail extracts its body; attachment spawns
    val n = explodeFile("ocr/embedded_doc.eml")
    assert(n.head.spans.map(_.text).mkString("").trim == "test embedded")
    assert(n.exists(_.level == 1))
  }

  test("expected/ goldens: every reference golden is pinned or documented n-a") {
    import java.nio.charset.StandardCharsets.UTF_8
    val E = "/root/reference/extract-lib/src/test/resources/expected"
    def golden(f: String): String =
      new String(Files.readAllBytes(Paths.get(E, f)), UTF_8)
    def bodyOf(html: String): String =
      html.substring(html.indexOf("<body>") + 6, html.indexOf("</body>"))

    // --- utf16-txt.html (ExtractorTest.java:328): the HTML-format output
    // of text/utf16.txt. The Tika meta headers are engine internals (n-a);
    // the BODY TEXT is the contract — our HTML renderer must carry it
    // exactly (UTF-16LE decoded, BOM stripped, trailing newline kept).
    val gText = bodyOf(golden("utf16-txt.html")).replaceAll("<[^>]*>", "")
    assert(gText == "This is a test.\n") // the golden really pins this
    val utf16 = explodeFile("text/utf16.txt").head
    val ourHtml = graft.pipeline.Sink.renderHtml(utf16)
    val ourText = "<p>(.*?)</p>".r.findAllMatchIn(ourHtml).map(_.group(1)).mkString("\n")
    assert(ourText == gText)

    // --- embedded-pdf.html + embedded-data-uri-pdf.html
    // (ExtractorTest.java:358): ocr/embedded.pdf renders one div per page,
    // each with an embedded image child (embedded:imageN.png) and its
    // Tesseract OCR text ("HEAVY METAL"). The OCR TEXT is out per the
    // north rule (documented n-a); the embedded-image STRUCTURE is
    // pinned: both pages' Flate rasters spawn as decodable PNG children
    // under the golden's names at the golden images' dimensions.
    Seq("embedded-pdf.html", "embedded-data-uri-pdf.html").foreach { g =>
      val h = golden(g)
      Vector("image0.png", "image1.png").foreach(n =>
        assert(h.contains(s"embedded:$n"), s"$g lost its $n"))
    }
    val pdfLatin1 = new String(bytesOf("ocr/embedded.pdf"), ISO_8859_1)
    val imgs = graft.core.pdf.PdfMini.imageXObjects(pdfLatin1)
    assert(imgs.map(_._1) == Vector("image0.png", "image1.png"))
    imgs.foreach { case (n, b) =>
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(im != null && im.getWidth == 306 && im.getHeight == 165, n)
    }
    val nodes = explodeFile("ocr/embedded.pdf")
    val root = nodes.find(_.level == 0).get
    val kids = nodes.filter(_.level == 1)
    assert(kids.size == 2)
    // content-derived id parity: the children ARE those PNG bytes
    assert(kids.map(_.doc_id).toSet == imgs.zipWithIndex.map { case ((n, b), i) =>
      graft.core.Ids.embedId(new String(b, ISO_8859_1), root.doc_id, i, resourceName = n)
    }.toSet)
    // no OCR: the root body stays empty (the goldens' div.ocr text is n-a)
    assert(root.spans.map(_.text).mkString("").isEmpty)
  }

  test("the directory walk drops the reference's hidden and system files") {
    val spark = SparkTestBase.spark
    val docs = Ingest.readDir(spark, D).collect()
    assert(docs.nonEmpty)
    // documents/.hidden (a dotfile) and lost+found/trashed (OS junk) exist
    // on disk but never enter the queue — ScannerTest's exact expectation
    assert(Files.exists(Paths.get(D, ".hidden")))
    assert(Files.exists(Paths.get(D, "lost+found/trashed")))
    import scala.jdk.CollectionConverters._
    val onDisk = Files.walk(Paths.get(D)).iterator().asScala
      .filter(Files.isRegularFile(_)).toVector
    val visible = onDisk.filterNot { p =>
      val n = p.getFileName.toString
      n.startsWith(".") || p.toString.contains("lost+found")
    }
    assert(onDisk.length == visible.length + 2) // exactly the two junk files
    assert(docs.length == visible.length)
  }
}
