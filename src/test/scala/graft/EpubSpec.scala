package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DocIn, ParseFailure, Reason, SpanIn}
import graft.core.office.Epub
import graft.core.route.Extract
import graft.sources.Archive

/** EPUB packages (Tika EpubParser analog): verified-mimetype detection,
  * spine-ordered chapter text, manifest-driven image children, href
  * resolution, and malformed-package refusals.
  */
class EpubSpec extends AnyFunSuite {

  private def span(bytes: Array[Byte]) =
    DocIn(1L, Array(SpanIn("zip", new String(bytes, ISO_8859_1), "", 0)))

  test("spine order, not manifest or archive order, drives the book text") {
    // archive+manifest order is name-sorted (a.xhtml, b.xhtml); the spine
    // says b THEN a — the text must follow the spine
    val epub = Epub.build("My Book", Seq(
      ("b.xhtml", "<html><body><p>second file first</p></body></html>"),
      ("a.xhtml", "<html><body><p>first file second</p></body></html>")))
    val entries = Archive.unzip(epub, 1 << 20)
    assert(Epub.isEpub(entries))
    assert(Epub.bookText(entries) ==
      "My Book\nsecond file first\nfirst file second")
  }

  test("epub explodes through the span route: body text + image children") {
    val png = graft.multimodal.Media.encodePng(4, 3, 0x112233)
    val epub = Epub.build("T", Seq(
      ("ch1.xhtml", "<html><body><p>chapter one</p></body></html>")),
      images = Seq(("img/cover.png", png)))
    val out = Extract.explode(span(epub))
    val root = out.find(_.level == 0).get
    assert(root.spans.map(_.text).mkString("") == "T\nchapter one")
    val kids = out.filter(_.level == 1)
    assert(kids.size == 1) // the manifest image, NOT the package internals
    assert(kids.head.no_content_reason == Reason.Empty) // image: metadata, no OCR
  }

  test("a generic zip with a non-epub mimetype entry keeps exploding generically") {
    val zip = Archive.zipBytes(Seq(
      ("mimetype", "text/weird".getBytes(UTF_8)),
      ("META-INF/container.xml", "<container/>".getBytes(UTF_8)),
      ("doc.txt", "plain member".getBytes(UTF_8))))
    val entries = Archive.unzip(zip, 1 << 20)
    assert(!Epub.isEpub(entries))
    val out = Extract.explode(span(zip))
    assert(out.exists(o => o.spans.exists(_.text == "plain member")))
  }

  test("malformed packages classify as ParseFailure") {
    // verified mimetype but no container.xml
    val noContainer = Vector[(String, Option[Array[Byte]])](
      ("mimetype", Some(Epub.Mime.getBytes(UTF_8))),
      ("OEBPS/a.xhtml", Some("<p>x</p>".getBytes(UTF_8))))
    intercept[ParseFailure](Epub.bookText(noContainer))
    // container names an OPF that is not in the package
    val ghostOpf = Vector[(String, Option[Array[Byte]])](
      ("mimetype", Some(Epub.Mime.getBytes(UTF_8))),
      ("META-INF/container.xml", Some(
        """<container><rootfiles><rootfile full-path="gone.opf"/></rootfiles></container>"""
          .getBytes(UTF_8))))
    intercept[ParseFailure](Epub.bookText(ghostOpf))
    // and through the span route it stays a TYPED failure for the job
    // layer to classify (top-level spans: same contract as corrupt zips)
    val epubBytes = Archive.zipBytes(ghostOpf.map { case (n, b) => (n, b.get) })
    intercept[ParseFailure](Extract.explode(span(epubBytes)))
  }

  test("href resolution normalizes dot segments and rejects root escape") {
    assert(Epub.resolve("OEBPS/package.opf", "ch/a.xhtml") == "OEBPS/ch/a.xhtml")
    assert(Epub.resolve("OEBPS/package.opf", "../top.xhtml") == "top.xhtml")
    assert(Epub.resolve("package.opf", "a.xhtml") == "a.xhtml")
    assert(Epub.resolve("OEBPS/pkg.opf", "./b.xhtml") == "OEBPS/b.xhtml")
    intercept[ParseFailure](Epub.resolve("pkg.opf", "../../evil"))
  }

  test("epub nested in a zip carries its book text and manifest-image child") {
    val png = graft.multimodal.Media.encodePng(3, 3, 0x445566)
    val epub = Epub.build("Nested", Seq(
      ("c.xhtml", "<html><body><p>nested chapter</p></body></html>")),
      images = Seq(("pic.png", png)))
    val zip = Archive.zipBytes(Seq(("book.epub", epub)))
    val out = Extract.explode(span(zip))
    val book = out.find(o => o.level == 1 &&
      o.spans.exists(_.text == "Nested\nnested chapter"))
    assert(book.isDefined)
    val kids = out.filter(o => o.level == 2 && o.parent_id == book.get.doc_id)
    assert(kids.size == 1 && kids.head.no_content_reason == Reason.Empty)
  }

  test("a spine entry whose file is missing yields a deterministic empty line") {
    val epub = Epub.build("T2", Seq(
      ("here.xhtml", "<html><body><p>present</p></body></html>")))
    // drop the chapter file but keep the manifest/spine reference
    val entries = Archive.unzip(epub, 1 << 20).filterNot(_._1 == "OEBPS/here.xhtml")
    assert(Epub.bookText(entries) == "T2\n")
  }
}
