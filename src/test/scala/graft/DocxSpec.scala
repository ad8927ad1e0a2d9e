package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.office.Docx
import graft.core.route.Extract
import graft.sources.Archive

/** OOXML (docx) goldens: WordprocessingML body extraction, entity handling,
  * lookalike tags, package routing (body on the doc, media parts as
  * children), and embedded docx-in-zip.
  */
class DocxSpec extends AnyFunSuite {

  test("bodyText extracts w:t runs, one line per paragraph, entities unescaped") {
    val xml = """<w:document><w:body>""" +
      """<w:p><w:r><w:t>first para</w:t></w:r><w:r><w:t xml:space="preserve"> cont</w:t></w:r></w:p>""" +
      """<w:p><w:r><w:t>a &amp; b &lt;tag&gt;</w:t></w:r></w:p>""" +
      """</w:body></w:document>"""
    assert(Docx.bodyText(xml) == "first para cont\na & b <tag>")
  }

  test("bodyText skips lookalike tags (w:tbl/w:tc) and self-closing w:t") {
    val xml = """<w:body><w:tbl><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p></w:tc></w:tbl>""" +
      """<w:p><w:r><w:t/></w:r><w:r><w:t>after empty</w:t></w:r></w:p></w:body>"""
    assert(Docx.bodyText(xml) == "cell\nafter empty")
    // junk never throws
    Docx.bodyText("<w:t unclosed")
    Docx.bodyText("")
    assert(Docx.bodyText("<w:tblGrid/>") == "")
  }

  test("buildMinimal round-trips paragraphs (incl. XML-special chars)") {
    val paras = Seq("plain words", "with & < > \" specials", "third")
    val bytes = Docx.buildMinimal(paras)
    val txt = Docx.zipText(new String(bytes, ISO_8859_1), 1 << 20)
    assert(txt == paras.mkString("\n"))
  }

  test("docx package: body text on the root, media part as a child") {
    val bytes = Docx.buildMinimal(Seq("hello body"),
      Seq(("word/media/pic.bin", "picture bytes".getBytes(UTF_8))))
    val d = DocIn(40, Array(SpanIn("zip", new String(bytes, ISO_8859_1), "", 0)))
    val out = Extract.explode(d)
    val rid = Ids.rootId(40)
    assert(out.head.spans.head.text == "hello body")
    assert(out.head.no_content_reason == "")
    assert(out.length == 2)
    assert(out(1).doc_id == Ids.embedId("picture bytes", rid, 0, resourceName = "word/media/pic.bin"))
    // package internals ([Content_Types], document.xml) do NOT spawn
    assert(out(1).spans.head.text == "picture bytes")
  }

  test("docx EMBEDDED in a zip becomes a document child with body text") {
    val inner = Docx.buildMinimal(Seq("inner doc text"))
    val zip = Archive.zipBytes(Seq(("report.docx", inner), ("readme.txt", "hi".getBytes(UTF_8))))
    val d = DocIn(41, Array(SpanIn("zip", new String(zip, ISO_8859_1), "", 0)))
    val out = Extract.explode(d)
    assert(out.length == 3) // root + docx child + readme child
    val docxChild = out(1)
    assert(docxChild.level == 1)
    assert(docxChild.spans.map(_.text).toSeq == Seq("inner doc text"))
    assert(out(2).spans.head.text == "hi")
  }
}
