package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.mail.Mhtml
import graft.core.route.Extract

/** MHTML (RFC 2557) page-save goldens: sniffing against plain mail,
  * root-part selection (start CID, type param, first-part fallback),
  * resource naming from Content-Location, transfer decodings via the
  * shared Eml machinery, and the explode wiring (root HTML through the
  * boilerplate extractor, resources as sniffed children).
  */
class MhtmlSpec extends AnyFunSuite {

  private def built: Array[Byte] = Mhtml.build(
    "https://x.example/pages/p.html",
    "<html><head><title>t</title></head><body><p>page body words</p></body></html>",
    Seq(
      "https://x.example/a/style.css" -> "css text".getBytes(UTF_8),
      "https://x.example/img/logo.png?v=9" -> Array[Byte](1, 2, 3)))

  test("isMhtml matches the header block only, never body prose") {
    assert(Mhtml.isMhtml(new String(built.take(2048), ISO_8859_1)))
    // a plain mail whose BODY mentions the media type must stay mail
    val mail = "From: a@x\r\nContent-Type: text/plain\r\n\r\n" +
      "this mentions multipart/related in prose"
    assert(!Mhtml.isMhtml(mail))
    // folded Content-Type value still matches
    val folded = "MIME-Version: 1.0\r\nContent-Type: multipart/related;\r\n" +
      "\ttype=\"text/html\"\r\n\r\nbody"
    assert(Mhtml.isMhtml(folded))
  }

  test("sniffKind routes .mht names and multipart/related heads to mhtml") {
    assert(graft.sources.Ingest.sniffKind(built, "page.mht") == "mhtml")
    assert(graft.sources.Ingest.sniffKind(built, "page.mhtml") == "mhtml")
    // extensionless: the mail-shaped head + multipart/related reroutes
    assert(graft.sources.Ingest.sniffKind(built, "saved_page") == "mhtml")
    // a plain mail head (strong header, no multipart/related) stays eml
    val mail = ("Received: from relay.example\r\nFrom: a@x\r\n" +
      "Content-Type: text/plain\r\n\r\nbody").getBytes(UTF_8)
    assert(graft.sources.Ingest.sniffKind(mail, "saved_mail") == "eml")
  }

  test("parse: root by type param, resources named by URL last segment") {
    val d = Mhtml.parse(new String(built, ISO_8859_1))
    assert(d.html.contains("page body words"))
    assert(d.parts.map(_._1) == Vector("style.css", "logo.png"))
    assert(new String(d.parts(0)._2, UTF_8) == "css text")
    assert(d.parts(1)._2.toSeq == Seq[Byte](1, 2, 3))
  }

  test("parse: start CID overrides part order; CID/positional name fallbacks") {
    val raw =
      "Content-Type: multipart/related; boundary=\"B\"; start=\"<root@cid>\"\r\n\r\n" +
        "--B\r\nContent-Type: image/gif\r\nContent-ID: <res@cid>\r\n\r\nGIFBYTES\r\n" +
        "--B\r\nContent-Type: text/html\r\nContent-ID: <root@cid>\r\n\r\n<p>hi</p>\r\n" +
        "--B\r\nContent-Type: text/css\r\n\r\nbody{}\r\n" +
        "--B--\r\n"
    val d = Mhtml.parse(raw)
    assert(d.html.trim == "<p>hi</p>")
    // no Content-Location: first falls back to CID, second to position
    assert(d.parts.map(_._1) == Vector("res@cid", "part_2"))
  }

  test("parse: degenerate single-part save decodes the top-level body") {
    val raw = "Content-Type: text/html\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\n" +
      java.util.Base64.getEncoder.encodeToString("<p>solo</p>".getBytes(UTF_8))
    val d = Mhtml.parse(raw)
    assert(d.html == "<p>solo</p>" && d.parts.isEmpty)
  }

  test("explode: boilerplate-stripped root text, resource children with stable ids") {
    val doc = DocIn(7L, Array(SpanIn("mhtml", new String(built, ISO_8859_1), "", 0)))
    val out = Extract.explode(doc)
    assert(out.length == 3)
    val root = out.find(_.level == 0).get
    assert(root.spans.map(_.text).mkString("") == "page body words")
    val kids = out.filter(_.level == 1).sortBy(_.doc_id)
    assert(kids.forall(_.parent_id == root.doc_id))
    val css = out.filter(_.level == 1)
      .find(_.spans.exists(_.text == "css text")).get
    assert(css.doc_id == Ids.embedId("css text", root.doc_id, 0,
      resourceName = "style.css"))
    // the binary resource parses to no text but still owns a stable node
    assert(out.exists(o => o.level == 1 && o.spans.isEmpty))
  }

  test("explode: nested mht inside a zip recurses as a document child") {
    val zip = graft.sources.Archive.zipBytes(Seq(("save.mht", built)))
    val doc = DocIn(9L, Array(SpanIn("zip", new String(zip, ISO_8859_1), "", 0)))
    val out = Extract.explode(doc)
    val page = out.find(o => o.level == 1 &&
      o.spans.exists(_.text == "page body words")).get
    val kids = out.filter(_.parent_id == page.doc_id)
    assert(kids.exists(_.spans.exists(_.text == "css text")))
  }
}
