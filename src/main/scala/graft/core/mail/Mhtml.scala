package graft.core.mail

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.Locale

/** MHTML web archives (RFC 2557 "MIME Encapsulation of Aggregate
  * Documents"): the `.mht`/`.mhtml` single-file page save every browser
  * emits — a `multipart/related` MIME envelope whose root part is the
  * page HTML and whose sibling parts are the page's resources, each
  * addressed by `Content-Location`. Tika routes these through its mhtml
  * detection into `HtmlParser` (the reference inherits that via
  * AutoDetectParser, `Extractor.java:937`); here the root part's markup
  * goes through the engine's own HTML extractor and the resource parts
  * spawn as sniffed embedded children.
  *
  * Built on the shared RFC-822 machinery in [[Eml]] (header unfolding,
  * parameter parsing, base64/quoted-printable decode) — MHTML is mail
  * framing around a web page, and the two must never diverge on MIME
  * details.
  */
object Mhtml {

  final case class Doc(
      html: String, // root part markup, transfer-decoded
      parts: Vector[(String, Array[Byte])] // (resource name, raw bytes), root excluded
  )

  /** Header-block sniff: mail-shaped head whose Content-Type declares
    * multipart/related (the browser save shape). Only the HEADER BLOCK
    * (up to the first blank line) is consulted — body prose mentioning
    * the media type must not reroute a plain mail. The name tiebreaker
    * (.mht/.mhtml) is applied by the caller like every other extension
    * hint.
    */
  def isMhtml(head2k: String): Boolean = {
    val l = head2k.toLowerCase(Locale.ROOT)
    val blank = l.indexOf("\n\n") match {
      case -1 => l.indexOf("\r\n\r\n") match { case -1 => l.length; case i => i }
      case i => math.min(i, l.length)
    }
    val headerBlock = l.substring(0, blank)
    val ct = headerBlock.indexOf("content-type:")
    ct >= 0 && {
      // the value may fold across lines; scan a bounded window after the key
      val window = headerBlock.substring(ct,
        math.min(headerBlock.length, ct + 200))
      window.contains("multipart/related")
    }
  }

  def parse(raw: String): Doc = {
    val (headerBlock, body) = Eml.splitHeadersBody(raw)
    val headers = Eml.unfoldHeaders(headerBlock)
    val ct = Eml.firstHeader(headers, "Content-Type").getOrElse("")
    val boundary = Eml.param(ct, "boundary")
    if (boundary.isEmpty) {
      // degenerate single-part save (Content-Type: text/html at top level)
      val cte = Eml.firstHeader(headers, "Content-Transfer-Encoding").getOrElse("")
      Doc(new String(Eml.decodeBody(body, cte), UTF_8), Vector.empty)
    } else {
      val rootType = { // the `type` param names the root part's media type
        val t = Eml.param(ct, "type").toLowerCase(Locale.ROOT)
        if (t.isEmpty) "text/html" else t
      }
      val startCid = Eml.param(ct, "start") // optional Content-ID of the root
      val parsed = Eml.splitParts(body, boundary).map { part =>
        val (ph, pb) = Eml.splitHeadersBody(part)
        val phs = Eml.unfoldHeaders(ph)
        val pct = Eml.firstHeader(phs, "Content-Type").getOrElse("")
        val cte = Eml.firstHeader(phs, "Content-Transfer-Encoding").getOrElse("")
        val cloc = Eml.firstHeader(phs, "Content-Location").getOrElse("")
        val cid = Eml.firstHeader(phs, "Content-ID").getOrElse("")
        (pct, cloc, cid, Eml.decodeBody(pb, cte))
      }
      val rootIdx = {
        val byStart =
          if (startCid.isEmpty) -1
          else parsed.indexWhere(p => stripCid(p._3) == stripCid(startCid))
        if (byStart >= 0) byStart
        else {
          val byType = parsed.indexWhere(
            _._1.toLowerCase(Locale.ROOT).startsWith(rootType))
          if (byType >= 0) byType else 0
        }
      }
      val html =
        if (parsed.isEmpty) ""
        else new String(parsed(rootIdx)._4, UTF_8)
      val parts = parsed.zipWithIndex.collect {
        case ((_, cloc, cid, bytes), i) if i != rootIdx =>
          (resourceName(cloc, cid, i), bytes)
      }
      Doc(html, parts)
    }
  }

  private def stripCid(s: String): String =
    s.trim.stripPrefix("<").stripSuffix(">")

  /** Child naming: the Content-Location URL's last path segment (query/
    * fragment stripped) — the name the browser saved the resource under —
    * falling back to the Content-ID, then a positional name. The FULL
    * location would also be correct but makes ids depend on site layout
    * churn; the reference names embeds by resourceName the same way.
    */
  private[mail] def resourceName(cloc: String, cid: String, idx: Int): String = {
    val path = cloc.trim.takeWhile(c => c != '?' && c != '#')
    val seg = path.substring(path.lastIndexOf('/') + 1)
    if (seg.nonEmpty) seg
    else if (stripCid(cid).nonEmpty) stripCid(cid)
    else s"part_$idx"
  }

  /** Deterministic fixture writer: CRLF framing, 7bit HTML root part with
    * a Content-Location, then each resource as base64 (the browser-save
    * shape for binaries).
    */
  def build(pageUrl: String, html: String,
            resources: Seq[(String, Array[Byte])]): Array[Byte] = {
    val b = "----MultipartBoundary--graft"
    val sb = new StringBuilder
    sb ++= "From: <Saved by graft>\r\n"
    sb ++= "MIME-Version: 1.0\r\n"
    sb ++= "Content-Type: multipart/related;\r\n"
    sb ++= s"""\ttype="text/html";\r\n\tboundary="$b"\r\n\r\n"""
    sb ++= s"--$b\r\n"
    sb ++= "Content-Type: text/html\r\n"
    sb ++= "Content-Transfer-Encoding: quoted-printable\r\n"
    sb ++= s"Content-Location: $pageUrl\r\n\r\n"
    sb ++= quotedPrintable(html) + "\r\n"
    resources.foreach { case (url, bytes) =>
      sb ++= s"--$b\r\n"
      sb ++= "Content-Type: application/octet-stream\r\n"
      sb ++= "Content-Transfer-Encoding: base64\r\n"
      sb ++= s"Content-Location: $url\r\n\r\n"
      sb ++= java.util.Base64.getMimeEncoder(76, "\r\n".getBytes(ISO_8859_1))
        .encodeToString(bytes) + "\r\n"
    }
    sb ++= s"--$b--\r\n"
    sb.result().getBytes(ISO_8859_1)
  }

  /** Minimal deterministic quoted-printable: escape '=', non-ASCII, and
    * nothing else; lines kept under 76 chars by hard-wrapping with soft
    * breaks. Enough to exercise the decode path from the writer side.
    */
  private def quotedPrintable(s: String): String = {
    val bytes = s.getBytes(UTF_8)
    val sb = new StringBuilder
    var col = 0
    bytes.foreach { byte =>
      val u = byte & 0xff
      val tok =
        if (u == '=' || u >= 0x80 || u < 0x20 && u != '\n' && u != '\r')
          f"=$u%02X"
        else u.toChar.toString
      if (col + tok.length > 73) { sb ++= "=\r\n"; col = 0 }
      sb ++= tok
      col = if (u == '\n') 0 else col + tok.length
    }
    sb.result()
  }
}
