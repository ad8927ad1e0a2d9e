package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.core.ParseFailure

/** WARC (ISO 28500) web-archive parsing — the container format web-scale
  * text corpora actually arrive in (Common Crawl ships WARC/WET): each
  * record is a `WARC/1.0` version line, name:value headers, an empty line,
  * a `Content-Length`-delimited payload, and a blank-line separator. A
  * `response` record's payload is a full HTTP message whose own headers
  * are split off at the first blank line; a `resource` record carries raw
  * content. Each content-bearing record becomes an embedded child of the
  * archive document, its target URI as the resource name and its body
  * sniffed like any ingested file — so an HTML response flows through the
  * declared-charset decode and boilerplate stripper exactly as a
  * standalone page would.
  *
  * Pure byte-offset parsing over the latin1 span payload; malformed input
  * (missing Content-Length, truncated payloads, oversize records) throws
  * [[ParseFailure]] — classified by the job layer, never a task failure.
  */
object Warc {

  /** The FULL version-line shape "WARC/1.x\r\n" — the 5 printable bytes
    * "WARC/" alone would misclassify ordinary text that merely mentions
    * the format (the same false-positive class the bzip2 sniff guards
    * against with its block signature).
    */
  def isWarc(bytes: Array[Byte]): Boolean =
    bytes.length >= 10 && bytes(0) == 'W' && bytes(1) == 'A' && bytes(2) == 'R' &&
      bytes(3) == 'C' && bytes(4) == '/' && bytes(5) == '1' && bytes(6) == '.' &&
      bytes(7) >= '0' && bytes(7) <= '9' && bytes(8) == '\r' && bytes(9) == '\n'

  /** One parsed record: `body` for response records is the HTTP payload
    * AFTER its message headers; for resource records the raw payload.
    * None = refused by the size guard.
    */
  final case class Record(warcType: String, targetUri: String,
                          body: Option[Array[Byte]])

  def records(latin1: String, maxBodyBytes: Int,
              maxRecords: Int = 10000): Vector[Record] = {
    val out = Vector.newBuilder[Record]
    var pos = 0
    var n = 0
    while (pos < latin1.length) {
      // skip inter-record blank lines
      while (pos < latin1.length &&
        (latin1.charAt(pos) == '\r' || latin1.charAt(pos) == '\n')) pos += 1
      if (pos >= latin1.length) return out.result()
      // LOUD cap: a silently dropped tail would diverge from the oracle
      // with no skip count ("refusals are counted, never silent")
      if (n >= maxRecords)
        throw new ParseFailure(s"warc: more than $maxRecords content records")
      if (!latin1.startsWith("WARC/", pos))
        throw new ParseFailure(s"warc: record at $pos missing version line")
      val headerEnd = latin1.indexOf("\r\n\r\n", pos)
      if (headerEnd < 0) throw new ParseFailure("warc: unterminated record headers")
      val headers = latin1.substring(pos, headerEnd).split("\r\n").drop(1)
        .flatMap { line =>
          val c = line.indexOf(':')
          if (c < 0) None else Some((line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT),
            line.substring(c + 1).trim))
        }.toMap
      val len = headers.getOrElse("content-length",
        throw new ParseFailure("warc: record missing Content-Length"))
      val cl =
        try len.toLong
        catch { case _: NumberFormatException => throw new ParseFailure(s"warc: bad Content-Length '$len'") }
      val payloadStart = headerEnd + 4
      if (cl < 0 || payloadStart + cl > latin1.length)
        throw new ParseFailure("warc: payload past end of input")
      val warcType = headers.getOrElse("warc-type", "")
      val uri = headers.getOrElse("warc-target-uri", "")
      val payload = latin1.substring(payloadStart, payloadStart + cl.toInt)
      val body: Option[String] = warcType match {
        case "response" =>
          // the payload is an HTTP message: its own headers end at the
          // first blank line; a headerless payload degrades to the whole
          val split = payload.indexOf("\r\n\r\n")
          Some(if (split < 0) payload else payload.substring(split + 4))
        case "resource" => Some(payload)
        // WET files (Common Crawl's pre-extracted text sidecars) mark
        // their plain-text records as conversions of the original response
        case "conversion" => Some(payload)
        case _ => None // warcinfo/request/metadata carry no document content
      }
      body.foreach { b =>
        out += Record(warcType, uri,
          if (b.length > maxBodyBytes) None // declared-size guard
          else Some(b.getBytes(ISO_8859_1)))
        n += 1
      }
      pos = payloadStart + cl.toInt
    }
    out.result()
  }

  /** Deterministic WARC bytes: a warcinfo record followed by the given
    * (type, uri, contentType, body) records, response bodies framed in a
    * minimal HTTP/1.1 message. Pinned record ids, no dates.
    */
  def build(entries: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def rec(headers: Seq[(String, String)], payload: Array[Byte]): Unit = {
      val h = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => h.append(k).append(": ").append(v).append("\r\n") }
      h.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
      out.write(h.toString.getBytes(ISO_8859_1))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(ISO_8859_1))
    }
    rec(Seq(("WARC-Type", "warcinfo"),
      ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>")),
      "software: graft\r\n".getBytes(ISO_8859_1))
    entries.zipWithIndex.foreach { case ((warcType, uri, contentType, body), i) =>
      val payload =
        if (warcType == "response")
          (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n\r\n").getBytes(ISO_8859_1) ++ body
        else body
      rec(Seq(("WARC-Type", warcType), ("WARC-Target-URI", uri),
        ("WARC-Record-ID", f"<urn:uuid:00000000-0000-0000-0000-${i + 1}%012d>"),
        ("Content-Type",
          if (warcType == "response") "application/http;msgtype=response" else contentType)),
        payload)
    }
    out.toByteArray
  }
}
