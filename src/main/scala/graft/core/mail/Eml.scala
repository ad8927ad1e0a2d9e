package graft.core.mail

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** RFC-822 / MIME (RFC 2045-2047) message parsing, from scratch on the
  * published formats — the reference's bread-and-butter corpus
  * (`extract-lib` fixtures `embedded_file_bug.eml`, `image_attachment.eml`:
  * mail-with-attachments explosion via Tika's RFC822Parser).
  *
  * Covered: header unfolding (continuation lines), repeated headers (the
  * multimap that finally feeds Meta.normalizeMap real data), multipart
  * boundaries with preamble/epilogue, attachment detection via
  * Content-Disposition, and the two transfer encodings real mail uses
  * (base64, quoted-printable). Parsing is TOTAL: malformed input degrades
  * to a plain-text body, never an exception (FallbackParser semantics).
  *
  * Attachment payloads are returned as raw BYTES (base64 decodes losslessly;
  * the part text maps through ISO-8859-1, the byte-transparent codec), so a
  * zipped attachment re-enters the container explosion intact.
  */
object Eml {

  final case class Message(
      headers: Vector[(String, String)], // occurrence order, repeated keys kept
      body: String,
      attachments: Vector[(String, Array[Byte])] // (filename, raw bytes)
  )

  /** Apple Mail `.emlx` framing: a decimal byte-count line, that many
    * bytes of RFC-822 message, then an XML plist of message flags (which
    * carries no content and is dropped). The length line is authoritative
    * — the plist trailer must never leak into the parsed body. A head
    * that doesn't match the framing parses as a bare message (total).
    */
  def parseEmlx(raw: String): Message = {
    val nl = raw.indexOf('\n')
    val len = if (nl <= 0) None else raw.substring(0, nl).trim.toIntOption
    len match {
      case Some(n) if n >= 0 && nl + 1 + n <= raw.length =>
        parse(raw.substring(nl + 1, nl + 1 + n))
      case _ => parse(raw)
    }
  }

  /** The emlx head shape: a short decimal line followed by a header-ish
    * line — enough to separate it from plain digits-led text.
    */
  def isEmlx(head: String): Boolean = {
    val nl = head.indexOf('\n')
    nl > 0 && nl <= 12 && head.substring(0, nl).trim.forall(_.isDigit) &&
      head.substring(0, nl).trim.nonEmpty && {
        val rest = head.substring(nl + 1)
        val line = rest.takeWhile(c => c != '\r' && c != '\n')
        line.matches("(?i)[a-z][a-z0-9-]*:.*")
      }
  }

  /** Headers as the (key -> values) multimap Meta.normalizeMap consumes.
    * RFC 2047 encoded-words decode HERE — the human-facing metadata
    * surface — never on the raw values param() parses: RFC 2046 bchars
    * legally include '=' and '?', so rewriting a raw Content-Type could
    * corrupt its boundary parameter and silently drop every part.
    */
  def headerMultimap(m: Message): Seq[(String, Seq[String])] =
    m.headers.map { case (k, v) => (k, Seq(decodeWords(v))) }

  def parse(raw: String): Message = {
    val (headerBlock, body) = splitHeadersBody(raw)
    val headers = unfoldHeaders(headerBlock)
    val ct = firstHeader(headers, "Content-Type").getOrElse("")
    // encrypted mail CLASSIFIES (FAILURE_NOT_DECRYPTED taxonomy, like
    // encrypted PDFs/Office) — base64-decoding a CMS envelope would emit
    // binary garbage as "body text". Discriminated by RFC 8551 smime-type:
    // enveloped/authEnveloped (or unspecified — stock senders omit it) is
    // key-gated ciphertext → DecryptFailure; opaque signed-data and
    // compressed-data are NOT key-gated (the content rides inside plain
    // CMS structure) but need an ASN.1 walk this parser doesn't have →
    // ParseFailure, the honest terminal refusal, never the retryable
    // not-decrypted status; certs-only (RFC 8551 §3.6, routine cert
    // transport) has NO content by design → empty message, not an error.
    // PGP/MIME is multipart/encrypted (RFC 3156). multipart/signed
    // (CLEAR signing) stays readable and walks normally.
    val ctl = ct.toLowerCase(java.util.Locale.ROOT).trim
    if (ctl.startsWith("application/pkcs7-mime") ||
        ctl.startsWith("application/x-pkcs7-mime")) {
      param(ct, "smime-type").toLowerCase(java.util.Locale.ROOT) match {
        case "certs-only" => return Message(headers, "", Vector.empty)
        case "signed-data" | "compressed-data" =>
          throw new graft.core.ParseFailure(
            "S/MIME opaque CMS content (signed-data/compressed-data): ASN.1 extraction not supported")
        case _ => throw new graft.core.DecryptFailure(
          "S/MIME enveloped mail (application/pkcs7-mime): CMS requires the recipient key")
      }
    }
    if (ctl.startsWith("multipart/encrypted"))
      throw new graft.core.DecryptFailure(
        "PGP/MIME encrypted mail (multipart/encrypted, RFC 3156)")
    val boundary = param(ct, "boundary")
    if (boundary.isEmpty) {
      val cte = firstHeader(headers, "Content-Transfer-Encoding").getOrElse("")
      val text = new String(decodeBody(body, cte), UTF_8)
      // pre-MIME mail reality: uuencoded blocks inline in a plain body
      // become attachments, the surrounding prose stays the body
      val (clean, uuAtts) = extractUuencode(text)
      Message(headers, clean, uuAtts)
    } else {
      val (mainBody, atts) = walkMultipart(body, boundary, MaxNesting)
      Message(headers, mainBody.getOrElse(""), atts)
    }
  }

  /** multipart/mixed(multipart/alternative(...)) — the most common real
    * mail shape — nests a boundary inside a part; the inner structure must
    * be walked (depth-capped), not taken verbatim as the body, or raw MIME
    * boundaries and sub-part headers leak into the extracted text.
    */
  private val MaxNesting = 8

  private def walkMultipart(body: String, boundary: String, depth: Int)
      : (Option[String], Vector[(String, Array[Byte])]) = {
    var mainBody: Option[String] = None
    val atts = Vector.newBuilder[(String, Array[Byte])]
    splitParts(body, boundary).foreach { part =>
      val (ph, pb) = splitHeadersBody(part)
      val phs = unfoldHeaders(ph)
      val disp = firstHeader(phs, "Content-Disposition").getOrElse("")
      val pct = firstHeader(phs, "Content-Type").getOrElse("")
      val pctl = pct.toLowerCase(java.util.Locale.ROOT).trim
      val inner = param(pct, "boundary")
      if (pctl.startsWith("application/pkcs7-mime") ||
          pctl.startsWith("application/x-pkcs7-mime")) {
        // an encrypted/opaque CMS PART inside multipart/mixed must never
        // fall through to the body branch — decoding the envelope yields
        // binary garbage as text. It becomes a named attachment whose
        // bytes the spawn path sniffs (CMS OID) and classifies; readable
        // sibling parts keep extracting.
        val cte = firstHeader(phs, "Content-Transfer-Encoding").getOrElse("")
        val fn = filenameOf(disp, pct)
        atts += ((if (fn.nonEmpty) fn else "smime.p7m", decodeBody(pb, cte)))
      } else if (pctl.startsWith("multipart/encrypted")) {
        // a nested PGP/MIME envelope: the whole encrypted multipart
        // becomes one attachment (byte-transparent), classified downstream
        atts += (("encrypted.asc", pb.getBytes(ISO_8859_1)))
      } else if (disp.toLowerCase(java.util.Locale.ROOT).contains("attachment")) {
        val cte = firstHeader(phs, "Content-Transfer-Encoding").getOrElse("")
        val fn = filenameOf(disp, pct)
        // an unnamed forwarded message under an attachment disposition
        // must still sniff as mail downstream (the .eml name is the hint)
        val name =
          if (fn.isEmpty && pct.toLowerCase(java.util.Locale.ROOT).startsWith("message/rfc822"))
            "forwarded.eml"
          else fn
        atts += ((name, decodeBody(pb, cte)))
      } else if (pct.toLowerCase(java.util.Locale.ROOT).startsWith("message/rfc822")) {
        // a FORWARDED message (typically inline / no disposition): surface
        // it as an .eml attachment — the spawn path sniffs the RFC-822
        // bytes and recurses, so its body and attachments become children
        // instead of leaking raw headers into this message's text
        val cte = firstHeader(phs, "Content-Transfer-Encoding").getOrElse("")
        val name = {
          val n = param(pct, "name")
          if (n.nonEmpty) n else "forwarded.eml"
        }
        atts += ((name, decodeBody(pb, cte)))
      } else if (inner.nonEmpty && depth > 0) {
        val (innerBody, innerAtts) = walkMultipart(pb, inner, depth - 1)
        if (mainBody.isEmpty) mainBody = innerBody
        atts ++= innerAtts
      } else {
        val cte = firstHeader(phs, "Content-Transfer-Encoding").getOrElse("")
        if (mainBody.isEmpty)
          mainBody = Some(new String(decodeBody(pb, cte), UTF_8))
      }
    }
    (mainBody, atts.result())
  }

  /** Split at the first blank line — any '\n' directly followed by '\n'
    * or "\r\n", so MIXED line endings (LF headers, CRLF blank line — common
    * in real corpora) still find the body. A trailing '\r' left on the
    * header block is absorbed by unfoldHeaders' value trim. An input with
    * no blank line is all headers and an empty body (RFC 5322 allows
    * body-less messages).
    */
  private[mail] def splitHeadersBody(s: String): (String, String) = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\n') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\n')
          return (s.substring(0, i), s.substring(i + 2))
        if (i + 2 < s.length && s.charAt(i + 1) == '\r' && s.charAt(i + 2) == '\n')
          return (s.substring(0, i), s.substring(i + 3))
      }
      i += 1
    }
    (s, "")
  }

  /** Unfold continuation lines (leading WS joins to the previous header)
    * and split on the first ':'. Lines without a colon are skipped
    * (malformed-input tolerance).
    */
  def unfoldHeaders(block: String): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var cur: (String, StringBuilder) = null
    block.split("\r?\n", -1).foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (cur != null) cur._2.append(' ').append(line.trim)
      } else {
        if (cur != null) { out += ((cur._1, cur._2.toString)); cur = null }
        val c = line.indexOf(':')
        if (c > 0) cur = (line.substring(0, c).trim, new StringBuilder(line.substring(c + 1).trim))
      }
    }
    if (cur != null) out += ((cur._1, cur._2.toString))
    out.result()
  }

  /** RFC 2047 encoded-words (`=?charset?B|Q?data?=`): every real mail
    * carries them in Subject/From for non-ASCII text; Tika's RFC822Parser
    * decodes them and so must this route. B = base64; Q =
    * quoted-printable with '_' as SPACE. Whitespace BETWEEN two adjacent
    * encoded words is transparent (§6.2). An undecodable token (unknown
    * charset, bad base64) stays verbatim — tolerance over data loss.
    */
  private val EncodedWordRe =
    "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r

  def decodeWords(v: String): String = {
    if (!v.contains("=?")) return v
    // walk matches positionally: whitespace BETWEEN two encoded words is
    // transparent (RFC 2047 §6.2) ONLY when both sides actually decode —
    // a blind pre-collapse would eat spaces in plain text that merely
    // contains '?=' and '=?' sequences
    val ms = EncodedWordRe.findAllMatchIn(v).toVector
    if (ms.isEmpty) return v
    val decoded = ms.map(decodeOne)
    val sb = new StringBuilder
    var pos = 0
    ms.indices.foreach { i =>
      val m = ms(i)
      val between = v.substring(pos, m.start)
      val dropSeparator = i > 0 && between.nonEmpty && between.forall(_.isWhitespace) &&
        decoded(i - 1).isDefined && decoded(i).isDefined
      if (!dropSeparator) sb.append(between)
      sb.append(decoded(i).getOrElse(m.matched))
      pos = m.end
    }
    sb.append(v.substring(pos))
    sb.toString
  }

  /** One encoded word -> its text, or None when undecodable. */
  private def decodeOne(m: scala.util.matching.Regex.Match): Option[String] = {
        val cs =
          try Some(java.nio.charset.Charset.forName(m.group(1).trim))
          catch { case _: Exception => None }
        cs.flatMap { charset =>
          try {
            val raw = m.group(2).toLowerCase match {
              case "b" => java.util.Base64.getMimeDecoder.decode(m.group(3))
              case _ => // Q: '_' is SPACE, =HH are bytes
                val src = m.group(3)
                val bos = new java.io.ByteArrayOutputStream()
                var i = 0
                while (i < src.length) {
                  val ch = src.charAt(i)
                  if (ch == '_') { bos.write(' '); i += 1 }
                  else if (ch == '=' && i + 3 <= src.length) {
                    bos.write(Integer.parseInt(src.substring(i + 1, i + 3), 16)); i += 3
                  }
                  else { bos.write(ch.toInt); i += 1 }
                }
                bos.toByteArray
            }
            Some(new String(raw, charset))
          } catch { case _: Exception => None }
        }
  }

  private[mail] def firstHeader(hs: Vector[(String, String)], name: String): Option[String] =
    hs.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  /** `name=value` / `name="value"` parameter from a structured header.
    * The key must start at a parameter BOUNDARY (start of header, or after
    * ';'/','/whitespace) — a bare substring match would read
    * `x-boundary=no; boundary=yes` as "no" and silently drop every part.
    */
  def param(header: String, name: String): String = {
    val lower = header.toLowerCase(java.util.Locale.ROOT)
    val key = name.toLowerCase(java.util.Locale.ROOT) + "="
    var i = lower.indexOf(key)
    while (i > 0 && !"; ,\t".contains(lower.charAt(i - 1)))
      i = lower.indexOf(key, i + 1)
    if (i < 0) return ""
    var j = i + key.length
    if (j < header.length && header.charAt(j) == '"') {
      val e = header.indexOf('"', j + 1)
      if (e < 0) header.substring(j + 1) else header.substring(j + 1, e)
    } else {
      var e = j
      while (e < header.length && !";, \t".contains(header.charAt(e))) e += 1
      header.substring(j, e)
    }
  }

  /** Attachment filename with the real-mail encodings applied: an
    * RFC 2231 extended parameter (`filename*=charset''percent-bytes`)
    * outranks the plain one; plain values decode RFC 2047 encoded-words
    * (illegal there per the RFC, emitted by real producers anyway, and
    * decoded by Tika); Content-Type `name` is the legacy fallback.
    */
  private def filenameOf(disp: String, pct: String): String = {
    val ext = paramExtended(disp, "filename")
    if (ext.nonEmpty) ext
    else {
      val plain = param(disp, "filename")
      if (plain.nonEmpty) decodeWords(plain)
      else {
        val extName = paramExtended(pct, "name")
        if (extName.nonEmpty) extName else decodeWords(param(pct, "name"))
      }
    }
  }

  /** RFC 2231 `name*=` single-segment extended parameter, percent-decoded
    * in its declared charset; undecodable values return verbatim
    * (tolerance over loss). Multi-segment continuations (`name*0*=`) are
    * out of subset and yield "".
    */
  private def paramExtended(header: String, name: String): String = {
    val raw = param(header, name + "*")
    if (raw.isEmpty) return ""
    val parts = raw.split("'", 3)
    if (parts.length < 3) return raw
    try {
      val cs = java.nio.charset.Charset.forName(parts(0))
      val bos = new java.io.ByteArrayOutputStream()
      val src = parts(2)
      var i = 0
      while (i < src.length) {
        val ch = src.charAt(i)
        if (ch == '%' && i + 3 <= src.length) {
          bos.write(Integer.parseInt(src.substring(i + 1, i + 3), 16)); i += 3
        } else { bos.write(ch.toInt); i += 1 }
      }
      new String(bos.toByteArray, cs)
    } catch { case _: Exception => raw }
  }

  /** Part bodies between --boundary delimiter lines, ending at
    * --boundary-- (preamble before the first delimiter and the epilogue
    * after the close are discarded, RFC 2046 5.1.1).
    */
  private[mail] def splitParts(body: String, boundary: String): Vector[String] = {
    val delim = "--" + boundary
    val out = Vector.newBuilder[String]
    val lines = body.split("\r?\n", -1)
    var cur: StringBuilder = null
    var done = false
    lines.foreach { line =>
      if (!done) {
        if (line == delim + "--") {
          if (cur != null) { out += trimOneTrailingNl(cur.toString); cur = null }
          done = true
        } else if (line == delim) {
          if (cur != null) out += trimOneTrailingNl(cur.toString)
          cur = new StringBuilder
        } else if (cur != null) cur.append(line).append('\n')
      }
    }
    // unterminated multipart (missing close delimiter): keep the open part
    if (!done && cur != null) out += trimOneTrailingNl(cur.toString)
    out.result()
  }

  private def trimOneTrailingNl(s: String): String =
    if (s.endsWith("\n")) s.substring(0, s.length - 1) else s

  /** Transfer decoding: base64 (MIME decoder, line-break tolerant),
    * quoted-printable (=XX + soft breaks), else the identity bytes
    * (ISO-8859-1: byte-transparent). Malformed encodings degrade to the
    * raw bytes — never throw.
    */
  /** Inline uuencode blocks (`begin <mode> <name>` … `end`, the pre-MIME
    * attachment convention old mail archives are full of; uudecode(1) is
    * the published spec): each well-formed block becomes an attachment
    * and is removed from the body text. TOLERANT by design — a malformed
    * block (no end line, invalid length char, chars outside the 0x20-0x60
    * alphabet) is left verbatim in the body: untrusted prose that merely
    * mentions `begin 644` must never be eaten or fail the message.
    */
  private[mail] def extractUuencode(text: String)
  : (String, Vector[(String, Array[Byte])]) = {
    if (!text.contains("begin ")) return (text, Vector.empty)
    val BeginRe = "^begin [0-7]{3,4} (.+)$".r
    val lines = text.split("\n", -1)
    val keep = Vector.newBuilder[String]
    val atts = Vector.newBuilder[(String, Array[Byte])]
    var i = 0
    while (i < lines.length) {
      val line = lines(i).stripSuffix("\r")
      BeginRe.findFirstMatchIn(line) match {
        case Some(m) =>
          val name = m.group(1)
          val data = new java.io.ByteArrayOutputStream()
          var j = i + 1
          var ok = true
          var ended = false
          while (ok && !ended && j < lines.length) {
            val l = lines(j).stripSuffix("\r")
            if (l == "end") ended = true
            else if (l.isEmpty) ok = false
            else {
              val n = (l.charAt(0) - 0x20) & 0x3f
              if (n == 0) () // length-0 terminator line before "end"
              else if (l.exists(c => c < 0x20 || c > 0x60)) ok = false
              else if (l.length < 1 + ((n + 2) / 3) * 4) ok = false
              else {
                var p = 1
                var remaining = n
                while (remaining > 0) {
                  val v = (0 until 4).map(k => (l.charAt(p + k) - 0x20) & 0x3f)
                  val bs = Array((v(0) << 2 | v(1) >> 4).toByte,
                    ((v(1) << 4 | v(2) >> 2) & 0xff).toByte,
                    ((v(2) << 6 | v(3)) & 0xff).toByte)
                  data.write(bs, 0, math.min(3, remaining))
                  remaining -= 3
                  p += 4
                }
              }
              if (ok && !ended) j += 1
            }
          }
          if (ended && ok) {
            atts += ((name, data.toByteArray))
            i = j + 1 // skip past "end"
          } else {
            keep += lines(i) // malformed: keep the begin line verbatim
            i += 1
          }
        case None =>
          keep += lines(i)
          i += 1
      }
    }
    (keep.result().mkString("\n"), atts.result())
  }

  def decodeBody(body: String, cte: String): Array[Byte] =
    cte.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(body.trim)
        catch { case _: IllegalArgumentException => body.getBytes(ISO_8859_1) }
      case "quoted-printable" => decodeQp(body)
      case _ => body.getBytes(ISO_8859_1)
    }

  def decodeQp(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2 // soft break LF
        else if (i + 2 < s.length && s.charAt(i + 1) == '\r' && s.charAt(i + 2) == '\n') i += 3
        else if (i + 2 < s.length) {
          val hex = Character.digit(s.charAt(i + 1), 16) * 16 +
            Character.digit(s.charAt(i + 2), 16)
          if (hex >= 0 && Character.digit(s.charAt(i + 1), 16) >= 0 &&
            Character.digit(s.charAt(i + 2), 16) >= 0) {
            out.write(hex); i += 3
          } else { out.write(c.toInt); i += 1 } // malformed escape: literal
        } else { out.write(c.toInt); i += 1 } // trailing '=': literal
      } else { out.write(c.toInt); i += 1 }
    }
    out.toByteArray
  }
}

/** mbox (RFC 4155) — the classic Unix mailbox format mailing-list
  * archives ship as: messages concatenated, each introduced by a
  * postmark line `From <sender> <asctime-date>`. Subset (documented
  * honestly): message SPLITTING plus per-message RFC-822 parse through
  * [[Eml]]; the mboxrd `>From ` body-quoting convention is unescaped one
  * level on body-leading lines. Detection requires the asctime weekday
  * after the sender token, so prose that merely starts with "From " never
  * sniffs as a mailbox.
  */
object Mbox {

  private val Postmark =
    "^From \\S+ (Mon|Tue|Wed|Thu|Fri|Sat|Sun) ".r
  private val MboxrdQuoted = "^>+From ".r

  def isMbox(head: String): Boolean =
    Postmark.findPrefixOf(head).isDefined

  /** The raw per-message chunks (postmark line dropped, `>From `
    * unescaped one level), in mailbox order.
    */
  def split(latin1: String): Vector[String] = {
    if (!isMbox(latin1)) throw new graft.core.ParseFailure("not an mbox: no postmark line")
    // the file-final newline produces one trailing empty split element;
    // dropping it keeps the last message byte-identical to its siblings
    val lines0 = latin1.split("\n", -1)
    val lines = if (lines0.nonEmpty && lines0.last.isEmpty) lines0.init else lines0
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var started = false
    def flush(): Unit = {
      // a content-less message (two consecutive postmarks) still emits an
      // EMPTY chunk: dropping it would silently lose the message AND
      // shift every later sibling's ordinal (hence its embed id)
      if (started) out += cur.toString.stripSuffix("\n").stripSuffix("\r")
      cur.setLength(0)
    }
    lines.foreach { line0 =>
      val line = line0.stripSuffix("\r")
      if (Postmark.findPrefixOf(line).isDefined) { flush(); started = true }
      else if (started) {
        // mboxrd: a body line that originally began "From " was written
        // ">From " — remove exactly one '>' of the escape run
        val unescaped =
          if (line.length > 0 && line.charAt(0) == '>' &&
            MboxrdQuoted.findPrefixOf(line).isDefined) line.substring(1)
          else line
        cur.append(unescaped).append('\n')
      }
    }
    flush()
    out.result()
  }
}
