package graft.core.pdf

import scala.collection.mutable.ArrayBuffer

/** Minimal REAL-PDF text extractor (PDF 1.x is a published ISO format; this
  * parses the text-showing subset the reference exercises through PDFBox:
  * content streams, BT/ET text objects, Td/TD/Tm/T* positioning, Tj/TJ/'/"
  * show operators, literal strings with escapes). Content streams may be
  * raw or `/Filter /FlateDecode` — Flate is DEFLATE, shipped in the JDK
  * (`java.util.zip.Inflater`), and virtually every real-world PDF compresses
  * its content streams, so the real-ingestion route (Ingest.readDir ->
  * pdf_bytes) handles them. No object/xref resolution is attempted beyond
  * locating stream payloads and their owning dictionary.
  *
  * Reading order mirrors [[PdfLayout]]: lines sorted by descending y (PDF's
  * y axis points up), then x; text chunks on one line ordered by x.
  */
object PdfMini {

  def text(bytes: Array[Byte]): String =
    textFromLatin1(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))

  private final case class Chunk(y: Double, x: Double, text: String)

  /** Zip-bomb guard: a Flate stream may not inflate past this (the
    * reference's declared-size guard, `EmbedSpawner.java:393-402`, applied
    * to the decode itself). 64 MB, matching Extract.Config.maxSpanChars.
    */
  val MaxInflatedBytes: Int = 64 << 20

  /** Inflate a DEFLATE payload; None on malformed/truncated data or when
    * the output would exceed [[MaxInflatedBytes]] (never throws — malformed
    * real-world input must degrade, not fail the task).
    */
  def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var bad = false
      while (!bad && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) bad = true // truncated / preset-dict
        if (out.size() > MaxInflatedBytes) bad = true
      }
      if (bad) None else Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Real encryption detection (the reference's `pdf/encrypted.pdf` route:
    * PDFBox raises EncryptedDocumentException from the trailer's /Encrypt
    * entry, `Extractor.java:785-826`): a `/Encrypt` name OUTSIDE stream
    * payloads — covering both classic `trailer` dictionaries and the
    * PDF-1.5+ cross-reference-stream layout (no trailer keyword; /Encrypt
    * lives in the xref stream dict), while an occurrence inside a content
    * stream's data can't false-positive.
    */
  def isEncryptedLatin1(pdf: String): Boolean = {
    var from = 0
    while (from < pdf.length) {
      val hit = pdf.indexOf("/Encrypt", from)
      if (hit < 0) return false
      // inside a stream payload? the nearest preceding 'stream' keyword
      // without an intervening 'endstream' means yes
      val s = pdf.lastIndexOf("stream", hit)
      val inPayload = s >= 0 && !pdf.substring(s, hit).contains("endstream") &&
        // 'endstream'.lastIndexOf also matches 'stream' at its tail:
        // a hit at s-3 == 'endstream' start means we're AFTER a payload
        !(s >= 3 && pdf.regionMatches(s - 3, "endstream", 0, 9))
      if (!inPayload) return true
      from = hit + 1
    }
    false
  }

  def textFromLatin1(pdf: String): String = {
    val chunks = ArrayBuffer.empty[Chunk]
    var from = 0
    while (from >= 0 && from < pdf.length) {
      val s = pdf.indexOf("stream", from)
      if (s < 0) from = -1
      else {
        // stream keyword is followed by CRLF or LF, payload runs to endstream
        var payloadStart = s + "stream".length
        if (payloadStart < pdf.length && pdf.charAt(payloadStart) == '\r') payloadStart += 1
        if (payloadStart < pdf.length && pdf.charAt(payloadStart) == '\n') payloadStart += 1
        val e = pdf.indexOf("endstream", payloadStart)
        if (e < 0) from = -1
        else {
          // the owning stream dict sits between the preceding 'obj' token
          // and the stream keyword: '/Filter /FlateDecode' there means the
          // payload is DEFLATE-compressed (PDF 7.4.4)
          val dictStart = math.max(0, pdf.lastIndexOf("obj", s))
          val isFlate = pdf.substring(dictStart, s).contains("/FlateDecode")
          val raw = pdf.substring(payloadStart, e)
          if (isFlate)
            inflate(raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
              .foreach { b =>
                extractStream(new String(b, java.nio.charset.StandardCharsets.ISO_8859_1), chunks)
              } // malformed Flate data: skip the stream, never throw
          else extractStream(raw, chunks)
          from = e + "endstream".length
        }
      }
    }
    val lines = chunks.groupBy(_.y).toSeq.sortBy(-_._1)
    lines.iterator
      .map { case (_, cs) => cs.sortBy(_.x).iterator.map(_.text).mkString(" ") }
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** The standard PDF document-information keys the reference's
    * MetadataCleaner strips (`cleaner/MetadataCleaner.java:49-66` nulls the
    * PDDocumentInformation fields and the XMP catalog metadata).
    */
  val InfoKeys: Seq[String] =
    Seq("Title", "Author", "Subject", "Keywords", "Creator", "Producer")

  /** MetadataCleaner analog on the BYTES: blanks every info-key literal
    * string value (`/Title (secret)` -> `/Title ()`) while leaving content
    * streams byte-identical — the reference's "clean the file, keep the
    * content" contract. Escape- and nesting-aware; idempotent.
    */
  def cleanInfo(pdf: String): String = {
    var s = pdf
    InfoKeys.foreach { key =>
      var from = 0
      var continue = true
      while (continue) {
        val k = s.indexOf("/" + key, from)
        if (k < 0) continue = false
        else {
          var j = k + key.length + 1
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          if (j < s.length && s.charAt(j) == '(') {
            // find the matching close paren (escapes + nesting)
            var depth = 1
            var e = j + 1
            while (e < s.length && depth > 0) {
              val c = s.charAt(e)
              // a truncated trailing escape ('...\' at end-of-input) must not
              // step past the string — clamp the 2-char skip to what's left
              if (c == '\\') e += math.min(2, s.length - e)
              else {
                if (c == '(') depth += 1
                else if (c == ')') depth -= 1
                e += 1
              }
            }
            if (s.substring(j, e) != "()") s = s.substring(0, j) + "()" + s.substring(e)
            from = j + 2
          } else from = k + key.length + 1
        }
      }
    }
    s
  }

  /** Parse one content stream's text operators. */
  private def extractStream(s: String, out: ArrayBuffer[Chunk]): Unit = {
    var i = 0
    val n = s.length
    var x = 0.0; var y = 0.0          // current text position
    var lineX = 0.0                   // line start (Td/TD translate from here)
    var leading = 12.0
    var inText = false
    var pendingStr: String = null     // last parsed literal/array string
    val nums = ArrayBuffer.empty[Double] // numeric operand stack

    def emit(str: String): Unit =
      if (inText && str != null && str.nonEmpty) out += Chunk(y, x, str)

    def parseString(start: Int): (String, Int) = {
      // literal string with escapes and balanced-paren nesting (PDF 7.3.4.2)
      val sb = new StringBuilder
      var j = start + 1
      var depth = 1
      while (j < n && depth > 0) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < n) {
          val e = s.charAt(j + 1)
          e match {
            case 'n' => sb.append('\n'); j += 2
            case 'r' => sb.append('\r'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'b' => sb.append('\b'); j += 2
            case 'f' => sb.append('\f'); j += 2
            case '(' | ')' | '\\' => sb.append(e); j += 2
            case d if d >= '0' && d <= '7' =>
              var k = j + 1; var v = 0; var cnt = 0
              while (k < n && cnt < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                v = v * 8 + (s.charAt(k) - '0'); k += 1; cnt += 1
              }
              sb.append(v.toChar); j = k
            case '\n' => j += 2 // line continuation
            case _ => sb.append(e); j += 2
          }
        } else {
          if (c == '(') { depth += 1; sb.append(c) }
          else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c) }
          else sb.append(c)
          j += 1
        }
      }
      (sb.toString, j)
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') {
        val (str, j) = parseString(i)
        pendingStr = str; i = j
      } else if (c == '[') {
        // TJ array: concatenate its strings, ignore kerning numbers
        val sb = new StringBuilder
        var j = i + 1
        while (j < n && s.charAt(j) != ']') {
          if (s.charAt(j) == '(') {
            val (str, k) = parseString(j); sb.append(str); j = k
          } else j += 1
        }
        pendingStr = sb.toString
        i = if (j < n) j + 1 else j
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        i += 2 // dict open — skip
      } else if (c == '/' ) {
        // name token: skip to delimiter
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace && "()<>[]{}/%".indexOf(s.charAt(j)) < 0) j += 1
        i = j
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && (s.charAt(j) == '.' || (s.charAt(j) >= '0' && s.charAt(j) <= '9'))) j += 1
        // malformed numerics ('-', '1.2.3') in corrupt PDFs must not throw:
        // treat them like an unknown operator (clear the operand stack)
        s.substring(i, j).toDoubleOption match {
          case Some(d) => nums += d
          case None    => nums.clear()
        }
        i = j
      } else {
        // operator token
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace && "()<>[]{}/%".indexOf(s.charAt(j)) < 0) j += 1
        val op = s.substring(i, j)
        op match {
          case "BT" => inText = true; x = 0; y = 0; lineX = 0
          case "ET" => inText = false
          case "Td" if nums.size >= 2 =>
            lineX += nums(nums.size - 2); y += nums.last; x = lineX
          case "TD" if nums.size >= 2 =>
            leading = -nums.last; lineX += nums(nums.size - 2); y += nums.last; x = lineX
          case "TL" if nums.nonEmpty => leading = nums.last
          case "Tm" if nums.size >= 6 =>
            lineX = nums(nums.size - 2); x = lineX; y = nums.last
          case "T*" => y -= leading; x = lineX
          case "Tj" => emit(pendingStr); pendingStr = null
          case "TJ" => emit(pendingStr); pendingStr = null
          case "'" => y -= leading; x = lineX; emit(pendingStr); pendingStr = null
          case "\"" => y -= leading; x = lineX; emit(pendingStr); pendingStr = null
          case _ => ()
        }
        nums.clear()
        i = if (j > i) j else i + 1
      }
    }
  }
}
