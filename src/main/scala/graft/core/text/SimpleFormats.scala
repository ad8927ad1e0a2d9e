package graft.core.text

/** RTF text extraction, from scratch on the published RTF 1.x spec — the
  * reference covers it through Tika (`ExtractorTest.java:132-148` asserts
  * exact RTF fixture text). Subset: groups, control words with optional
  * numeric parameter and delimiter space, `\'hh` hex escapes, escaped
  * braces/backslash, `\par`/`\line` -> newline, `\tab` -> tab, destination
  * groups (fonttbl/colortbl/stylesheet/info and `{\*...}`) skipped.
  * Tolerant: junk never throws.
  */
object Rtf {

  /** Groups whose payload is NOT body text: header tables, metadata, and —
    * critically for real Word output — picture/object data ({\pict emitted
    * WITHOUT \* by Word inside {\nonshppict}) whose hex stream would
    * otherwise dump megabytes into the text. Footnotes/headers are
    * non-body furniture and skip too.
    */
  private val Destinations =
    Seq("\\fonttbl", "\\colortbl", "\\stylesheet", "\\info", "\\*",
      "\\pict", "\\nonshppict", "\\shppict", "\\object",
      "\\footnote", "\\header", "\\footer")

  /** Per-codepage 256-entry decode tables for \'hh escapes, honoring the
    * document's `\ansicpg<n>` declaration (single-byte Windows codepages
    * 1250-1258/874; DBCS codepages like 932 can't be decoded bytewise and
    * fall back, as does an unknown n). Default 1252: 0x80-0x9F are smart
    * quotes/dashes there — a raw toChar would emit invisible C1 controls.
    * Table built once per codepage (memoized), so the hot path is a single
    * array index, not a CharsetDecoder call per escape.
    */
  private val SingleByteCps: Set[Int] = Set(874, 1250, 1251, 1252, 1253, 1254, 1255, 1256, 1257, 1258)
  private val cpTables = new java.util.concurrent.ConcurrentHashMap[Int, Array[Char]]()
  private def cpTable(cp: Int): Array[Char] =
    cpTables.computeIfAbsent(if (SingleByteCps(cp)) cp else 1252, c => {
      val cs = java.nio.charset.Charset.forName("windows-" + c)
      Array.tabulate(256)(b => new String(Array(b.toByte), cs).charAt(0))
    })

  def text(rtf: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = rtf.length
    var depth = 0
    var skipDepth = 0 // depth of the destination group being skipped (0 = none)
    var table = cpTable(1252) // \'hh decode table; switched by \ansicpg<n>
    var ucSkip = 1 // \ucN fallback-character count consumed after each \uN
    def emitting: Boolean = skipDepth == 0
    while (i < n) {
      rtf.charAt(i) match {
        case '{' =>
          depth += 1
          if (emitting) {
            val rest = rtf.substring(i + 1, math.min(n, i + 13))
            if (Destinations.exists(rest.startsWith)) skipDepth = depth
          }
          i += 1
        case '}' =>
          if (skipDepth == depth) skipDepth = 0
          depth = math.max(0, depth - 1)
          i += 1
        case '\\' if i + 1 < n =>
          val d = rtf.charAt(i + 1)
          if (d == '\'' && i + 3 < n) {
            val hx = Character.digit(rtf.charAt(i + 2), 16)
            val lx = Character.digit(rtf.charAt(i + 3), 16)
            if (hx >= 0 && lx >= 0) {
              if (emitting) sb.append(table(hx * 16 + lx))
              i += 4
            } else i += 2 // malformed hex escape: drop the marker, keep going
          } else if (d == '\\' || d == '{' || d == '}') {
            if (emitting) sb.append(d)
            i += 2
          } else if (d.isLetter) {
            var j = i + 1
            while (j < n && rtf.charAt(j).isLetter) j += 1
            val word = rtf.substring(i + 1, j)
            var k = j // optional signed numeric parameter
            if (k < n && (rtf.charAt(k) == '-' || rtf.charAt(k).isDigit)) {
              k += 1
              while (k < n && rtf.charAt(k).isDigit) k += 1
            }
            val numStr = rtf.substring(j, k)
            if (k < n && rtf.charAt(k) == ' ') k += 1 // delimiter space consumed
            if (emitting) word match {
              case "par" | "line" => sb.append('\n')
              case "tab" => sb.append('\t')
              case "ansicpg" if numStr.nonEmpty && numStr.length <= 6 && numStr.head != '-' =>
                table = cpTable(numStr.toInt) // document codepage declaration
              case "uc" if numStr.nonEmpty =>
                ucSkip = math.max(0, numStr.toIntOption.getOrElse(1))
              case "u" if numStr.nonEmpty =>
                // \uN: the signed 16-bit code point Word emits for every
                // non-ANSI character; the next \uc fallback characters
                // (plain or \'hh) are the legacy substitute and must be
                // skipped, not emitted
                numStr.toIntOption.foreach { num =>
                  sb.append((((num % 65536) + 65536) % 65536).toChar)
                  var skip = ucSkip
                  while (skip > 0 && k < n) {
                    val fc = rtf.charAt(k)
                    if (fc == '\\' && k + 1 < n && rtf.charAt(k + 1) == '\'')
                      { k = math.min(n, k + 4); skip -= 1 }
                    else if (fc == '{' || fc == '}' || fc == '\\') skip = 0
                    else { k += 1; skip -= 1 }
                  }
                }
              case _ => () // formatting control words contribute no text
            }
            i = k
          } else i += 2 // unknown control symbol
        case '\r' | '\n' => i += 1 // raw newlines are ignored in RTF source
        case c =>
          if (emitting) sb.append(c)
          i += 1
      }
    }
    sb.toString
  }
}

/** RFC-4180 CSV to table text (Tika renders delimited files as rows of
  * tab-joined cells): quoted fields, `""` quote escapes, embedded commas
  * and newlines inside quotes, CRLF or LF row ends. Junk-tolerant.
  */
object Csv {

  def text(csv: String): String = {
    val out = new StringBuilder
    val field = new StringBuilder
    var inQuotes = false
    // true only while the most recent processed char was an UNQUOTED row
    // terminator — distinguishes 'source ends with CRLF' (dangling empty
    // row, stripped) from 'last quoted field ends in \n' (data, kept)
    var atRowEnd = false
    var i = 0
    val n = csv.length
    def endField(): Unit = { out.append(field); field.setLength(0) }
    while (i < n) {
      val c = csv.charAt(i)
      if (inQuotes) {
        atRowEnd = false
        if (c == '"') {
          if (i + 1 < n && csv.charAt(i + 1) == '"') { field.append('"'); i += 2 }
          else { inQuotes = false; i += 1 }
        } else { field.append(c); i += 1 }
      } else c match {
        case '"' => inQuotes = true; atRowEnd = false; i += 1
        case ',' => endField(); out.append('\t'); atRowEnd = false; i += 1
        case '\r' => i += 1 // CR folds into the following LF's row end
        case '\n' => endField(); out.append('\n'); atRowEnd = true; i += 1
        case _ => field.append(c); atRowEnd = false; i += 1
      }
    }
    endField()
    if (atRowEnd && out.nonEmpty && out.charAt(out.length - 1) == '\n')
      out.setLength(out.length - 1)
    out.toString
  }
}

/** JSONL (one JSON object per line) — the interchange format training-text
  * corpora ship in (`{"text": ...}` records a la C4/Pile/RedPajama dumps).
  * Each line is a separate logical document: the explosion spawns one
  * child per line carrying its `text` field.
  *
  * [[Jsonl.textField]] is a depth-aware scanner, not a full JSON parser:
  * it decodes the STRING VALUE of a top-level `"text"` key with real
  * escape handling (\" \\ \/ \b \f \n \r \t \uXXXX), ignoring same-named
  * keys nested deeper. Malformed lines yield None — per-line resilience,
  * like the reference's per-entry failure capture, never a throw.
  */
object Jsonl {

  /** A payload looks like JSONL when its first line is a one-line JSON
    * object (trimmed: starts '{', ends '}').
    */
  def looksJsonl(bytes: Array[Byte]): Boolean = {
    val limit = math.min(bytes.length, 8192)
    var end = 0
    while (end < limit && bytes(end) != '\n') end += 1
    val line = new String(bytes, 0, end, java.nio.charset.StandardCharsets.UTF_8).trim
    if (end < limit || end == bytes.length)
      // the first line fit in the probe: demand a complete object
      line.length >= 2 && line.charAt(0) == '{' && line.charAt(line.length - 1) == '}'
    else
      // first record longer than the probe (routine for document-level
      // dumps): accept on the `{"` object-start shape — plain text
      // essentially never begins that way
      line.length >= 2 && line.charAt(0) == '{' &&
        line.drop(1).dropWhile(_.isWhitespace).headOption.contains('"')
  }

  /** Decode the JSON string starting at the opening quote `i`; returns
    * (value, index after closing quote), or None when malformed.
    */
  private def parseString(s: String, i: Int): Option[(String, Int)] = {
    if (i >= s.length || s.charAt(i) != '"') return None
    val sb = new StringBuilder
    var p = i + 1
    while (p < s.length) {
      s.charAt(p) match {
        case '"' => return Some((sb.toString, p + 1))
        case '\\' =>
          if (p + 1 >= s.length) return None
          s.charAt(p + 1) match {
            case '"' => sb.append('"'); p += 2
            case '\\' => sb.append('\\'); p += 2
            case '/' => sb.append('/'); p += 2
            case 'b' => sb.append('\b'); p += 2
            case 'f' => sb.append('\f'); p += 2
            case 'n' => sb.append('\n'); p += 2
            case 'r' => sb.append('\r'); p += 2
            case 't' => sb.append('\t'); p += 2
            case 'u' =>
              if (p + 6 > s.length) return None
              val hex = s.substring(p + 2, p + 6)
              // strict ASCII hex only — parseInt would also accept a
              // leading sign or Unicode digits and fabricate characters
              if (!hex.forall(c => (c >= '0' && c <= '9') ||
                (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))) return None
              sb.append(Integer.parseInt(hex, 16).toChar); p += 6
            case _ => return None
          }
        case c => sb.append(c); p += 1
      }
    }
    None // unterminated
  }

  /** The string value of the top-level `field` key, or None when the line
    * is malformed, the key is absent at depth 1, or its value is not a
    * string. Nested objects' same-named keys are skipped by depth
    * tracking; strings are skipped atomically so braces INSIDE values
    * can't corrupt the depth.
    */
  def textField(line: String, field: String = "text"): Option[String] = {
    var i = 0
    var depth = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case '"' =>
          parseString(line, i) match {
            case None => return None
            case Some((s, next)) =>
              var j = next
              while (j < line.length && line.charAt(j).isWhitespace) j += 1
              if (j < line.length && line.charAt(j) == ':') {
                // this string was a KEY
                var k = j + 1
                while (k < line.length && line.charAt(k).isWhitespace) k += 1
                if (depth == 1 && s == field) {
                  return parseString(line, k).map(_._1) // None unless a string value
                }
                i = j + 1 // the VALUE is consumed by the main loop
              } else i = next
          }
        case _ => i += 1
      }
    }
    None
  }
}

/** vCard (RFC 6350) and iCalendar (RFC 5545) text extraction — the
  * reference detects and parses both through Tika (its own fixture set
  * pins vCard detection, TIKA-1249). Shared content-line machinery:
  * CRLF/LF line folding (continuation = leading SPACE or HTAB), property
  * name/params split at the first unquoted ':', and RFC text-value
  * unescaping (`\n` newline, `\,` `\;` literals, `\\` backslash).
  * Tolerant like the other simple formats: junk yields best-effort text,
  * never a throw.
  */
object Contact {

  /** Unfold RFC 5545/6350 folded lines and split into content lines. */
  private def contentLines(s: String): Vector[(String, String)] = {
    val unfolded = s.replace("\r\n", "\n").replace("\r", "\n")
      .replace("\n ", "").replace("\n\t", "")
    unfolded.split('\n').iterator.flatMap { line =>
      val c = unquotedColon(line)
      if (c <= 0) None
      else {
        // property name without parameters (NAME;PARAM=V:value), group
        // prefix stripped (item1.EMAIL — the iOS/Google export shape)
        val base = line.substring(0, c).takeWhile(_ != ';').trim
        val name = base.substring(base.indexOf('.') + 1)
          .toUpperCase(java.util.Locale.ROOT)
        Some((name, unescape(line.substring(c + 1))))
      }
    }.toVector
  }

  /** Index of the first ':' outside DQUOTE-quoted parameter values
    * (RFC 6350 §3.3 — a LABEL="...:..." param must not truncate the
    * value), or -1.
    */
  private def unquotedColon(line: String): Int = {
    var i = 0
    var quoted = false
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') quoted = !quoted
      else if (ch == ':' && !quoted) return i
      i += 1
    }
    -1
  }

  private def unescape(v: String): String = {
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val ch = v.charAt(i)
      if (ch == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case 'n' | 'N' => sb.append('\n')
          case c => sb.append(c)
        }
        i += 2
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** Leading BOM skipped in both shapes the detector meets: the decoded
    * U+FEFF and the latin1-viewed UTF-8 bytes EF BB BF (Outlook/Windows
    * exports commonly prefix one).
    */
  private def skipBom(head: String): String =
    if (head.startsWith("\ufeff")) head.substring(1)
    else if (head.length >= 3 && head.charAt(0) == '\u00ef' &&
      head.charAt(1) == '\u00bb' && head.charAt(2) == '\u00bf') head.substring(3)
    else head

  def isVcard(head: String): Boolean =
    skipBom(head).toUpperCase(java.util.Locale.ROOT).startsWith("BEGIN:VCARD")
  def isIcs(head: String): Boolean =
    skipBom(head).toUpperCase(java.util.Locale.ROOT).startsWith("BEGIN:VCALENDAR")

  /** Human-facing vCard properties, in card order. */
  private val VcardProps = Set("FN", "ORG", "TITLE", "EMAIL", "TEL", "NOTE", "ADR")
  /** Event-text iCalendar properties, in component order. */
  private val IcsProps = Set("SUMMARY", "LOCATION", "DESCRIPTION")

  def vcardText(s: String): String =
    contentLines(s).collect { case (n, v) if VcardProps.contains(n) && v.nonEmpty => v }
      .mkString("\n")

  def icsText(s: String): String =
    contentLines(s).collect { case (n, v) if IcsProps.contains(n) && v.nonEmpty => v }
      .mkString("\n")
}

/** Generic XML text extraction — the reference's Tika `XMLParser`
  * (`TextAndAttributeContentHandler` character scraping) for standalone
  * `.xml` documents that are neither HTML nor a known package part: tag
  * markup and attributes are dropped, comments / processing instructions /
  * DOCTYPE skipped, entities decoded, CDATA emitted verbatim. Each maximal
  * inter-tag character run contributes its whitespace-normalized text (if
  * non-empty) as one line, newline-joined in document order. Tolerant —
  * truncated tags/comments/CDATA stop the scan cleanly, junk never throws.
  */
object Xml {

  /** Standalone-XML sniff over the printable head: an XML declaration
    * that is not an XHTML page (those keep routing as html).
    */
  def isXml(lowerHead: String): Boolean = {
    var i = 0
    while (i < lowerHead.length && Character.isWhitespace(lowerHead.charAt(i))) i += 1
    lowerHead.startsWith("<?xml", i) && !lowerHead.contains("<html")
  }

  /** XML 1.0 predefined entities plus numeric character references;
    * an unrecognized or unterminated entity passes through verbatim.
    */
  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var replaced = false
      if (c == '&') {
        val sc = s.indexOf(';', i + 1)
        if (sc > i && sc - i <= 10) {
          val ent = s.substring(i + 1, sc)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case e if e.length > 2 && (e.startsWith("#x") || e.startsWith("#X")) =>
              try Character.toChars(Integer.parseInt(e.substring(2), 16)).mkString
              catch { case _: IllegalArgumentException => null }
            case e if e.length > 1 && e.startsWith("#") =>
              try Character.toChars(Integer.parseInt(e.substring(1))).mkString
              catch { case _: IllegalArgumentException => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = sc + 1; replaced = true }
        }
      }
      if (!replaced) { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def text(xml: String): String = {
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = {
      if (cur.nonEmpty) {
        val norm = graft.core.html.HtmlExtractor.normalizeWs(unescape(cur.toString))
        if (norm.nonEmpty) parts += norm
        cur.clear()
      }
    }
    var i = 0
    val n = xml.length
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        flush()
        if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (xml.startsWith("<![CDATA[", i)) {
          // CDATA is character data: verbatim (no entity decode), but
          // still whitespace-normalized like any other text run
          val e = xml.indexOf("]]>", i + 9)
          val body = if (e < 0) xml.substring(i + 9) else xml.substring(i + 9, e)
          val norm = graft.core.html.HtmlExtractor.normalizeWs(body)
          if (norm.nonEmpty) parts += norm
          i = if (e < 0) n else e + 3
        } else {
          val e = xml.indexOf('>', i)
          i = if (e < 0) n else e + 1
        }
      } else { cur.append(c); i += 1 }
    }
    flush()
    parts.result().mkString("\n")
  }
}
