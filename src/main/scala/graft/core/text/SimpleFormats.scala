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
