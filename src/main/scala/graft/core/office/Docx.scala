package graft.core.office

import java.nio.charset.StandardCharsets.UTF_8

/** Minimal OOXML WordprocessingML (docx) support, from scratch on the
  * published ECMA-376 package layout: a docx is a ZIP whose
  * `word/document.xml` carries the body as `<w:p>` paragraphs of `<w:r>`
  * runs with `<w:t>` text. The reference extracts these through Tika's
  * OOXML parser and recursively spawns the package's embedded media/objects
  * (`recursive_embedded.docx` fixture, `EmbedSpawner.java:429-515`).
  *
  * Here: body text = `<w:t>` runs concatenated, one line per paragraph;
  * embedded parts (word/media/, word/embeddings/) spawn as children; the
  * rest of the package (content types, styles, rels) is internals and does
  * not spawn. Parsing is a linear scan — no XML library, no DOM.
  */
object Docx {

  val DocumentEntry = "word/document.xml"

  def isDocx(entryNames: Seq[String]): Boolean = entryNames.contains(DocumentEntry)

  /** Package parts that are embedded DOCUMENTS/media (spawn as children),
    * vs package internals (do not).
    */
  def isEmbeddedPart(name: String): Boolean =
    name.startsWith("word/media/") || name.startsWith("word/embeddings/")

  /** Body text of word/document.xml: `<w:t>` run contents in document
    * order, a newline per closed paragraph, XML entities unescaped.
    * Tolerant of junk — scans, never throws.
    */
  def bodyText(xml: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = xml.length
    def isRunOpen(t: Int): Boolean = {
      // "<w:t" must be the full tag name: next char ends the name
      val c = if (t + 4 < n) xml.charAt(t + 4) else ' '
      c == '>' || c == ' ' || c == '/'
    }
    while (i < n) {
      val t0 = xml.indexOf("<w:t", i)
      val t = if (t0 >= 0 && !isRunOpen(t0)) {
        // skip lookalikes (<w:tbl, <w:tc, ...) by advancing past them
        var k = t0
        while (k >= 0 && !isRunOpen(k)) k = xml.indexOf("<w:t", k + 4)
        k
      } else t0
      val p = xml.indexOf("</w:p>", i)
      if (t < 0 && p < 0) i = n
      else if (p >= 0 && (t < 0 || p < t)) {
        // one newline per CLOSED paragraph, unconditionally — an empty
        // paragraph is an empty line, exactly like the SQL oracle's
        // string_agg over lines (the final close's newline is trimmed below)
        sb.append('\n')
        i = p + 6
      } else {
        val gt = xml.indexOf('>', t)
        if (gt < 0) i = n
        else if (xml.charAt(gt - 1) == '/') i = gt + 1 // self-closing <w:t/>
        else {
          val end = xml.indexOf("</w:t>", gt)
          if (end < 0) i = n
          else { sb.append(unescape(xml.substring(gt + 1, end))); i = end + 6 }
        }
      }
    }
    // a trailing paragraph close leaves one dangling newline
    if (sb.nonEmpty && sb.charAt(sb.length - 1) == '\n') sb.setLength(sb.length - 1)
    sb.toString
  }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&") // &amp; LAST (no double-decode)

  /** Deterministic minimal docx package: one `<w:t>` run per paragraph,
    * plus embedded media parts. Round-trips through [[bodyText]].
    */
  def buildMinimal(paragraphs: Seq[String],
                   media: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    val body = paragraphs.map(p => s"<w:p><w:r><w:t>${escape(p)}</w:t></w:r></w:p>").mkString
    val doc = ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      s"<w:body>$body</w:body></w:document>")
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/></Types>"""
    graft.sources.Archive.zipBytes(Seq(
      ("[Content_Types].xml", contentTypes.getBytes(UTF_8)),
      (DocumentEntry, doc.getBytes(UTF_8))) ++ media)
  }

  /** Top-level zip-span text route: a docx package yields its body text;
    * a plain archive has no own text. Corrupt bytes throw ParseFailure
    * (classified by the job layer). SINGLE streaming pass that inflates
    * only word/document.xml — a plain 16 MB archive costs one entry-name
    * walk here, not a full decompression of every payload.
    */
  def zipText(zipLatin1: String, maxEntryBytes: Int): String = {
    val bytes = zipLatin1.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val (names, doc) = graft.sources.Archive.unzipNamesAndOne(bytes, DocumentEntry, maxEntryBytes)
    if (!isDocx(names)) ""
    else doc.map(b => bodyText(new String(b, UTF_8))).getOrElse("")
  }
}
