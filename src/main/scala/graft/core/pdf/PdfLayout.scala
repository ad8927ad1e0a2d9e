package graft.core.pdf

import scala.collection.mutable.ArrayBuffer

/** From-scratch PDF-style layout parser over glyph/word payloads.
  *
  * The reference recovers page structure from Tika's SAX stream
  * (`PageIndicesContentHandler.java:18-124`); our span payloads instead carry
  * positioned words (`x|y|page|word` records, ';'-separated), and this parser
  * performs the layout analysis the north star demands: glyph/word clustering
  * into lines (y-proximity), in-line ordering by x, line ordering by y, page
  * ordering by page index — i.e. reading-order reconstruction.
  *
  * Tolerant of malformed records (skipped, counted by caller via
  * [[PdfLayout.parse]] returning them) — mirroring the reference's
  * per-entry failure tolerance (`EmbedParser.java:87-131`).
  */
object PdfLayout {

  final case class Word(x: Double, y: Double, page: Int, text: String)

  /** Default line-clustering tolerance: words within this y-distance of the
    * current line's anchor join that line.
    */
  final val LineTolerance = 0.5

  def parse(payload: String): ArrayBuffer[Word] = {
    val out = ArrayBuffer.empty[Word]
    if (payload == null || payload.isEmpty) return out
    var start = 0
    val n = payload.length
    while (start <= n) {
      val end = {
        val e = payload.indexOf(';', start)
        if (e < 0) n else e
      }
      if (end > start) {
        val rec = payload.substring(start, end)
        val p1 = rec.indexOf('|')
        val p2 = if (p1 < 0) -1 else rec.indexOf('|', p1 + 1)
        val p3 = if (p2 < 0) -1 else rec.indexOf('|', p2 + 1)
        if (p3 > 0 && p3 < rec.length - 1) {
          try {
            out += Word(
              rec.substring(0, p1).toDouble,
              rec.substring(p1 + 1, p2).toDouble,
              rec.substring(p2 + 1, p3).toInt,
              rec.substring(p3 + 1))
          } catch { case _: NumberFormatException => () } // malformed: skip
        }
      }
      start = end + 1
    }
    out
  }

  /** Reading-order text: pages ascending; within a page, lines clustered by
    * y then sorted ascending; within a line, words sorted by x. All words
    * joined by single spaces (page/line boundaries are positional, not
    * textual — offsets remain recoverable from word indices).
    */
  def text(payload: String, tol: Double = LineTolerance): String = {
    val parsed = parse(payload)
    if (parsed.isEmpty) return ""
    val sorted = parsed.toArray
    // comparator sort: no per-element tuple/boxing allocation in the hot path
    java.util.Arrays.sort(sorted, new java.util.Comparator[Word] {
      def compare(a: Word, b: Word): Int = {
        if (a.page != b.page) return Integer.compare(a.page, b.page)
        val cy = java.lang.Double.compare(a.y, b.y)
        if (cy != 0) cy else java.lang.Double.compare(a.x, b.x)
      }
    })
    // cluster lines: new line when y-gap from the line anchor exceeds tol
    val sb = new StringBuilder
    var lineAnchorY = Double.NaN
    var lastPage = Int.MinValue
    val line = ArrayBuffer.empty[Word]
    def flushLine(): Unit = {
      if (line.nonEmpty) {
        val arr = line.toArray
        java.util.Arrays.sort(arr, new java.util.Comparator[Word] {
          def compare(a: Word, b: Word): Int = {
            val cx = java.lang.Double.compare(a.x, b.x)
            if (cx != 0) cx else a.text.compareTo(b.text)
          }
        })
        arr.foreach { w =>
          if (sb.nonEmpty) sb.append(' ')
          sb.append(w.text)
        }
        line.clear()
      }
    }
    sorted.foreach { w =>
      if (w.page != lastPage || (w.y - lineAnchorY) > tol) {
        flushLine()
        lineAnchorY = w.y
        lastPage = w.page
      }
      line += w
    }
    flushLine()
    sb.toString
  }
}
