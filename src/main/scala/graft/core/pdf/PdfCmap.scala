package graft.core.pdf

/** ToUnicode CMaps (PDF 32000-1 §9.10.3) — how real-world PDFs with
  * subset/CID fonts map their content-stream character codes to Unicode
  * (the reference extracts such text through PDFBox, which consults the
  * same CMaps). Without this, a modern Word/LaTeX-produced PDF's `Tj`
  * operands are opaque glyph indices, not text.
  *
  *  - `begincodespacerange` declares code width; `beginbfchar` maps
  *    single codes, `beginbfrange` maps ranges — to UTF-16BE hex
  *    destinations (single target, incrementing, or a bracketed array);
  *  - parsing is BEST-EFFORT and bomb-capped (entry and range-width
  *    limits): a malformed CMap yields a partial map, never a failure —
  *    the CMap is an auxiliary hint, the content stream is the document.
  *
  * Mapping: 2-byte code spaces consume code units pairwise; codes with no
  * mapping emit nothing (the PDFBox convention for unmapped subset
  * glyphs). 1-byte spaces fall back to the raw byte for unmapped codes,
  * preserving the simple-font behavior.
  */
object PdfCmap {

  final case class CMap(codeBytes: Int, map: Map[Int, String])

  private val MaxEntries = 1 << 16
  private val MaxRangeWidth = 1 << 12

  def looksCmap(s: String): Boolean =
    s.contains("beginbfchar") || s.contains("beginbfrange")

  /** Parse hex tokens `<...>` starting at or after `i`; returns
    * (hexDigits, posAfter) or null when the next token is not hex.
    */
  private def hexToken(s: String, i0: Int): (String, Int) = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length || s.charAt(i) != '<') null
    else {
      val e = s.indexOf('>', i + 1)
      if (e < 0) null
      else (s.substring(i + 1, e).filterNot(_.isWhitespace), e + 1)
    }
  }

  private def hexInt(h: String): Int =
    java.lang.Long.parseLong(h, 16).toInt

  /** UTF-16BE hex destination to a string (odd digits padded). */
  private def dstString(h: String): String = {
    val hh = if (h.length % 2 == 1) h + "0" else h
    val bytes = Array.tabulate[Byte](hh.length / 2)(k =>
      Integer.parseInt(hh.substring(2 * k, 2 * k + 2), 16).toByte)
    new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
  }

  def parse(s: String): CMap = {
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    var codeBytes = 0
    def noteWidth(srcHex: String): Unit =
      codeBytes = math.max(codeBytes, math.max(1, srcHex.length / 2))
    def capped: Boolean = map.size >= MaxEntries

    // bfchar blocks: <src> <dst> pairs
    var i = 0
    while ({ i = s.indexOf("beginbfchar", i); i >= 0 } && !capped) {
      var p = i + "beginbfchar".length
      val end = s.indexOf("endbfchar", p)
      val stop = if (end < 0) s.length else end
      var ok = true
      while (ok && p < stop && !capped) {
        val src = hexToken(s, p)
        if (src == null || src._2 > stop) ok = false
        else {
          val dst = hexToken(s, src._2)
          if (dst == null || dst._2 > stop) ok = false
          else
            try {
              map(hexInt(src._1)) = dstString(dst._1)
              noteWidth(src._1) // width only counts after BOTH tokens parse
              p = dst._2
            } catch { case _: NumberFormatException => ok = false }
        }
      }
      i = stop + 1
    }

    // bfrange blocks: <lo> <hi> <dstStart>  or  <lo> <hi> [ <d1> <d2> ... ]
    i = 0
    while ({ i = s.indexOf("beginbfrange", i); i >= 0 } && !capped) {
      var p = i + "beginbfrange".length
      val end = s.indexOf("endbfrange", p)
      val stop = if (end < 0) s.length else end
      var ok = true
      while (ok && p < stop && !capped) {
        val lo = hexToken(s, p)
        val hi = if (lo == null) null else hexToken(s, lo._2)
        if (lo == null || hi == null || hi._2 > stop) ok = false
        else {
          try {
            val a = hexInt(lo._1); val b = hexInt(hi._1)
            noteWidth(lo._1) // width only counts after the tokens parse
            if (b < a || b - a > MaxRangeWidth) ok = false
            else {
              var q = hi._2
              while (q < stop && s.charAt(q).isWhitespace) q += 1
              if (q < stop && s.charAt(q) == '[') {
                var code = a
                q += 1
                var inArr = true
                while (inArr && q < stop) {
                  while (q < stop && s.charAt(q).isWhitespace) q += 1
                  if (q < stop && s.charAt(q) == ']') { q += 1; inArr = false }
                  else hexToken(s, q) match {
                    case null => inArr = false; ok = false
                    case (h, q2) =>
                      if (code <= b && !capped) map(code) = dstString(h)
                      code += 1; q = q2
                  }
                }
                p = q
              } else hexToken(s, q) match {
                case null => ok = false
                case (d0, q2) =>
                  // incrementing destination: the LAST code point advances
                  val base = dstString(d0)
                  var code = a
                  while (code <= b && !capped) {
                    val delta = code - a
                    val mapped =
                      if (base.isEmpty) ""
                      else base.dropRight(1) + (base.last + delta).toChar
                    map(code) = mapped
                    code += 1
                  }
                  p = q2
              }
            }
          } catch { case _: NumberFormatException => ok = false }
        }
      }
      i = stop + 1
    }

    CMap(if (codeBytes == 0) 1 else codeBytes, map.toMap)
  }

  /** Map a content-stream string's code units through the CMap. */
  def mapString(raw: String, cmap: CMap): String = {
    val sb = new StringBuilder
    if (cmap.codeBytes <= 1) {
      raw.foreach { c =>
        cmap.map.get(c & 0xff) match {
          case Some(u) => sb.append(u)
          case None => sb.append(c) // simple-font fallback
        }
      }
    } else {
      var i = 0
      while (i + 1 < raw.length) {
        val code = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
        cmap.map.get(code).foreach(sb.append)
        i += 2
      }
      // an odd trailing byte is a malformed code: dropped, never garbage
    }
    sb.toString
  }
}
