package graft.core.html

import scala.collection.mutable.ArrayBuffer

/** From-scratch HTML main-content extractor.
  *
  * Re-expresses the reference's HTML handling — Tika's safe-tag policy
  * (DefaultHtmlMapper wiring at `extractor/Extractor.java:957-959`) plus a
  * Boilerpipe/Readability-style boilerplate strip — as a pure function
  * `html => mainText`, suitable for batched use inside `mapPartitions`.
  *
  * Pipeline: tokenizer -> DOM tree -> block segmentation -> link-density
  * filter. The segmentation walk mirrors Tika's BodyContentHandler (head/
  * script/style/object subtrees are dropped entirely; block-level elements
  * delimit text runs), and the keep/drop rule is the classic link-density
  * heuristic from the Boilerpipe line of work (Kohlschuetter, Fankhauser,
  * Nejdl: "Boilerplate Detection using Shallow Text Features", WSDM 2010):
  * a block is boilerplate iff the fraction of its characters that sit
  * inside anchors is >= [[HtmlExtractor.MaxLinkDensity]].
  *
  * Determinism: pure function of the input string; no locale, no clock.
  */
object HtmlExtractor {

  final val MaxLinkDensity = 0.34

  sealed trait Node
  final case class Elem(tag: String, children: ArrayBuffer[Node]) extends Node
  final case class Text(s: String) extends Node

  /** Maximum element nesting the parser will build (browsers cap around
    * 512): beyond this, open tags no longer push — bounding both the DOM
    * and the recursive extraction walk, so adversarial tag soup (a million
    * nested divs) cannot StackOverflowError a task. Errors escape the
    * poison-row Exception handler, so this must be impossible by
    * construction.
    */
  final val MaxDepth = 256

  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style")
  // Subtrees skipped entirely (safe-tag policy: non-content machinery).
  private val SkipTags = Set("script", "style", "head", "noscript",
    "template", "object", "iframe", "svg")
  // Elements that delimit text blocks.
  private val BlockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "table", "tr", "td", "th", "section", "article",
    "header", "footer", "nav", "aside", "blockquote", "pre", "br", "hr",
    "title", "main", "figure", "figcaption", "dl", "dt", "dd", "form")

  // ---------------------------------------------------------------- parse

  /** Tolerant tokenizer + tree builder. Unknown/mismatched close tags are
    * ignored; unclosed elements are closed implicitly at EOF.
    */
  def parse(html: String): Elem = {
    val root = Elem("#root", ArrayBuffer.empty)
    var stack = List(root)
    var depth = 1 // tracked separately: List.length is O(n)
    val n = html.length
    var i = 0
    val text = new StringBuilder

    def flushText(): Unit = {
      if (text.nonEmpty) {
        stack.head.children += Text(decodeEntities(text.toString))
        text.clear()
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' || c1 == '?') {
          flushText()
          // comment or doctype/PI
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '/') {
          flushText()
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val name = html.substring(i + 2, end).trim.toLowerCase
            // pop to nearest matching open element, if any
            if (stack.exists { case Elem(t, _) => t == name; case _ => false })
              while (stack.head.tag != name && stack.tail.nonEmpty) {
                stack = stack.tail; depth -= 1
              }
            if (stack.head.tag == name && stack.tail.nonEmpty) {
              stack = stack.tail; depth -= 1
            }
            i = end + 1
          }
        } else if (c1.isLetter) {
          flushText()
          // open tag: read name, then skip attributes respecting quotes
          var j = i + 1
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
          val name = html.substring(i + 1, j).toLowerCase
          var selfClose = false
          var quote: Char = 0
          var done = false
          while (j < n && !done) {
            val ch = html.charAt(j)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') done = true
            else if (ch == '/' && j + 1 < n && html.charAt(j + 1) == '>') selfClose = true
            if (!done) j += 1
          }
          i = if (j < n) j + 1 else n
          val el = Elem(name, ArrayBuffer.empty)
          stack.head.children += el
          if (RawTextTags.contains(name) && !selfClose) {
            // raw text content until matching close tag
            val lower = html
            val closeAt = indexOfIgnoreCase(lower, "</" + name, i)
            val end = if (closeAt < 0) n else closeAt
            el.children += Text(html.substring(i, end))
            i = if (closeAt < 0) n else {
              val gt = html.indexOf('>', closeAt)
              if (gt < 0) n else gt + 1
            }
          } else if (!selfClose && !VoidTags.contains(name) && depth < MaxDepth) {
            stack = el :: stack
            depth += 1
          }
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    root
  }

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    var i = from
    val n = s.length - target.length
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              // supplementary-plane refs need surrogate pairs, not toChar
              try new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(e.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // -------------------------------------------------------------- extract

  private final case class Block(text: StringBuilder, var total: Int, var linked: Int)

  /** Main-content text: block texts that survive the link-density filter,
    * joined by '\n', whitespace-normalized.
    */
  def mainText(html: String): String = {
    val root = parse(html)
    val blocks = ArrayBuffer.empty[Block]
    var cur = Block(new StringBuilder, 0, 0)

    def flush(): Unit = {
      if (cur.total > 0) blocks += cur
      cur = Block(new StringBuilder, 0, 0)
    }

    def walk(node: Node, linkDepth: Int): Unit = node match {
      case Text(s) =>
        val norm = normalizeWs(s)
        if (norm.nonEmpty) {
          if (cur.text.nonEmpty) cur.text.append(' ')
          cur.text.append(norm)
          cur.total += norm.length
          if (linkDepth > 0) cur.linked += norm.length
        }
      case Elem(tag, children) =>
        if (SkipTags.contains(tag)) ()
        else {
          val isBlock = BlockTags.contains(tag)
          if (isBlock) flush()
          val ld = if (tag == "a") linkDepth + 1 else linkDepth
          children.foreach(walk(_, ld))
          if (isBlock) flush()
        }
    }
    walk(root, 0)
    flush()
    blocks.iterator
      .filter(b => b.total > 0 && b.linked.toDouble / b.total < MaxLinkDensity)
      .map(_.text.toString)
      .mkString("\n")
  }

  def normalizeWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    sb.toString
  }
}
