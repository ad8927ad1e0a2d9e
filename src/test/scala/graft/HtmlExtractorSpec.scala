package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.HtmlExtractor

class HtmlExtractorSpec extends AnyFunSuite {

  test("strips tags and keeps content blocks") {
    val html = "<html><body><p>hello world</p></body></html>"
    assert(HtmlExtractor.mainText(html) == "hello world")
  }

  test("drops head, script, style, object, noscript subtrees (safe-tag policy)") {
    val html = "<html><head><title>t</title><style>p{}</style></head>" +
      "<body><script>var x='<p>fake</p>';</script><noscript>no</noscript>" +
      "<object>obj</object><p>real</p></body></html>"
    assert(HtmlExtractor.mainText(html) == "real")
  }

  test("link-density filter drops nav/footer, keeps content") {
    val html = """<body>
      |<div><a href="/a">home</a> <a href="/b">about</a></div>
      |<div>This is a long enough content paragraph with <a href="/x">one link</a> inside it that stays.</div>
      |<div><a href="/p">privacy</a> <a href="/t">terms</a></div>
      |</body>""".stripMargin
    val out = HtmlExtractor.mainText(html)
    assert(out.contains("content paragraph"))
    assert(!out.contains("home"))
    assert(!out.contains("privacy"))
  }

  test("block elements delimit blocks; inline elements do not") {
    val html = "<p>one <b>bold</b> run</p><p>two</p>"
    assert(HtmlExtractor.mainText(html) == "one bold run\ntwo")
  }

  test("entities decoded") {
    val html = "<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65; &#x42; &nbsp;e</p>"
    assert(HtmlExtractor.mainText(html) == "a & b <c> \"d\" A B e")
  }

  test("supplementary-plane numeric references become surrogate pairs") {
    assert(HtmlExtractor.mainText("<p>&#128512; and &#x1F600;</p>") == "😀 and 😀")
  }

  test("whitespace normalized") {
    val html = "<p>  a\n\t b   c  </p>"
    assert(HtmlExtractor.mainText(html) == "a b c")
  }

  test("tolerant of malformed html: unclosed and mismatched tags") {
    val html = "<body><p>first<div>second</span><p>third"
    val out = HtmlExtractor.mainText(html)
    assert(out.contains("first") && out.contains("second") && out.contains("third"))
  }

  test("comments and doctype skipped") {
    val html = "<!DOCTYPE html><!-- a <p>comment</p> --><p>kept</p>"
    assert(HtmlExtractor.mainText(html) == "kept")
  }

  test("void and self-closing elements do not swallow content") {
    // br is a block delimiter (line break); img is transparent
    val html = "<p>a<br>b<img src='x'/>c</p>"
    assert(HtmlExtractor.mainText(html) == "a\nb c")
  }

  test("attributes containing '>' inside quotes") {
    val html = """<p><a href="/x?a>b" title='q>r'>link text here</a> plus unlinked tail that dominates the block length</p>"""
    assert(HtmlExtractor.mainText(html).contains("plus unlinked tail"))
  }

  test("golden: corpus-shaped page recovers title and content exactly") {
    val html = graft.core.Corpus.htmlWrap(42L, "alpha beta gamma")
    assert(HtmlExtractor.mainText(html) == "title 42\nalpha beta gamma")
  }

  test("raw-text script content is never parsed as markup") {
    val html = "<script>if (a<b && c>d) { x('</div>'); }</script><p>z</p>"
    assert(HtmlExtractor.mainText(html) == "z")
  }

  test("pathological nesting is depth-capped, never a stack overflow") {
    val deep = "<div>" * 200000 + "payload" + "</div>" * 200000
    assert(HtmlExtractor.mainText(deep) == "payload")
    // text beyond the cap is still collected (flattened, not dropped)
    val wide = "<p>" + "<span>" * 100000 + "kept"
    assert(HtmlExtractor.mainText(wide) == "kept")
  }

  test("empty input yields empty output") {
    assert(HtmlExtractor.mainText("") == "")
    assert(HtmlExtractor.mainText("<div></div>") == "")
  }
}
