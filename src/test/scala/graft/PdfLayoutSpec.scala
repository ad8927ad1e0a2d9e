package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.pdf.PdfLayout
import graft.core.Corpus

class PdfLayoutSpec extends AnyFunSuite {

  test("reading order: sorted by page, then line y, then x") {
    val payload = "1|0|0|b;0|0|0|a;0|1|0|c;0|0|1|d"
    assert(PdfLayout.text(payload) == "a b c d")
  }

  test("out-of-order emission is fully recovered") {
    val words = Array("the", "quick", "brown", "fox", "jumps", "over", "it")
    val payload = Corpus.pdfPayload(words)
    assert(PdfLayout.text(payload) == words.mkString(" "))
  }

  test("line clustering tolerance groups near-y words") {
    // y=10.0 and y=10.3 same line (tol 0.5); 11.0 new line
    val payload = "5|10.3|0|b;1|10.0|0|a;1|11.0|0|c"
    assert(PdfLayout.text(payload) == "a b c")
  }

  test("multi-page payloads keep page order ahead of y order") {
    val payload = "0|5|1|second;0|9|0|first"
    assert(PdfLayout.text(payload) == "first second")
  }

  test("malformed records are skipped, not fatal") {
    val payload = "0|0|0|ok;garbage;1|x|0|bad;|||;2|0|0|fine"
    assert(PdfLayout.text(payload) == "ok fine")
  }

  test("empty and null payloads") {
    assert(PdfLayout.text("") == "")
    assert(PdfLayout.text(null) == "")
  }

  test("large synthetic payload round-trips (2+ pages)") {
    val words = (0 until 50).map(i => s"w$i").toArray
    assert(PdfLayout.text(Corpus.pdfPayload(words)) == words.mkString(" "))
  }
}
