package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.core.{DecryptFailure, ParseFailure}
import graft.core.office.Wpd

/** WordPerfect 5.x document-area decode: literal text, returns, function
  * skips, extended chars, encryption classification, framing guards.
  */
class WpdSpec extends AnyFunSuite {

  test("lines decode through function skips and hard returns") {
    val b = Wpd.build(Seq("first line here", "second line", "third"))
    assert(Wpd.isWpd(b))
    assert(Wpd.text(b) === "first line here\nsecond line\nthird")
  }

  test("extended character (charset 0) emits its char") {
    val b = Wpd.build(Seq("before"), extChar = Some('!'))
    assert(Wpd.text(b) === "before!")
  }

  test("soft returns render as spaces") {
    val b = Wpd.build(Seq("one"))
    val withSoft = b ++ Array[Byte](0x0d, 'x')
    assert(Wpd.text(withSoft) === "one x")
  }

  test("password flag classifies encrypted") {
    val b = Wpd.build(Seq("secret"))
    b(10) = 0x42
    intercept[DecryptFailure] { Wpd.text(b) }
  }

  test("framing lies classify: bad pointer, mirror mismatch, truncation") {
    val b = Wpd.build(Seq("text", "more"))
    val badPtr = b.clone(); badPtr(4) = 0xff.toByte; badPtr(5) = 0xff.toByte
    badPtr(6) = 0; badPtr(7) = 0
    intercept[ParseFailure] { Wpd.text(badPtr) }
    // find the variable-function mirror byte (0xd3 ... 0xd3) and corrupt it
    val idx = b.lastIndexWhere(_ == 0xd3.toByte)
    val badMirror = b.clone(); badMirror(idx) = 0x11
    intercept[ParseFailure] { Wpd.text(badMirror) }
    // extended char cut at end
    val cut = Wpd.build(Seq("x"), extChar = Some('q')).dropRight(1)
    intercept[ParseFailure] { Wpd.text(cut) }
  }

  test("sniffs and routes end-to-end, including nested in a zip") {
    val b = Wpd.build(Seq("wpd body text"))
    assert(graft.sources.Ingest.sniffKind(b, "brief.wpd") === "wpd")
    val (txt, why) = graft.core.route.Extract.extractSpan("wpd", new String(b, ISO_8859_1))
    assert(txt === "wpd body text" && why.isEmpty)
    val zip = graft.sources.Archive.zipBytes(Seq(("brief.wpd", b)))
    val out = graft.core.route.Extract.explode(graft.core.DocIn(8L,
      Array(graft.core.SpanIn("zip", new String(zip, ISO_8859_1), "", 0))))
    assert(out.filter(_.level == 1).flatMap(_.spans).map(_.text) === Seq("wpd body text"))
  }
}
