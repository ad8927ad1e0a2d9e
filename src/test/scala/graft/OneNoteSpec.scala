package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import graft.core.ParseFailure
import graft.core.office.OneNote

/** OneNote revision-store reader/writer: round-trips through the full
  * root→space→revision list chain, geometry-lie refusals, end-to-end
  * routing.
  */
class OneNoteSpec extends AnyFunSuite {

  test("build/text round-trips paragraphs through the list chain") {
    val paras = Seq("first note line", "second with ünïcode", "third")
    val one = OneNote.build(paras)
    assert(OneNote.isOne(one))
    assert(graft.sources.Ingest.sniffKind(one, "notes.one") === "one")
    assert(OneNote.text(one) === paras.mkString("\n"))
    // empty section: nil root reference
    assert(OneNote.text(OneNote.build(Nil)) === "")
  }

  test("geometry lies classify, never raw exceptions") {
    val one = OneNote.build(Seq("x"))
    // corrupt the list magic of the root fragment
    val rootStp = java.nio.ByteBuffer.wrap(one, 172, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    val badMagic = one.clone(); badMagic(rootStp) = 0x42
    intercept[ParseFailure](OneNote.text(badMagic))
    // root reference past the file end
    val badRef = one.clone()
    java.nio.ByteBuffer.wrap(badRef, 172, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(one.length.toLong + 100)
    intercept[ParseFailure](OneNote.text(badRef))
    // truncation inside a referenced blob
    intercept[ParseFailure](OneNote.text(java.util.Arrays.copyOf(one, 1030)))
  }

  test("a self-referencing fragment is a cycle, not a hang") {
    val one = OneNote.build(Seq("x"))
    val rootStp = java.nio.ByteBuffer.wrap(one, 172, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    val rootCb = java.nio.ByteBuffer.wrap(one, 180, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    // point the root fragment's next-fragment reference back at itself
    val looped = one.clone()
    val nextAt = rootStp + rootCb - 20
    java.nio.ByteBuffer.wrap(looped, nextAt, 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(rootStp.toLong).putInt(rootCb)
    intercept[ParseFailure](OneNote.text(looped))
  }

  test("routes end-to-end: own text on the span, nested one-in-zip extracts") {
    val one = OneNote.build(Seq("onenote body text"))
    val out = graft.core.route.Extract.explode(graft.core.DocIn(26L,
      Array(graft.core.SpanIn("one", new String(one, ISO_8859_1), "", 0))))
    assert(out.head.spans.map(_.text).mkString === "onenote body text")
    val zip = graft.sources.Archive.zipBytes(Seq(("notes.one", one)))
    val out2 = graft.core.route.Extract.explode(graft.core.DocIn(27L,
      Array(graft.core.SpanIn("zip", new String(zip, ISO_8859_1), "", 0))))
    assert(out2.filter(_.level == 1).flatMap(_.spans).map(_.text) === Seq("onenote body text"))
  }
}
