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

  test("embedded FileDataStoreObjects round-trip and spawn as children") {
    import graft.core.{DocIn, SpanIn}
    import graft.core.route.Extract
    val inner = graft.sources.Archive.zipBytes(Seq(("z.txt", "zip in onenote".getBytes(UTF_8))))
    val one = OneNote.build(Seq("host note text"),
      files = Seq("plain embedded file".getBytes(UTF_8), inner))
    val (txt, fs) = OneNote.parse(one)
    assert(txt == "host note text")
    assert(fs.length == 2 && fs(0).sameElements("plain embedded file".getBytes(UTF_8)))
    // top-level route: root prose + sniffed children (the zip recurses)
    val nodes = Extract.explode(DocIn(71L, Array(SpanIn("one", new String(one, ISO_8859_1), "", 0))))
    val texts = nodes.map(n => (n.level, n.spans.map(_.text).mkString)).toSet
    assert(texts.contains((0, "host note text")))
    assert(texts.contains((1, "plain embedded file")))
    assert(texts.contains((2, "zip in onenote"))) // file -> zip -> entry
    // nested route: one-in-zip still spawns its embedded file below it
    val zipped = graft.sources.Archive.zipBytes(Seq(("notes.one", one)))
    val nested = Extract.explode(DocIn(72L, Array(SpanIn("zip", new String(zipped, ISO_8859_1), "", 0))))
    val host = nested.find(n => n.spans.map(_.text).mkString == "host note text").get
    assert(nested.exists(n => n.parent_id == host.doc_id &&
      n.spans.map(_.text).mkString == "plain embedded file"))
    // framing lies classify
    val broken = one.clone()
    val gIdx = broken.indexOfSlice(Array(0xe7, 0x16, 0xe3, 0xbd).map(_.toByte))
    assert(gIdx > 0)
    broken(gIdx) = 0x00
    intercept[ParseFailure](OneNote.parse(broken))
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
