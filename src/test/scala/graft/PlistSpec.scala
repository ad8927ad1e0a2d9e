package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DocIn, ParseFailure, SpanIn}
import graft.core.db.Plist
import graft.core.db.Plist._
import graft.core.route.Extract
import graft.sources.{Archive, Ingest}

/** Apple binary plists (`bplist00`): writer/reader round trips across
  * every marker family, the flat path:value rendering, NSData spawning
  * through the explode route (incl. plist-in-plist recursion and
  * plist-in-zip), and the crafted-input refusals — cycles, reference
  * blow-ups, truncation — all classified as ParseFailure.
  */
class PlistSpec extends AnyFunSuite {

  private def roundTrip(v: PValue): PValue = Plist.parse(Plist.build(v))

  test("scalar round trip covers every marker family and int width") {
    val v = PDict(Vector(
      "null" -> PNull,
      "yes" -> PBool(true),
      "no" -> PBool(false),
      "tiny" -> PInt(7),
      "byte2" -> PInt(0x1234),
      "byte4" -> PInt(0x12345678L),
      "byte8" -> PInt(Long.MaxValue),
      "real" -> PReal(2.5),
      "when" -> PDate(6330.0),
      "ascii" -> PString("plain ascii"),
      "wide" -> PString("påté — über"),
      "blob" -> PData(Array[Byte](1, 2, 3, 4, 5))))
    val back = roundTrip(v).asInstanceOf[PDict]
    assert(back.entries.map(_._1) == v.entries.map(_._1))
    assert(back.entries.collect { case (k, x) if k != "blob" => (k, x) } ==
      v.entries.collect { case (k, x) if k != "blob" => (k, x) })
    assert(back.entries.collectFirst { case ("blob", PData(b)) => b.toSeq }
      .contains(Seq[Byte](1, 2, 3, 4, 5)))
  }

  test("nested containers and 15+ element counts take the extended-count path") {
    val wide = PArray(Vector.tabulate(40)(i => PInt(i.toLong)))
    val v = PDict(Vector(
      "outer" -> PDict(Vector("inner" -> PArray(Vector(PString("a"), wide)))),
      "long" -> PString("a string of more than fifteen characters")))
    assert(roundTrip(v) == v)
  }

  test("rendering is flat dotted paths with ISO dates and data placeholders") {
    val v = PDict(Vector(
      "app" -> PString("graft"),
      "when" -> PDate(6330.0), // CF epoch + 6330s
      "items" -> PArray(Vector(PString("alpha"), PInt(2))),
      "blob" -> PData(Array.fill(9)(0x41.toByte))))
    assert(Plist.text(v) ==
      "app: graft\nwhen: 2001-01-01T01:45:30Z\nitems[0]: alpha\nitems[1]: 2\nblob: <data 9>")
    assert(Plist.dataBlobs(v).map { case (p, b) => (p, b.length) } == Vector(("blob", 9)))
  }

  test("explode spawns data payloads as sniffed children, plist-in-plist recursing") {
    val nested = Plist.build(PDict(Vector("note" -> PString("inner note"))))
    val top = Plist.build(PDict(Vector(
      "memo" -> PData("payload text here".getBytes(UTF_8)),
      "inner" -> PData(nested))))
    assert(Ingest.sniffKind(top, "state.plist") == "plist")
    val out = Extract.explode(DocIn(1L,
      Array(SpanIn("plist", new String(top, ISO_8859_1), "state.plist", 0))))
    val root = out.find(_.level == 0).get
    assert(root.spans.map(_.text).mkString.startsWith("memo: <data 17>"))
    val kids = out.filter(_.level == 1)
    assert(kids.map(_.spans.map(_.text).mkString) ==
      Seq("payload text here", "note: inner note"))
    assert(kids.map(_.parent_id).distinct == Seq(root.doc_id))
  }

  test("a plist inside a zip routes through the nested-container branch") {
    val plist = Plist.build(PDict(Vector(
      "k" -> PString("zip plist text"),
      "d" -> PData("deep payload".getBytes(UTF_8)))))
    val zip = Archive.zipBytes(Seq(("prefs.plist", plist)))
    val out = Extract.explode(DocIn(2L,
      Array(SpanIn("zip", new String(zip, ISO_8859_1), "a.zip", 0))))
    val l1 = out.filter(_.level == 1)
    assert(l1.map(_.spans.map(_.text).mkString) == Seq("k: zip plist text\nd: <data 12>"))
    val l2 = out.filter(_.level == 2)
    assert(l2.map(_.spans.map(_.text).mkString) == Seq("deep payload"))
  }

  test("a self-referencing container classifies at the depth cap") {
    // handcrafted: object 0 is a one-element array whose ref points at itself
    val b = new java.io.ByteArrayOutputStream()
    b.write("bplist00".getBytes(ISO_8859_1))
    b.write(0xa1); b.write(0x00) // array(1) -> ref 0
    val tableOff = b.size()
    b.write(0x08) // offset of object 0
    b.write(new Array[Byte](6)); b.write(1); b.write(1) // offsetIntSize, refSize
    def be8(v: Long): Array[Byte] =
      Array.tabulate(8)(i => ((v >> (8 * (7 - i))) & 0xff).toByte)
    b.write(be8(1)); b.write(be8(0)); b.write(be8(tableOff.toLong))
    val e = intercept[ParseFailure](Plist.parse(b.toByteArray))
    assert(e.getMessage.contains("depth cap"))
  }

  test("a doubling reference DAG classifies at the visit budget, not 2^n visits") {
    // objects 0..19 are two-element arrays [i+1, i+1]; object 20 is a bool.
    // Depth is 21 (under the cap) but naive expansion is 2^20 visits.
    val objs = new java.io.ByteArrayOutputStream()
    val offs = Vector.newBuilder[Int]
    for (i <- 0 until 20) {
      offs += 8 + objs.size()
      objs.write(0xa2); objs.write(i + 1); objs.write(i + 1)
    }
    offs += 8 + objs.size(); objs.write(0x09)
    val b = new java.io.ByteArrayOutputStream()
    b.write("bplist00".getBytes(ISO_8859_1)); objs.writeTo(b)
    val tableOff = b.size()
    offs.result().foreach(b.write)
    b.write(new Array[Byte](6)); b.write(1); b.write(1)
    def be8(v: Long): Array[Byte] =
      Array.tabulate(8)(i => ((v >> (8 * (7 - i))) & 0xff).toByte)
    b.write(be8(21)); b.write(be8(0)); b.write(be8(tableOff.toLong))
    val e = intercept[ParseFailure](Plist.parse(b.toByteArray))
    assert(e.getMessage.contains("visit budget"))
  }

  test("truncation and out-of-table refs classify as ParseFailure") {
    val whole = Plist.build(PDict(Vector("k" -> PString("v"), "n" -> PInt(5))))
    for (cut <- Seq(8, 20, whole.length - 1)) {
      val t = java.util.Arrays.copyOfRange(whole, 0, cut)
      if (Plist.isBplist(t)) intercept[ParseFailure](Plist.parse(t))
    }
    // corrupt the trailer's top-object index past the table
    val bad = whole.clone()
    bad(bad.length - 9) = 0x7f
    intercept[ParseFailure](Plist.parse(bad))
  }
}
