package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import graft.core.{DocIn, ParseFailure, SpanIn}
import graft.core.route.Extract
import graft.sources.Iso

/** ISO 9660 images (ECMA-119 + Joliet): files explode as path-named
  * children; crafted records classify, never hang or overflow.
  */
class IsoSpec extends AnyFunSuite {

  test("primary hierarchy: root files and a subdirectory path-join") {
    val iso = Iso.build(Seq(
      ("README.TXT", "hello iso".getBytes(UTF_8)),
      ("NOTES.TXT", "second file".getBytes(UTF_8)),
      ("DOCS/DEEP.TXT", "nested file".getBytes(UTF_8))))
    assert(Iso.isIso(iso))
    val es = Iso.entries(iso, Int.MaxValue)
    assert(es.map(_._1) === Vector("README.TXT", "NOTES.TXT", "DOCS/DEEP.TXT"))
    assert(es.forall(_._2.isDefined))
    assert(new String(es(2)._2.get, UTF_8) === "nested file")
  }

  test("joliet names win over the primary hierarchy") {
    val iso = Iso.build(Seq(
      ("Ünïcode nämé.txt", "accented".getBytes(UTF_8))), joliet = true)
    val es = Iso.entries(iso, Int.MaxValue)
    assert(es.map(_._1) === Vector("Ünïcode nämé.txt"))
    assert(new String(es.head._2.get, UTF_8) === "accented")
  }

  test("oversized file is a counted refusal preserving siblings") {
    val iso = Iso.build(Seq(
      ("BIG.BIN", Array.fill[Byte](5000)('x'.toByte)),
      ("OK.TXT", "fits".getBytes(UTF_8))))
    val es = Iso.entries(iso, maxEntryBytes = 100)
    assert(es.map(_._1) === Vector("BIG.BIN", "OK.TXT"))
    assert(es(0)._2.isEmpty && es(1)._2.isDefined)
  }

  test("directory cycle and truncated extents classify, never hang") {
    val iso = Iso.build(Seq(("A/F.TXT", "x".getBytes(UTF_8))))
    // find the subdirectory record in the root extent and point it at the
    // ROOT extent, making root <-> sub a cycle
    val rootSector = 18 // 16 PVD, 17 terminator, 18 root (no joliet)
    // walk root records: self, parent, then the subdir record
    var off = rootSector * 2048
    var rec = 0
    while (rec < 2) { off += iso(off) & 0xff; rec += 1 }
    // this record is A (directory): overwrite its extent with the root's
    val cyc = iso.clone()
    def putBoth(o: Int, v: Long): Unit = {
      cyc(o) = (v & 0xff).toByte; cyc(o + 1) = ((v >> 8) & 0xff).toByte
      cyc(o + 2) = ((v >> 16) & 0xff).toByte; cyc(o + 3) = ((v >> 24) & 0xff).toByte
      cyc(o + 4) = cyc(o + 3); cyc(o + 5) = cyc(o + 2); cyc(o + 6) = cyc(o + 1); cyc(o + 7) = cyc(o)
    }
    putBoth(off + 2, rootSector.toLong)
    intercept[ParseFailure] { Iso.entries(cyc, Int.MaxValue) }
    // truncation: chop the image mid-file-extent
    val cut = java.util.Arrays.copyOf(iso, 19 * 2048)
    intercept[ParseFailure] { Iso.entries(cut, Int.MaxValue) }
  }

  test("explodes through the container route, nested iso-in-zip recurses") {
    val iso = Iso.build(Seq(
      ("README.TXT", "iso body text".getBytes(UTF_8)),
      ("DOCS/DEEP.TXT", "deep text".getBytes(UTF_8))))
    assert(graft.sources.Ingest.sniffKind(iso) === "iso")
    val out = Extract.explode(DocIn(3L,
      Array(SpanIn("iso", new String(iso, ISO_8859_1), "", 0))))
    val kids = out.filter(_.level == 1)
    assert(kids.length === 2)
    assert(kids.flatMap(_.spans).map(_.text).toSet === Set("iso body text", "deep text"))
    // nested: the same image inside a zip explodes one level deeper
    val zip = graft.sources.Archive.zipBytes(Seq(("drop.iso", iso)))
    val out2 = Extract.explode(DocIn(4L,
      Array(SpanIn("zip", new String(zip, ISO_8859_1), "", 0))))
    assert(out2.filter(_.level == 2).flatMap(_.spans).map(_.text).toSet ===
      Set("iso body text", "deep text"))
  }
}
