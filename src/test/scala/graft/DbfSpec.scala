package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.core.ParseFailure
import graft.core.db.Dbf

/** dBase tables: structural sniff (no magic), fixed-width decode, deleted
  * rows, crafted-geometry refusals.
  */
class DbfSpec extends AnyFunSuite {

  test("round trip: header + rows, widths trimmed") {
    val b = Dbf.build(Seq("NAME", "CITY"), Seq(
      Seq("ada", "london"), Seq("grace", "dc")))
    assert(Dbf.isDbf(b))
    assert(Dbf.text(b) === "NAME\tCITY\nada\tlondon\ngrace\tdc")
  }

  test("deleted records are skipped") {
    val b = Dbf.build(Seq("K"), Seq(Seq("one"), Seq("two")))
    val headerSize = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    b(headerSize) = 0x2a // delete the first record
    assert(Dbf.text(b) === "K\ntwo")
  }

  test("sniff rejects lookalikes; geometry lies classify") {
    assert(!Dbf.isDbf("plain prose that is long enough to pass the length gate ok?".getBytes(UTF_8)))
    assert(!Dbf.isDbf(Array.fill[Byte](100)(3)))
    val b = Dbf.build(Seq("K"), Seq(Seq("v")))
    // declared record count beyond the payload
    val lie = b.clone(); lie(4) = 99
    intercept[ParseFailure] { Dbf.parse(lie) }
    // field widths disagreeing with record size
    val lie2 = b.clone(); lie2(10) = 77
    intercept[ParseFailure] { Dbf.parse(lie2) }
  }

  test("sniffs and extracts through the ingestion route") {
    val b = Dbf.build(Seq("A", "B"), Seq(Seq("x", "y")))
    assert(graft.sources.Ingest.sniffKind(b, "t.dbf") === "dbf")
    val (txt, why) = graft.core.route.Extract.extractSpan("dbf",
      new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(txt === "A\tB\nx\ty" && why.isEmpty)
  }

  test("nested dbf-in-zip extracts as a document child") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val b = Dbf.build(Seq("C"), Seq(Seq("nested")))
    val zip = graft.sources.Archive.zipBytes(Seq(("gis.dbf", b)))
    val out = graft.core.route.Extract.explode(graft.core.DocIn(7L,
      Array(graft.core.SpanIn("zip", new String(zip, ISO_8859_1), "", 0))))
    assert(out.filter(_.level == 1).flatMap(_.spans).map(_.text) === Seq("C\nnested"))
  }
}
