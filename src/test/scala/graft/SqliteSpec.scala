package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DocIn, ParseFailure, Reason, SpanIn}
import graft.core.db.Sqlite
import graft.core.db.Sqlite.{BlobCell, IntCell, NullCell, RealCell, TextCell}
import graft.core.route.Extract
import graft.sources.{Archive, Ingest}

/** SQLite database files (Tika SQLite3Parser analog): header/page-size
  * validation, b-tree walks, serial-type record decode, overflow chains,
  * rowid aliasing, and the explode route (tables as children, blobs
  * nested) — plus malformed-input refusals.
  */
class SqliteSpec extends AnyFunSuite {

  private def span(bytes: Array[Byte]) =
    DocIn(1L, Array(SpanIn("sqlite", new String(bytes, ISO_8859_1), "", 0)))

  test("single-table round trip covers every serial type width") {
    val rows = Seq(
      Seq(IntCell(0), IntCell(1), IntCell(-5), TextCell("alpha")),
      Seq(IntCell(300), IntCell(70000), IntCell(1L << 25), TextCell("beta")),
      Seq(IntCell(1L << 40), IntCell(Long.MaxValue), NullCell, TextCell("")),
      Seq(IntCell(-1), RealCell(2.5), IntCell(7), TextCell("påté")))
    val db = Sqlite.build(Seq(("t", Seq("a", "b", "c", "d"), rows)))
    val tabs = Sqlite.tables(db)
    assert(tabs.map(_.name) == Vector("t"))
    assert(tabs.head.columns == Vector("a", "b", "c", "d"))
    assert(tabs.head.rows.map(_.cells) == rows.map(_.toVector).toVector)
    assert(Sqlite.tableText(tabs.head).startsWith("a\tb\tc\td\n0\t1\t-5\talpha\n"))
  }

  test("multiple tables keep schema order and their own columns") {
    val db = Sqlite.build(Seq(
      ("users", Seq("id", "name"), Seq(Seq(IntCell(1), TextCell("ada")))),
      ("logs", Seq("ts", "msg"), Seq(Seq(IntCell(99), TextCell("boot")),
        Seq(IntCell(100), TextCell("halt"))))))
    val tabs = Sqlite.tables(db)
    assert(tabs.map(t => (t.name, t.rows.length)) == Vector(("users", 1), ("logs", 2)))
    assert(Sqlite.tableText(tabs(1)) == "ts\tmsg\n99\tboot\n100\thalt")
  }

  test("a multi-page table walks through its interior page in rowid order") {
    // 512-byte pages force several leaves + one interior root
    val rows = (1 to 120).map(i => Seq(IntCell(i.toLong), TextCell(s"row-$i-padding-to-make-cells-wide")))
    val db = Sqlite.build(Seq(("big", Seq("n", "s"), rows)), pageSize = 512)
    val t = Sqlite.tables(db).head
    assert(t.rows.length == 120)
    assert(t.rows.map(_.rowid) == (1L to 120L).toVector) // in-order traversal
    assert(t.rows(54).cells == Vector(IntCell(55), TextCell("row-55-padding-to-make-cells-wide")))
  }

  test("an oversized record spills to an overflow chain and reads back whole") {
    val long = "x" * 3000 // > maxLeaf for 512-byte pages, multi-page chain
    val db = Sqlite.build(Seq(("o", Seq("k", "v"),
      Seq(Seq(IntCell(1), TextCell(long)), Seq(IntCell(2), TextCell("small"))))), pageSize = 512)
    val t = Sqlite.tables(db).head
    assert(t.rows.head.cells == Vector(IntCell(1), TextCell(long)))
    assert(t.rows(1).cells == Vector(IntCell(2), TextCell("small")))
  }

  test("INTEGER PRIMARY KEY null cells substitute the rowid") {
    // build writes the record exactly as given; a NULL in the ipk column is
    // how SQLite itself stores the alias
    val db = Sqlite.build(Seq(("p", Seq("id INTEGER PRIMARY KEY", "v"),
      Seq(Seq(NullCell, TextCell("a")), Seq(NullCell, TextCell("b"))))))
    val t = Sqlite.tables(db).head
    assert(t.columns == Vector("id", "v"))
    assert(t.rows.map(_.cells) == Vector(
      Vector(IntCell(1), TextCell("a")), Vector(IntCell(2), TextCell("b"))))
  }

  test("short records (pre-ALTER rows) pad with NULL to the declared arity") {
    val db = Sqlite.build(Seq(("s", Seq("a", "b", "c"),
      Seq(Seq(IntCell(1)), Seq(IntCell(2), TextCell("x"), TextCell("y"))))))
    val t = Sqlite.tables(db).head
    assert(t.rows.head.cells == Vector(IntCell(1), NullCell, NullCell))
    assert(Sqlite.tableText(t) == "a\tb\tc\n1\t\t\n2\tx\ty")
  }

  test("sqlite bytes sniff as kind=sqlite and explode one child per table") {
    val db = Sqlite.build(Seq(
      ("t1", Seq("a"), Seq(Seq(TextCell("one")))),
      ("t2", Seq("b"), Seq(Seq(TextCell("two"))))))
    assert(Ingest.sniffKind(db) == "sqlite")
    val out = Extract.explode(span(db))
    val root = out.find(_.level == 0).get
    assert(root.spans.map(_.text).mkString.isEmpty) // container: no own text
    val kids = out.filter(_.level == 1)
    assert(kids.map(_.spans.map(_.text).mkString("")) ==
      Vector("a\none", "b\ntwo"))
  }

  test("blob cells spawn as sniffed embedded children under their table") {
    val png = graft.multimodal.Media.encodePng(3, 2, 0xabcdef)
    val db = Sqlite.build(Seq(("m", Seq("id", "img"),
      Seq(Seq(IntCell(7), BlobCell(png))))))
    val out = Extract.explode(span(db))
    val table = out.find(_.level == 1).get
    assert(table.spans.map(_.text).mkString("") == s"id\timg\n7\t[blob ${png.length}B]")
    val blobs = out.filter(_.level == 2)
    assert(blobs.size == 1) // the png, routed through the image kind
  }

  test("a database inside a zip becomes a container child with tables below") {
    val db = Sqlite.build(Seq(("z", Seq("c"), Seq(Seq(TextCell("zipped"))))))
    val zip = Archive.zipBytes(Seq(("data.db", db)))
    val out = Extract.explode(DocIn(1L, Array(SpanIn("zip", new String(zip, ISO_8859_1), "", 0))))
    val dbNode = out.find(_.level == 1).get
    assert(dbNode.spans.isEmpty) // pure container node
    assert(out.filter(_.level == 2).map(_.spans.map(_.text).mkString("")) ==
      Vector("c\nzipped"))
  }

  test("internal sqlite_ tables and non-table schema rows are skipped") {
    // hand-add an index row by building then reparsing is complex; instead
    // verify the filter via a table literally named sqlite_sequence
    val db = Sqlite.build(Seq(
      ("sqlite_sequence", Seq("name", "seq"), Seq(Seq(TextCell("t"), IntCell(5)))),
      ("real", Seq("v"), Seq(Seq(IntCell(42))))))
    assert(Sqlite.tables(db).map(_.name) == Vector("real"))
  }

  test("CREATE TABLE parsing: quoting styles, constraints, WITHOUT ROWID") {
    val (cols, ipk, wr) = Sqlite.parseCreate(
      """CREATE TABLE t ("a" TEXT, [b] INT, `c` BLOB, d INTEGER PRIMARY KEY,
        | PRIMARY KEY (a, b), UNIQUE(c), CHECK (d > 0)) WITHOUT ROWID""".stripMargin)
    assert(cols == Vector("a", "b", "c", "d"))
    assert(ipk == 3)
    assert(wr)
  }

  test("malformed databases throw ParseFailure, never partial data") {
    val db = Sqlite.build(Seq(("t", Seq("a"), Seq(Seq(TextCell("v"))))))
    // truncation below the last page
    intercept[ParseFailure](Sqlite.tables(db.take(db.length - 100)))
    // corrupt page size
    val badPs = db.clone(); badPs(16) = 0x01; badPs(17) = 0x23
    intercept[ParseFailure](Sqlite.tables(badPs))
    // corrupt root page type
    val badType = db.clone(); badType(100) = 0x77
    intercept[ParseFailure](Sqlite.tables(badType))
    // not sqlite at all
    intercept[ParseFailure](Sqlite.tables("hello".getBytes(ISO_8859_1)))
  }

  test("the cell budget refuses decode bombs loudly") {
    val rows = (1 to 50).map(i => Seq(IntCell(i.toLong), TextCell("x")))
    val db = Sqlite.build(Seq(("t", Seq("a", "b"), rows)))
    intercept[ParseFailure](Sqlite.tables(db, maxCells = 20))
  }

  test("a corrupt db nested in a zip isolates: sibling survives, db fails") {
    val db = Sqlite.build(Seq(("t", Seq("a"), Seq(Seq(TextCell("v"))))))
    val corrupt = db.take(150) ++ Array.fill(50)(0x00.toByte) // valid magic, broken pages
    val zip = Archive.zipBytes(Seq(("ok.txt", "plain".getBytes(ISO_8859_1)), ("bad.db", corrupt)))
    val out = Extract.explode(DocIn(1L, Array(SpanIn("zip", new String(zip, ISO_8859_1), "", 0))))
    val kids = out.filter(_.level == 1)
    assert(kids.exists(_.spans.map(_.text).mkString("") == "plain"))
    assert(kids.exists(_.no_content_reason == Reason.ParseFailed))
  }
}
