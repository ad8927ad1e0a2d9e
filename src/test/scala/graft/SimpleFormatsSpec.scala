package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.text.{Csv, Rtf}

/** RTF/CSV goldens mirroring the reference's rtf and csv fixture asserts
  * (`ExtractorTest.java:132-148` exact-string semantics).
  */
class SimpleFormatsSpec extends AnyFunSuite {

  test("rtf: control words, destinations, hex escapes, par/tab") {
    val rtf = """{\rtf1\ansi{\fonttbl{\f0 Times New Roman;}}{\info{\author Eve}}""" +
      """\f0 first line\par second\tab cell\par \'e9t\'e9 caf\'e9}"""
    assert(Rtf.text(rtf) == "first line\nsecond\tcell\nété café")
    // escaped braces/backslash are literal text; author never leaks
    assert(Rtf.text("""{\rtf1 a \{b\} c \\ d}""") == "a {b} c \\ d")
    assert(!Rtf.text(rtf).contains("Eve"))
    // {\*\generator ...} destination skipped
    assert(Rtf.text("""{\rtf1{\*\generator Tool 1.0;}visible}""") == "visible")
    // junk never throws
    Rtf.text("""{\rtf1 \dangling""") // unterminated group
    Rtf.text("""\'zz \par""")
    assert(Rtf.text("") == "")
  }

  test("csv: quoted fields, embedded commas/quotes/newlines, CRLF") {
    assert(Csv.text("a,b\nc,d") == "a\tb\nc\td")
    assert(Csv.text("a,\"b,c\",d\r\ne,\"f\"\"g\"\"\"") == "a\tb,c\td\ne\tf\"g\"")
    assert(Csv.text("\"multi\nline\",x") == "multi\nline\tx")
    assert(Csv.text("a,b\n") == "a\tb") // trailing newline: no dangling row
    assert(Csv.text("") == "")
    Csv.text("\"unclosed") // junk never throws
  }
}
