package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.ParseFailure
import graft.core.mail.Tnef
import graft.core.office.Msg

/** MS-OXTNEF winmail.dat: build/parse round-trips, per-attribute checksum
  * validation, the eml-carrying-TNEF explosion shape (the format's real
  * habitat), and subset refusals as classified ParseFailures.
  */
class TnefSpec extends AnyFunSuite {

  test("build/parse round-trips subject, sender, body, attachments") {
    val bytes = Tnef.build("subj", "Alice Sender", "the body",
      Seq(("a.txt", "att one".getBytes(UTF_8)), ("b.bin", Array[Byte](1, 2, 3))))
    assert(Tnef.isTnef(bytes))
    assert(graft.sources.Ingest.sniffKind(bytes) == "tnef")
    val m = Tnef.parse(bytes)
    assert(m.subject == "subj" && m.from == "Alice Sender" && m.body == "the body")
    assert(m.attachments.collect { case Msg.FileAtt(n, b) => (n, b.toSeq) } ==
      Vector(("a.txt", "att one".getBytes(UTF_8).toSeq), ("b.bin", Seq[Byte](1, 2, 3))))
  }

  test("an RTF-only winmail.dat body decompresses via PR_RTF_COMPRESSED") {
    val body = "rich tnef line one\nrich tnef line two"
    val bytes = Tnef.build("rich", "Alice Sender", body, rtfBody = true)
    val m = Tnef.parse(bytes)
    assert(m.subject == "rich" && m.body == body)
    // an EMPTY plain PidTagBody must not shadow the RTF body — the same
    // nonEmpty gating as Msg.parse and the PST messaging layer
    val both = Tnef.build("rich", "Alice Sender", "", rtfBody = false)
    assert(Tnef.parse(both).body == "")
  }

  test("a flipped data byte fails the attribute checksum") {
    val bytes = Tnef.build("s", "", "body", Nil)
    // find the body text and corrupt one byte of it
    val idx = new String(bytes, ISO_8859_1).indexOf("body")
    assert(idx > 0)
    val c = bytes.clone(); c(idx) = 'X'.toByte
    val e = intercept[ParseFailure](Tnef.parse(c))
    assert(e.getMessage.contains("checksum"))
  }

  test("a tnef span explodes: body on the root, attachments as children") {
    import graft.core.{DocIn, SpanIn}
    import graft.core.route.Extract
    val bytes = Tnef.build("s", "f", "rich body",
      Seq(("inner.txt", "inner text".getBytes(UTF_8))))
    val d = DocIn(21L, Array(SpanIn("tnef", new String(bytes, ISO_8859_1), "", 0)))
    val nodes = Extract.explode(d)
    assert(nodes.exists(n => n.level == 0 && n.spans.exists(_.text == "rich body")))
    assert(nodes.exists(n => n.level == 1 && n.spans.exists(_.text == "inner text")))
  }

  test("winmail.dat inside an eml explodes through the nested route") {
    import graft.core.{DocIn, SpanIn}
    import graft.core.route.Extract
    val tnef = Tnef.build("ts", "tf", "tnef body",
      Seq(("deep.txt", "deep text".getBytes(UTF_8))))
    val eml = "From: a@b\r\nTo: c@d\r\nSubject: carrier\r\n" +
      "MIME-Version: 1.0\r\nContent-Type: multipart/mixed; boundary=XX\r\n\r\n" +
      "--XX\r\nContent-Type: text/plain\r\n\r\nmail body\r\n" +
      "--XX\r\nContent-Type: application/ms-tnef; name=winmail.dat\r\n" +
      "Content-Disposition: attachment; filename=winmail.dat\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\n" +
      java.util.Base64.getMimeEncoder.encodeToString(tnef) + "\r\n--XX--\r\n"
    val d = DocIn(22L, Array(SpanIn("eml", eml, "", 0)))
    val nodes = Extract.explode(d)
    // root mail body; level-1 tnef child with its body; level-2 attachment
    assert(nodes.exists(n => n.level == 0 && n.spans.exists(_.text.contains("mail body"))))
    assert(nodes.exists(n => n.level == 1 && n.spans.exists(_.text == "tnef body")))
    assert(nodes.exists(n => n.level == 2 && n.spans.exists(_.text == "deep text")))
  }

  test("subset refusals classify: named and multi-value MAPI properties") {
    // hand-build an attMsgProps with a named property id (>= 0x8000)
    def u16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def u32(v: Long) = u16((v & 0xffff).toInt) ++ u16(((v >> 16) & 0xffff).toInt)
    val props = u32(1L) ++ u32((0x8001L << 16) | 0x001f)
    val data = props
    val attr = Array[Byte](1) ++ u32(0x00069003L) ++ u32(data.length.toLong) ++ data ++
      u16(data.map(_ & 0xff).sum & 0xffff)
    val stream = u32(0x223E9F78L) ++ u16(1) ++ attr
    val e = intercept[ParseFailure](Tnef.parse(stream))
    assert(e.getMessage.contains("named"))
  }

  test("non-cp1252 body survives via the PT_UNICODE MAPI property") {
    val body = "\u4f60\u597d \u0436 caf\u00e9" // CJK + cyrillic + accent
    val m = Tnef.parse(Tnef.build("s", "f", body, Nil))
    assert(m.body == body) // byte-exact despite the lossy cp1252 attBody
  }

  test("determinism: same input gives byte-identical files") {
    val a = Tnef.build("s", "f", "b", Seq(("x", Array[Byte](9))))
    assert(a.sameElements(Tnef.build("s", "f", "b", Seq(("x", Array[Byte](9))))))
  }
}
