package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DecryptFailure, ParseFailure}
import graft.core.office.{Cfb, Xls, XlsCrypt}
import graft.core.route.Extract

/** FilePass decryption ([MS-XLS] 2.4.117 / [MS-OFFCRYPTO] 2.3.5-2.3.6):
  * the POI silent-open path — VelvetSweatshop and empty-password RC4
  * workbooks must extract exactly like their plaintext twins; real
  * passwords and XOR obfuscation classify encrypted.
  */
class XlsCryptSpec extends AnyFunSuite {

  private def rows(n: Int): Seq[Seq[(String, Boolean)]] =
    (0 until n).map(i => Seq((s"alpha$i", false), (s"beta$i", false), (i.toString, true)))

  private def plainText(n: Int): String =
    Xls.text(Cfb.streamEntries(Xls.build(rows(n)), Int.MaxValue))

  private def encRoundTrip(n: Int, pw: String, cryptoApi: Boolean, keyBits: Int = 128): String = {
    val streams = Xls.buildStreams(rows(n))
    val enc = streams.map { case (nm, b) =>
      (nm, XlsCrypt.encrypt(b, pw, s"seed-$n", cryptoApi, keyBits))
    }
    Xls.text(Cfb.streamEntries(Cfb.build(enc), Int.MaxValue))
  }

  test("standard RC4 (MD5) round trip under VelvetSweatshop") {
    assert(encRoundTrip(3, "VelvetSweatshop", cryptoApi = false) === plainText(3))
  }

  test("standard RC4 round trip under the empty password") {
    assert(encRoundTrip(3, "", cryptoApi = false) === plainText(3))
  }

  test("CryptoAPI RC4 (SHA1, 128-bit) round trip") {
    assert(encRoundTrip(3, "VelvetSweatshop", cryptoApi = true) === plainText(3))
  }

  test("CryptoAPI RC4 40-bit key pads to the 16-byte RC4 key") {
    assert(encRoundTrip(3, "VelvetSweatshop", cryptoApi = true, keyBits = 40) === plainText(3))
  }

  test("streams past 1024 bytes cross the rekey boundary correctly") {
    // enough rows that the SST + cells span several 1024-byte blocks
    val n = 120
    assert(encRoundTrip(n, "VelvetSweatshop", cryptoApi = false) === plainText(n))
    assert(encRoundTrip(n, "VelvetSweatshop", cryptoApi = true) === plainText(n))
  }

  test("a real password refuses with DecryptFailure (classifies encrypted)") {
    intercept[DecryptFailure] {
      encRoundTrip(3, "hunter2", cryptoApi = false)
    }
    intercept[DecryptFailure] {
      encRoundTrip(3, "hunter2", cryptoApi = true)
    }
  }

  test("XOR obfuscation (wEncryptionType=0) refuses with DecryptFailure") {
    val (name, book) = Xls.buildStreams(rows(2)).head
    val bofLen = (book(2) & 0xff) | ((book(3) & 0xff) << 8)
    val fp = Array[Byte](0x2f, 0x00, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00)
    val spliced = book.slice(0, 4 + bofLen) ++ fp ++ book.drop(4 + bofLen)
    intercept[DecryptFailure] { Xls.text(Seq((name, Some(spliced)))) }
  }

  test("truncated FilePass payload throws ParseFailure, never corrupts") {
    val (name, book) = Xls.buildStreams(rows(2)).head
    val bofLen = (book(2) & 0xff) | ((book(3) & 0xff) << 8)
    // declares RC4 1.1 but carries no salt/verifier
    val fp = Array[Byte](0x2f, 0x00, 0x06, 0x00, 0x01, 0x00, 0x01, 0x00, 0x01, 0x00)
    val spliced = book.slice(0, 4 + bofLen) ++ fp ++ book.drop(4 + bofLen)
    intercept[ParseFailure] { Xls.text(Seq((name, Some(spliced)))) }
  }

  test("encrypted workbook classifies through the cfb route end-to-end") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val streams = Xls.buildStreams(rows(2))
    val enc = streams.map { case (nm, b) =>
      (nm, XlsCrypt.encrypt(b, "real-secret", "s", cryptoApi = false))
    }
    val bytes = Cfb.build(enc)
    intercept[DecryptFailure] {
      Extract.extractSpan("cfb", new String(bytes, ISO_8859_1))
    }
    // nested in a zip: ONE encrypted failure child, never ciphertext text
    val zip = graft.sources.Archive.zipBytes(Seq(("locked.xls", bytes)))
    val out = Extract.explode(graft.core.DocIn(9L,
      Array(graft.core.SpanIn("zip", new String(zip, ISO_8859_1), "", 0))))
    val kids = out.filter(_.level == 1)
    assert(kids.length == 1 && kids.head.no_content_reason == graft.core.Reason.Encrypted)
  }

  test("silently-opened workbook extracts through the cfb route end-to-end") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val streams = Xls.buildStreams(rows(2))
    val enc = streams.map { case (nm, b) =>
      (nm, XlsCrypt.encrypt(b, "VelvetSweatshop", "s", cryptoApi = true))
    }
    val bytes = Cfb.build(enc)
    val (txt, why) = Extract.extractSpan("cfb", new String(bytes, ISO_8859_1))
    assert(txt === plainText(2))
    assert(why.isEmpty)
  }
}
