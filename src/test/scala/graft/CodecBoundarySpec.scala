package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip checks for every hand-built codec pair at the EXACT sizes
  * where code-width changes, dictionary wraps, and block boundaries land —
  * the LZW early-change divergence lived at 254 bytes and only a boundary
  * sweep catches that class (random fuzz needs luck to hit one size).
  */
class CodecBoundarySpec extends AnyFunSuite {

  private def payloads(n: Int): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(7L * n + 13)
    val random = new Array[Byte](n); rnd.nextBytes(random)
    Seq(random, Array.tabulate[Byte](n)(k => (k % 5).toByte))
  }

  test("pdf LZW round-trips across width-change and reset boundaries") {
    import graft.core.pdf.PdfMini._
    Seq(1, 253, 254, 255, 509, 510, 511, 512, 1021, 1022, 1023, 5000, 60000)
      .foreach(n => payloads(n).foreach(b =>
        assert(lzwDecode(lzwEncode(b)).exists(_.sameElements(b)), s"lzw n=$n")))
  }

  test("compress .Z round-trips across code-width boundaries") {
    import graft.sources.Archive
    Seq(1, 253, 255, 511, 512, 1023, 5000, 70000).foreach(n =>
      payloads(n).foreach(b =>
        assert(Archive.uncompressZ(Archive.compressZBytes(b), 64 << 20)
          ._2.exists(_.sameElements(b)), s"unz n=$n")))
  }

  test("compressed-RTF round-trips across the 4096 dictionary wrap") {
    import graft.core.office.RtfComp
    Seq(1, 207, 4095, 4096, 4097, 40000).foreach(n =>
      payloads(n).foreach(b =>
        assert(java.util.Arrays.equals(RtfComp.decompress(RtfComp.compress(b)), b),
          s"rtfcomp n=$n")))
  }

  test("cab MSZIP and chm LZX round-trip across the 32 KiB block boundary") {
    import graft.sources.{Cab, Chm}
    Seq(1, 32767, 32768, 32769, 70000).foreach { n =>
      payloads(n).foreach { b =>
        val cab = Cab.build(Seq(("f.bin", b)), compress = true)
        assert(Cab.entries(cab, 64 << 20)
          .collectFirst { case (_, Some(d)) => d }.exists(_.sameElements(b)), s"cab n=$n")
      }
    }
    Seq(1, 32768, 70000).foreach { n =>
      payloads(n).foreach { b =>
        val chm = Chm.build(Seq(("f.bin", b)), compress = true)
        assert(Chm.entries(chm, 64 << 20)
          .collectFirst { case (_, Some(d)) => d }.exists(_.sameElements(b)), s"chm n=$n")
      }
    }
  }
}
