package graft.core.office

import java.nio.charset.StandardCharsets

/** OLE packager streams (`Ole10Native`) — how legacy OLE embedding
  * wraps an arbitrary file inside a compound object (the reference hits
  * these through POI's `Ole10Native` when Tika explodes
  * `recursive_embedded.docx`'s `word/embeddings/oleObject1.bin`). The
  * labeled layout, verified against that real fixture:
  *
  *   u32 totalSize (stream length - 4), u16 flags1 (2 = labeled),
  *   label ASCIIZ (the display file name, e.g. `embed1.zip`),
  *   fileName ASCIIZ (the source path), u16 flags2, u16 unknown,
  *   u32 commandLength + command bytes, u32 dataSize, data.
  *
  * The wrapper is pure transport: the payload spawns sniffed under the
  * LABEL, replacing the raw stream child. [[tryUnwrap]] returns None on
  * any inconsistency so callers fall back to the generic stream spawn —
  * a malformed packager stream must never fail its parent document.
  */
object Ole {

  def isOle10Name(name: String): Boolean = name.endsWith("Ole10Native")

  def tryUnwrap(b: Array[Byte]): Option[(String, Array[Byte])] = {
    def u16(off: Int): Int =
      if (off + 2 > b.length) -1
      else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      if (off + 4 > b.length) -1L
      else (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def asciiz(off: Int): Option[(String, Int)] = {
      var i = off
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) None
      else Some((new String(b, off, i - off, StandardCharsets.ISO_8859_1), i + 1))
    }
    if (b.length < 12) return None
    if (u32(0) != b.length - 4L) return None // totalSize must frame the stream
    if (u16(4) != 2) return None // only the labeled form carries a payload here
    for {
      (label, p1) <- asciiz(6)
      (_, p2) <- asciiz(p1) // source path
      p3 = p2 + 4 // flags2 + unknown
      cmdLen = u32(p3)
      if cmdLen >= 0 && p3 + 4 + cmdLen <= b.length
      p4 = (p3 + 4 + cmdLen).toInt
      dataSize = u32(p4)
      if dataSize > 0 && p4 + 4 + dataSize <= b.length
    } yield {
      val name = if (label.nonEmpty) label else "package.bin"
      (name, java.util.Arrays.copyOfRange(b, p4 + 4, (p4 + 4 + dataSize).toInt))
    }
  }
}
