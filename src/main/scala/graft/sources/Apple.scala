package graft.sources

import java.nio.charset.StandardCharsets
import graft.core.ParseFailure

/** AppleSingle envelopes (RFC 1740 — the Mac file + its metadata forks in
  * one stream; the reference reaches these via Tika's
  * AppleSingleFileParser, `Extractor.java:937` dispatch). The envelope is
  * pure transport: the DATA FORK (entry id 1) is the real file and spawns
  * sniffed under its REAL NAME (entry id 3); resource/Finder forks are
  * Mac plumbing and never index.
  *
  *  - big-endian u32 magic 0x00051600 (AppleSingle; 0x00051607 is
  *    AppleDouble, which carries NO data fork — its `._` sidecar files
  *    are dropped by the hidden-file matchers like the OS junk they are);
  *  - u32 version (1 or 2 accepted), 16 filler bytes, u16 entry count;
  *  - entries: u32 id, u32 offset, u32 length each, payloads anywhere in
  *    the remainder.
  *
  * Malformed input (bad version, entry spans past the stream end, missing
  * data fork) throws [[ParseFailure]] — classified upstream.
  */
object Apple {

  private def u32be(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) throw new ParseFailure("applesingle: truncated u32")
    else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u16be(b: Array[Byte], off: Int): Int =
    if (off + 2 > b.length) throw new ParseFailure("applesingle: truncated u16")
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  def isAppleSingle(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 0 && b(1) == 0x05 && b(2) == 0x16 && b(3) == 0

  /** (real name, data fork) — the name falls back to "data" when the
    * envelope carries no real-name entry. The fork is None (a counted
    * size refusal, like an archive entry) when its declared length
    * exceeds `maxEntryBytes`.
    */
  def unwrap(b: Array[Byte], maxEntryBytes: Int): (String, Option[Array[Byte]]) = {
    if (!isAppleSingle(b)) throw new ParseFailure("not AppleSingle: bad magic")
    val version = u32be(b, 4)
    if (version != 0x00010000L && version != 0x00020000L)
      throw new ParseFailure(f"applesingle: unknown version 0x$version%08x")
    val n = u16be(b, 24)
    if (n > 1024) throw new ParseFailure(s"applesingle: implausible entry count $n")
    var name = "data"
    var fork: Option[Option[Array[Byte]]] = None
    var i = 0
    while (i < n) {
      val off = 26 + i * 12
      val id = u32be(b, off)
      val at = u32be(b, off + 4)
      val len = u32be(b, off + 8)
      if (at + len > b.length)
        throw new ParseFailure(s"applesingle: entry $id spans [$at,+$len) past end ${b.length}")
      if (id == 3L) // real name
        name = new String(b, at.toInt, len.toInt, StandardCharsets.UTF_8)
      else if (id == 1L) // data fork
        fork = Some(
          if (len > maxEntryBytes) None // declared-size refusal, pre-copy
          else Some(java.util.Arrays.copyOfRange(b, at.toInt, (at + len).toInt)))
      i += 1
    }
    fork match {
      case Some(f) => (name, f)
      case None => throw new ParseFailure("applesingle: no data-fork entry")
    }
  }

  // ---------------------------------------------------------------- writer

  /** Deterministic AppleSingle bytes: real-name + data-fork entries (v2). */
  def build(name: String, data: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes(StandardCharsets.UTF_8)
    val headerLen = 26 + 2 * 12
    val out = new Array[Byte](headerLen + nameB.length + data.length)
    def p32(off: Int, v: Long): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    p32(0, 0x00051600L)
    p32(4, 0x00020000L)
    out(25) = 2 // entry count u16be
    p32(26, 3L); p32(30, headerLen.toLong); p32(34, nameB.length.toLong)
    p32(38, 1L); p32(42, (headerLen + nameB.length).toLong); p32(46, data.length.toLong)
    System.arraycopy(nameB, 0, out, headerLen, nameB.length)
    System.arraycopy(data, 0, out, headerLen + nameB.length, data.length)
    out
  }
}
