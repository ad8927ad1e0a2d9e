package graft.core.office

import scala.collection.mutable.ArrayBuffer
import graft.core.ParseFailure

/** iWork 2013+ (IWA) text harvest — the modern .pages/.key/.numbers
  * format the legacy XML-era parser in [[Iwork]] could not cover: zip
  * packages whose `.iwa` parts under `Index/` are chunked Snappy-compressed
  * Protocol-Buffers streams. The container format is publicly documented
  * (the iWorkFileFormat reverse-engineering project; Tika's own IWork13
  * support is the same text-level surface):
  *
  *   - chunk framing: 1 byte 0x00 + uint24-LE compressed length + a RAW
  *     Snappy block (no stream framing) per chunk, concatenated;
  *   - the decompressed stream: repeated [varint length][TSP.ArchiveInfo]
  *     [payload], where ArchiveInfo field 2 holds MessageInfo records
  *     whose field 1 is the message TYPE and field 3 the PAYLOAD length;
  *   - text runs live in TSWP.StorageArchive messages (type 2001),
  *     repeated string field 3.
  *
  * Scope note (honest): the harvest surfaces body text runs in stream
  * order — styles, tables, comments, and object graphs are out of scope,
  * matching Tika's shallow IWork13 parity. Malformed framing, snappy, or
  * protobuf classifies as ParseFailure, never a task failure. The
  * [[buildPages13]] fixture writer emits the same spec shapes the reader
  * validates (round-trip discipline; no real 2013-era file ships in this
  * sandbox — noted like the PST/ANSI validation debt).
  */
object Iwa {

  private val DefaultCap = 64 << 20

  /** All chunks of one .iwa part, decompressed and concatenated. */
  def decodeChunks(bytes: Array[Byte], cap: Int = DefaultCap): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 3, 1 << 16))
    var i = 0
    while (i < bytes.length) {
      if (i + 4 > bytes.length) throw new ParseFailure("iwa: chunk header truncated")
      if (bytes(i) != 0) throw new ParseFailure(f"iwa: chunk type 0x${bytes(i)}%02x != 0")
      val len = (bytes(i + 1) & 0xff) | ((bytes(i + 2) & 0xff) << 8) | ((bytes(i + 3) & 0xff) << 16)
      if (i + 4 + len > bytes.length) throw new ParseFailure("iwa: chunk payload truncated")
      val comp = java.util.Arrays.copyOfRange(bytes, i + 4, i + 4 + len)
      val plain =
        try org.xerial.snappy.Snappy.uncompress(comp)
        catch {
          case e @ (_: java.io.IOException | _: RuntimeException) =>
            throw new ParseFailure(s"iwa: corrupt snappy chunk: ${e.getMessage}")
          case e: org.xerial.snappy.SnappyError => // Error subclass, deliberately caught:
            throw new ParseFailure(s"iwa: corrupt snappy chunk: ${e.getMessage}") // junk, not a VM fault
        }
      if (out.size() + plain.length > cap)
        throw new ParseFailure(s"iwa: decompressed stream exceeds cap $cap")
      out.write(plain)
      i += 4 + len
    }
    out.toByteArray
  }

  // ---- minimal protobuf wire reader (varint + skip-by-wire-type) ----

  private def varint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = pos
    while (i < b.length && shift < 64) {
      val c = b(i) & 0xff
      v |= (c & 0x7fL) << shift
      i += 1
      if ((c & 0x80) == 0) return (v, i)
      shift += 7
    }
    throw new ParseFailure("iwa: varint truncated or overlong")
  }

  private def skipField(b: Array[Byte], pos: Int, wire: Int): Int = wire match {
    case 0 => varint(b, pos)._2
    case 1 => pos + 8
    case 2 =>
      val (len, p) = varint(b, pos)
      if (len < 0 || p + len > b.length) throw new ParseFailure("iwa: field length out of range")
      p + len.toInt
    case 5 => pos + 4
    case w => throw new ParseFailure(s"iwa: unsupported wire type $w")
  }

  /** The (type, payloadLength) pairs of one ArchiveInfo message. */
  private def messageInfos(info: Array[Byte]): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var i = 0
    while (i < info.length) {
      val (tag, p) = varint(info, i)
      if ((tag >> 3) == 2 && (tag & 7) == 2) { // field 2: MessageInfo
        val (len, q) = varint(info, p)
        if (len < 0 || q + len > info.length) throw new ParseFailure("iwa: MessageInfo truncated")
        val mi = java.util.Arrays.copyOfRange(info, q, q + len.toInt)
        var tpe = -1
        var plen = 0
        var j = 0
        while (j < mi.length) {
          val (mtag, mp) = varint(mi, j)
          (mtag >> 3, (mtag & 7).toInt) match {
            case (1, 0) => val (v, np) = varint(mi, mp); tpe = v.toInt; j = np
            case (3, 0) => val (v, np) = varint(mi, mp); plen = v.toInt; j = np
            case (_, w) => j = skipField(mi, mp, w)
          }
        }
        if (plen < 0) throw new ParseFailure("iwa: negative payload length")
        out += ((tpe, plen))
        i = q + len.toInt
      } else i = skipField(info, p, (tag & 7).toInt)
    }
    out.result()
  }

  /** Repeated string field 3 of a TSWP.StorageArchive payload. */
  private def storageText(payload: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < payload.length) {
      val (tag, p) = varint(payload, i)
      if ((tag >> 3) == 3 && (tag & 7) == 2) { // field 3: text
        val (len, q) = varint(payload, p)
        if (len < 0 || q + len > payload.length)
          throw new ParseFailure("iwa: text run truncated")
        out += new String(payload, q, len.toInt, java.nio.charset.StandardCharsets.UTF_8)
        i = q + len.toInt
      } else i = skipField(payload, p, (tag & 7).toInt)
    }
    out.result()
  }

  private val StorageArchiveType = 2001 // TSWP.StorageArchive

  /** Text runs of one .iwa part, stream order. */
  def harvest(iwaBytes: Array[Byte], cap: Int = DefaultCap): Vector[String] = {
    val stream = decodeChunks(iwaBytes, cap)
    val out = Vector.newBuilder[String]
    var i = 0
    var objects = 0
    while (i < stream.length) {
      objects += 1
      if (objects > 1000000) throw new ParseFailure("iwa: object count exceeds bound")
      val (infoLen, p) = varint(stream, i)
      if (infoLen < 0 || p + infoLen > stream.length)
        throw new ParseFailure("iwa: ArchiveInfo truncated")
      val info = java.util.Arrays.copyOfRange(stream, p, p + infoLen.toInt)
      var pos = p + infoLen.toInt
      messageInfos(info).foreach { case (tpe, plen) =>
        // Long arithmetic: a crafted plen near Int.MaxValue would wrap
        // `pos + plen` negative and bypass the bound into an AIOOBE
        if (pos.toLong + plen > stream.length) throw new ParseFailure("iwa: payload truncated")
        if (tpe == StorageArchiveType)
          out ++= storageText(java.util.Arrays.copyOfRange(stream, pos, pos + plen))
        pos += plen
      }
      i = pos
    }
    out.result()
  }

  // --------------------------------------------------------------- writer

  private def putVarint(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += v.toByte
  }

  private def lenDelim(out: ArrayBuffer[Byte], field: Int, bytes: Array[Byte]): Unit = {
    putVarint(out, (field << 3) | 2L)
    putVarint(out, bytes.length.toLong)
    out ++= bytes
  }

  /** One spec-shaped .iwa part: a single StorageArchive (type 2001, id 1)
    * carrying `texts` as its repeated field-3 runs, snappy-chunked.
    */
  def buildIwa(texts: Seq[String]): Array[Byte] = {
    val payload = ArrayBuffer.empty[Byte]
    texts.foreach(t => lenDelim(payload, 3, t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val mi = ArrayBuffer.empty[Byte]
    putVarint(mi, (1 << 3) | 0L); putVarint(mi, StorageArchiveType.toLong) // type
    putVarint(mi, (3 << 3) | 0L); putVarint(mi, payload.length.toLong) // length
    val info = ArrayBuffer.empty[Byte]
    putVarint(info, (1 << 3) | 0L); putVarint(info, 1L) // identifier
    lenDelim(info, 2, mi.toArray)
    val stream = ArrayBuffer.empty[Byte]
    putVarint(stream, info.length.toLong)
    stream ++= info
    stream ++= payload
    val comp = org.xerial.snappy.Snappy.compress(stream.toArray)
    val out = ArrayBuffer.empty[Byte]
    out += 0
    out += (comp.length & 0xff).toByte
    out += ((comp.length >> 8) & 0xff).toByte
    out += ((comp.length >> 16) & 0xff).toByte
    out ++= comp
    out.toArray
  }

  /** Deterministic 2013-era Pages package: `Index/Document.iwa` with one
    * text run per paragraph.
    */
  def buildPages13(paras: Seq[String]): Array[Byte] =
    graft.sources.Archive.zipBytes(Seq(
      ("Index/Document.iwa", buildIwa(paras)),
      ("Metadata/DocumentIdentifier", "fixture".getBytes(java.nio.charset.StandardCharsets.UTF_8))))
}
