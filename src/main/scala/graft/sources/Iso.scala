package graft.sources

import java.nio.charset.StandardCharsets
import graft.core.ParseFailure

/** ISO 9660 disk images (ECMA-119, the published CD/DVD filesystem; the
  * Tika `ISO9660Parser`-adjacent surface investigations hit as `.iso`
  * evidence images) — a from-scratch reader over the volume-descriptor
  * set and directory hierarchy, plus the Joliet supplementary descriptor
  * (UCS-2BE names announced by the %/@ %/C %/E escape sequences):
  *
  *  - 2048-byte logical sectors; descriptors start at sector 16, each
  *    `type(1) "CD001" version(1)`, type 1 = primary, 2 = supplementary,
  *    255 = set terminator;
  *  - the root directory record sits at offset 156 of the descriptor;
  *  - directory records are `len(1) extAttr(1) extent(both-endian u32)
  *    dataLen(both-endian u32) datetime(7) flags(1) unit(1) gap(1)
  *    volSeq(both-endian u16) idLen(1) id(idLen)`; a zero length byte
  *    means records resume at the next sector boundary (records never
  *    span sectors);
  *  - id 0x00/0x01 are self/parent; file ids carry a `;version` suffix;
  *    flags bit 1 marks a directory.
  *
  * When a Joliet descriptor is present its hierarchy wins (long UTF-16
  * names); otherwise the primary's. Files return as path-joined entries;
  * an entry past `maxEntryBytes` is a counted refusal (None payload)
  * preserving sibling ordinals, like every other archive reader here.
  * Cycles (a directory extent pointing at an ancestor) and crafted record
  * floods throw [[ParseFailure]] — never a task failure, never a hang.
  */
object Iso {

  private final val Sector = 2048
  private final val DescStart = 16 * Sector

  def isIso(bytes: Array[Byte]): Boolean =
    bytes.length >= DescStart + 7 &&
      bytes(DescStart + 1) == 'C' && bytes(DescStart + 2) == 'D' &&
      bytes(DescStart + 3) == '0' && bytes(DescStart + 4) == '0' &&
      bytes(DescStart + 5) == '1'

  private def u16le(b: Array[Byte], off: Int): Int = {
    if (off < 0 || off + 2 > b.length) throw new ParseFailure(s"iso: u16 past end at $off")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  }
  private def u32le(b: Array[Byte], off: Int): Long = {
    if (off < 0 || off + 4 > b.length) throw new ParseFailure(s"iso: u32 past end at $off")
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  }

  private final case class DirRec(name: String, extent: Long, dataLen: Long, isDir: Boolean)

  /** Parse the directory records inside one directory extent. */
  private def readDir(bytes: Array[Byte], extent: Long, dataLen: Long,
                      joliet: Boolean): Vector[DirRec] = {
    val start = extent * Sector
    if (start < 0 || start + dataLen > bytes.length)
      throw new ParseFailure("iso: directory extent past image end")
    val out = Vector.newBuilder[DirRec]
    var off = start
    val end = start + dataLen
    while (off < end) {
      val len = bytes(off.toInt) & 0xff
      if (len == 0) {
        // records resume at the next sector boundary
        off = ((off / Sector) + 1) * Sector
      } else {
        val o = off.toInt
        if (off + len > end) throw new ParseFailure("iso: directory record past extent end")
        val ext = u32le(bytes, o + 2)
        val dl = u32le(bytes, o + 10)
        val flags = bytes(o + 25) & 0xff
        val idLen = bytes(o + 32) & 0xff
        if (33 + idLen > len) throw new ParseFailure("iso: file identifier past record end")
        val isSpecial = idLen == 1 && (bytes(o + 33) == 0 || bytes(o + 33) == 1)
        if (!isSpecial) {
          val raw =
            if (joliet) new String(bytes, o + 33, idLen, StandardCharsets.UTF_16BE)
            else new String(bytes, o + 33, idLen, StandardCharsets.ISO_8859_1)
          val name = raw.lastIndexOf(';') match {
            case -1 => raw
            case i  => raw.substring(0, i)
          }
          out += DirRec(name, ext, dl, (flags & 0x02) != 0)
        }
        off += len
      }
    }
    out.result()
  }

  /** All regular files in the hierarchy, depth-first in directory order,
    * names path-joined. Joliet hierarchy preferred when announced.
    */
  def entries(bytes: Array[Byte], maxEntryBytes: Int,
              maxEntries: Int = 10000): Vector[Archive.UnzippedEntry] = {
    if (!isIso(bytes)) throw new ParseFailure("not an iso 9660 image")
    // volume descriptor set: remember the primary root record and, when a
    // Joliet escape set is announced, the supplementary root
    var primary: Option[(Long, Long)] = None
    var jolietRoot: Option[(Long, Long)] = None
    var desc = DescStart
    var seen = 0
    var done = false
    while (!done && desc + Sector <= bytes.length && seen < 16) {
      val t = bytes(desc) & 0xff
      val magicOk = bytes(desc + 1) == 'C' && bytes(desc + 2) == 'D' &&
        bytes(desc + 3) == '0' && bytes(desc + 4) == '0' && bytes(desc + 5) == '1'
      if (!magicOk) throw new ParseFailure(s"iso: descriptor $seen lacks CD001")
      t match {
        case 255 => done = true
        case 1 =>
          primary = Some((u32le(bytes, desc + 156 + 2), u32le(bytes, desc + 156 + 10)))
        case 2 =>
          // escape sequences field at +88: %/@ %/C %/E announce Joliet
          val esc = new String(bytes, desc + 88, 32, StandardCharsets.ISO_8859_1)
          if (esc.contains("%/@") || esc.contains("%/C") || esc.contains("%/E"))
            jolietRoot = Some((u32le(bytes, desc + 156 + 2), u32le(bytes, desc + 156 + 10)))
        case _ => () // boot/partition descriptors: irrelevant to the walk
      }
      desc += Sector
      seen += 1
    }
    val joliet = jolietRoot.isDefined
    val (rootExt, rootLen) = jolietRoot.orElse(primary)
      .getOrElse(throw new ParseFailure("iso: no primary volume descriptor"))

    val out = Vector.newBuilder[Archive.UnzippedEntry]
    var n = 0
    val visited = scala.collection.mutable.Set.empty[Long]
    def walk(extent: Long, dataLen: Long, prefix: String, depth: Int): Unit = {
      if (depth > 32) throw new ParseFailure("iso: directory nesting exceeds depth cap")
      if (!visited.add(extent)) throw new ParseFailure("iso: directory cycle detected")
      readDir(bytes, extent, dataLen, joliet).foreach { r =>
        val path = if (prefix.isEmpty) r.name else s"$prefix/${r.name}"
        if (r.isDir) walk(r.extent, r.dataLen, path, depth + 1)
        else {
          n += 1
          if (n > maxEntries) throw new ParseFailure("iso: entry count exceeds cap")
          if (r.dataLen > maxEntryBytes) out += ((path, None)) // counted refusal
          else {
            val s = r.extent * Sector
            if (s < 0 || s + r.dataLen > bytes.length)
              throw new ParseFailure("iso: file extent past image end")
            out += ((path, Some(java.util.Arrays.copyOfRange(bytes, s.toInt, (s + r.dataLen).toInt))))
          }
        }
      }
    }
    walk(rootExt, rootLen, "", 0)
    out.result()
  }

  // ------------------------------------------------------ fixture writer

  private def bothEndian32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte,
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def bothEndian16(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def dirRecord(id: Array[Byte], extent: Long, dataLen: Long, isDir: Boolean): Array[Byte] = {
    val base = 33 + id.length
    val len = base + (base % 2) // pad to even
    val r = new Array[Byte](len)
    r(0) = len.toByte
    System.arraycopy(bothEndian32(extent), 0, r, 2, 8)
    System.arraycopy(bothEndian32(dataLen), 0, r, 10, 8)
    r(25) = if (isDir) 0x02 else 0x00
    System.arraycopy(bothEndian16(1), 0, r, 28, 4)
    r(32) = id.length.toByte
    System.arraycopy(id, 0, r, 33, id.length)
    r
  }

  /** Deterministic minimal image: PVD (+ Joliet SVD when `joliet`),
    * terminator, one directory level (paths with one '/' go into a
    * subdirectory), file extents. Joliet images carry the SAME hierarchy
    * with UTF-16BE names, which is what real mastering tools emit.
    */
  def build(files: Seq[(String, Array[Byte])], joliet: Boolean = false): Array[Byte] = {
    require(files.nonEmpty, "iso fixture needs at least one file")
    val (sub, root) = files.partition(_._1.contains("/"))
    val subName = sub.headOption.map(_._1.takeWhile(_ != '/')).getOrElse("SUB")
    if (sub.exists(f => f._1.takeWhile(_ != '/') != subName || f._1.count(_ == '/') != 1))
      throw new ParseFailure("iso fixture writer supports one subdirectory level")

    def encName(s: String): Array[Byte] =
      if (joliet) s.getBytes(StandardCharsets.UTF_16BE)
      else s.getBytes(StandardCharsets.ISO_8859_1)

    // layout: sectors 16..17(+1) descriptors, then root dir, sub dir, files
    val descSectors = if (joliet) 3 else 2
    var nextSector = 16L + descSectors
    val rootSector = nextSector; nextSector += 1
    val subSector = if (sub.nonEmpty) { val s = nextSector; nextSector += 1; s } else -1L
    val fileSectors = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Int)]
    (root ++ sub).foreach { case (path, data) =>
      fileSectors(path) = (nextSector, data.length)
      nextSector += math.max(1, (data.length + Sector - 1) / Sector)
    }

    val total = (nextSector * Sector).toInt
    val img = new Array[Byte](total)
    def put(off: Long, b: Array[Byte]): Unit = System.arraycopy(b, 0, img, off.toInt, b.length)

    // directory extents
    val rootRecs = new java.io.ByteArrayOutputStream()
    rootRecs.write(dirRecord(Array[Byte](0), rootSector, Sector, isDir = true))
    rootRecs.write(dirRecord(Array[Byte](1), rootSector, Sector, isDir = true))
    root.foreach { case (p, _) =>
      val (s, l) = fileSectors(p)
      rootRecs.write(dirRecord(encName(p + ";1"), s, l, isDir = false))
    }
    if (sub.nonEmpty)
      rootRecs.write(dirRecord(encName(subName), subSector, Sector, isDir = true))
    if (rootRecs.size() > Sector) throw new ParseFailure("iso fixture root dir exceeds one sector")
    put(rootSector * Sector, rootRecs.toByteArray)

    if (sub.nonEmpty) {
      val subRecs = new java.io.ByteArrayOutputStream()
      subRecs.write(dirRecord(Array[Byte](0), subSector, Sector, isDir = true))
      subRecs.write(dirRecord(Array[Byte](1), rootSector, Sector, isDir = true))
      sub.foreach { case (p, _) =>
        val (s, l) = fileSectors(p)
        subRecs.write(dirRecord(encName(p.drop(subName.length + 1) + ";1"), s, l, isDir = false))
      }
      if (subRecs.size() > Sector) throw new ParseFailure("iso fixture sub dir exceeds one sector")
      put(subSector * Sector, subRecs.toByteArray)
    }

    (root ++ sub).foreach { case (p, data) => put(fileSectors(p)._1 * Sector, data) }

    // descriptors
    def descriptor(t: Int, escape: Array[Byte], rootRec: Array[Byte]): Array[Byte] = {
      val d = new Array[Byte](Sector)
      d(0) = t.toByte
      put0(d, 1, "CD001".getBytes(StandardCharsets.ISO_8859_1))
      d(6) = 1
      put0(d, 88, escape)
      put0(d, 156, rootRec)
      d
    }
    def put0(dst: Array[Byte], off: Int, b: Array[Byte]): Unit =
      System.arraycopy(b, 0, dst, off, b.length)

    val rootRec34 = dirRecord(Array[Byte](0), rootSector, Sector, isDir = true)
    put(DescStart, descriptor(1, Array.empty, rootRec34))
    if (joliet)
      put(DescStart + Sector,
        descriptor(2, "%/E".getBytes(StandardCharsets.ISO_8859_1), rootRec34))
    put(DescStart + (descSectors - 1).toLong * Sector,
      descriptor(255, Array.empty, Array.empty)) // set terminator
    img
  }
}
