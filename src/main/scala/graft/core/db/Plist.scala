package graft.core.db

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16BE, UTF_8}
import graft.core.ParseFailure

/** Apple binary property list (`bplist00`) reader + deterministic fixture
  * writer — the metadata serialization of iOS/macOS application
  * artifacts, backups, and browser state (Tika parses plists behind its
  * AutoDetect dispatch; the reference routes any sniffable structured
  * file the same way, `Extractor.java:937`).
  *
  * Implemented from the PUBLIC format layout (documented in Apple's
  * open-source CFBinaryPList.c header comment): `bplist0?` magic, a
  * marker-typed object table, an offset table of fixed-width big-endian
  * offsets, and a 32-byte trailer carrying the table geometry. Crafted
  * inputs terminate via a depth cap plus a total visit budget (an object
  * graph referencing itself expands exponentially otherwise) and every
  * read is bounds-checked to classify as ParseFailure, never a fault.
  */
object Plist {

  sealed trait PValue
  case object PNull extends PValue
  final case class PBool(v: Boolean) extends PValue
  final case class PInt(v: Long) extends PValue
  final case class PReal(v: Double) extends PValue
  /** Seconds since 2001-01-01T00:00:00Z (the CoreFoundation epoch). */
  final case class PDate(seconds: Double) extends PValue
  final case class PData(bytes: Array[Byte]) extends PValue
  final case class PString(s: String) extends PValue
  final case class PArray(items: Vector[PValue]) extends PValue
  final case class PDict(entries: Vector[(String, PValue)]) extends PValue

  def isBplist(b: Array[Byte]): Boolean =
    b.length >= 40 && new String(b, 0, 7, ISO_8859_1) == "bplist0"

  private val CfEpochSeconds = 978307200L // 2001-01-01T00:00:00Z in unix time

  private def need(ok: Boolean, what: String): Unit =
    if (!ok) throw new ParseFailure(s"bplist: $what")

  /** Decode the top object. Caps: recursion depth 32, total object
    * visits 100k (self-referencing containers otherwise blow up
    * exponentially under a depth cap alone).
    */
  def parse(b: Array[Byte]): PValue = {
    need(isBplist(b), "bad magic")
    val t = b.length - 32 // trailer
    def be(p: Int, n: Int): Long = {
      need(p >= 0 && p + n <= b.length, "read past file")
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      v
    }
    val offsetIntSize = (b(t + 6) & 0xff)
    val objectRefSize = (b(t + 7) & 0xff)
    val numObjects = be(t + 8, 8)
    val topObject = be(t + 16, 8)
    val offsetTableOffset = be(t + 24, 8)
    need(offsetIntSize >= 1 && offsetIntSize <= 8, s"offset int size $offsetIntSize")
    need(objectRefSize >= 1 && objectRefSize <= 8, s"object ref size $objectRefSize")
    need(numObjects >= 1 && numObjects <= 1000000, s"object count $numObjects")
    need(topObject < numObjects, "top object out of table")
    // non-overflowing form: numObjects<=1e6 and offsetIntSize<=8 keep the
    // product small; a near-Long.MAX table offset must not wrap the sum
    need(offsetTableOffset >= 8 && offsetTableOffset <= t &&
      numObjects * offsetIntSize <= t - offsetTableOffset,
      "offset table out of file")
    def offsetOf(idx: Long): Int = {
      val v = be((offsetTableOffset + idx * offsetIntSize).toInt, offsetIntSize)
      need(v >= 8 && v < t, s"object offset $v out of file")
      v.toInt
    }
    var visits = 0
    def readObject(idx: Long, depth: Int): PValue = {
      visits += 1
      need(visits <= 100000, "object visit budget exceeded")
      need(depth <= 32, "nesting past depth cap")
      need(idx >= 0 && idx < numObjects, s"object ref $idx out of table")
      val p = offsetOf(idx)
      val marker = b(p) & 0xff
      val hi = marker >> 4
      val lo = marker & 0x0f
      // a count nibble of 0xF means the real count follows as an int object
      def countAndStart(): (Int, Int) =
        if (lo != 0x0f) (lo, p + 1)
        else {
          val im = b(p + 1) & 0xff
          need((im >> 4) == 1, "extended count is not an int")
          val n = 1 << (im & 0x0f)
          need(n <= 8, "extended count width")
          val c = be(p + 2, n)
          need(c >= 0 && c <= Int.MaxValue, "extended count range")
          (c.toInt, p + 2 + n)
        }
      hi match {
        case 0x0 =>
          marker match {
            case 0x00 => PNull
            case 0x08 => PBool(false)
            case 0x09 => PBool(true)
            case _ => throw new ParseFailure(s"bplist: unknown singleton marker $marker")
          }
        case 0x1 => // int, 2^lo bytes big-endian (8-byte form is signed)
          val n = 1 << lo
          need(n <= 16, "int width")
          if (n <= 8) PInt(be(p + 1, n))
          else PInt(be(p + 1 + n - 8, 8)) // 128-bit: low 8 bytes carry the value
        case 0x2 => // real: 2^lo bytes IEEE
          val n = 1 << lo
          if (n == 4) PReal(java.lang.Float.intBitsToFloat(be(p + 1, 4).toInt).toDouble)
          else if (n == 8) PReal(java.lang.Double.longBitsToDouble(be(p + 1, 8)))
          else throw new ParseFailure(s"bplist: real width $n")
        case 0x3 =>
          need(marker == 0x33, s"unknown 0x3 marker $marker")
          PDate(java.lang.Double.longBitsToDouble(be(p + 1, 8)))
        case 0x4 => // data
          val (n, s) = countAndStart()
          need(n >= 0 && s.toLong + n <= t, "data past file") // long form: s+n must not wrap
          PData(java.util.Arrays.copyOfRange(b, s, s + n))
        case 0x5 => // ASCII string
          val (n, s) = countAndStart()
          need(n >= 0 && s.toLong + n <= t, "string past file")
          PString(new String(b, s, n, ISO_8859_1))
        case 0x6 => // UTF-16BE string, n CHARACTERS
          val (n, s) = countAndStart()
          need(n >= 0 && s.toLong + 2L * n <= t, "utf16 string past file")
          PString(new String(b, s, 2 * n, UTF_16BE))
        case 0x8 => // UID: lo+1 bytes
          PInt(be(p + 1, lo + 1))
        case 0xa | 0xc => // array / set: count refs
          val (n, s) = countAndStart()
          need(s + n.toLong * objectRefSize <= t, "array refs past file")
          PArray(Vector.tabulate(n)(i =>
            readObject(be(s + i * objectRefSize, objectRefSize), depth + 1)))
        case 0xd => // dict: count key refs then count value refs
          val (n, s) = countAndStart()
          need(s + 2L * n * objectRefSize <= t, "dict refs past file")
          PDict(Vector.tabulate(n) { i =>
            val k = readObject(be(s + i * objectRefSize, objectRefSize), depth + 1) match {
              case PString(ks) => ks
              case other => throw new ParseFailure(s"bplist: non-string dict key $other")
            }
            (k, readObject(be(s + (n + i) * objectRefSize, objectRefSize), depth + 1))
          })
        case _ => throw new ParseFailure(s"bplist: unknown marker $marker")
      }
    }
    try readObject(topObject, 0)
    catch {
      // belt over the explicit bounds checks: any index that still slips
      // through (string ctor, copyOfRange) classifies, never faults a task
      case e: IndexOutOfBoundsException =>
        throw new ParseFailure(s"bplist: truncated (${e.getMessage})")
      case e: NegativeArraySizeException =>
        throw new ParseFailure(s"bplist: negative size (${e.getMessage})")
    }
  }

  /** Flat dotted-path rendering, one `path: value` line per scalar —
    * deterministic and oracle-expressible. Data payloads render as a
    * length placeholder (their BYTES spawn as children, see
    * [[dataBlobs]]); dates render ISO-8601 from the CF epoch.
    */
  def text(v: PValue): String = {
    val out = Vector.newBuilder[String]
    def scalar(v: PValue): String = v match {
      case PNull => "null"
      case PBool(x) => if (x) "true" else "false"
      case PInt(x) => x.toString
      case PReal(x) => x.toString
      case PDate(s) =>
        java.time.Instant.ofEpochSecond(CfEpochSeconds + s.toLong).toString
      case _ => throw new IllegalStateException("non-scalar")
    }
    def walk(path: String, v: PValue): Unit = v match {
      case PDict(es) => es.foreach { case (k, x) =>
        walk(if (path.isEmpty) k else path + "." + k, x) }
      case PArray(it) => it.zipWithIndex.foreach { case (x, i) => walk(s"$path[$i]", x) }
      case PData(b) => out += s"$path: <data ${b.length}>"
      case PString(s) => out += s"$path: $s"
      case other => out += s"$path: ${scalar(other)}"
    }
    walk("", v)
    out.result().mkString("\n")
  }

  /** Embedded data payloads in document order, with their dotted paths —
    * the plist's spawnable children (an NSData often holds a whole nested
    * document: an image, another plist, a serialized archive).
    */
  def dataBlobs(v: PValue): Vector[(String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    def walk(path: String, v: PValue): Unit = v match {
      case PDict(es) => es.foreach { case (k, x) =>
        walk(if (path.isEmpty) k else path + "." + k, x) }
      case PArray(it) => it.zipWithIndex.foreach { case (x, i) => walk(s"$path[$i]", x) }
      case PData(b) => out += ((path, b))
      case _ => ()
    }
    walk("", v)
    out.result()
  }

  /** Deterministic writer (fixtures): pre-order object table, ASCII
    * strings where possible (UTF-16BE otherwise), minimal ref/offset
    * widths — a real CoreFoundation-shaped file the reader must walk
    * back.
    */
  def build(top: PValue): Array[Byte] = {
    // flatten pre-order; no interning (determinism over compactness)
    val objs = Vector.newBuilder[PValue]
    var count = 0
    def flatten(v: PValue): Int = {
      val idx = count
      objs += v; count += 1
      v match {
        case PArray(items) => items.foreach(flatten)
        case PDict(es) => es.foreach { case (k, _) => flatten(PString(k)) }
          es.foreach { case (_, x) => flatten(x) }
        case _ => ()
      }
      idx
    }
    flatten(top)
    val all = objs.result()
    // child indices mirror the pre-order walk: recompute per container
    val childIdx = scala.collection.mutable.Map[Int, Vector[Int]]()
    var cursor = 0
    def index(v: PValue): Int = {
      val idx = cursor
      cursor += 1
      v match {
        case PArray(items) =>
          childIdx(idx) = items.map(index)
        case PDict(es) =>
          val ks = es.map { case (k, _) => index(PString(k)) }
          val vs = es.map { case (_, x) => index(x) }
          childIdx(idx) = ks ++ vs
        case _ => ()
      }
      idx
    }
    index(top)
    val refSize = if (all.length <= 0xff) 1 else 2
    val out = new java.io.ByteArrayOutputStream()
    out.write("bplist00".getBytes(ISO_8859_1))
    val offsets = new Array[Long](all.length)
    def beBytes(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    def writeCount(hi: Int, n: Int): Unit =
      if (n < 15) out.write((hi << 4) | n)
      else {
        out.write((hi << 4) | 0x0f)
        out.write(0x12) // 4-byte int marker
        out.write(beBytes(n.toLong, 4))
      }
    all.zipWithIndex.foreach { case (v, i) =>
      offsets(i) = out.size().toLong
      v match {
        case PNull => out.write(0x00)
        case PBool(false) => out.write(0x08)
        case PBool(true) => out.write(0x09)
        case PInt(x) =>
          if (x >= 0 && x <= 0xff) { out.write(0x10); out.write(x.toInt) }
          else if (x >= 0 && x <= 0xffff) { out.write(0x11); out.write(beBytes(x, 2)) }
          else if (x >= 0 && x <= 0xffffffffL) { out.write(0x12); out.write(beBytes(x, 4)) }
          else { out.write(0x13); out.write(beBytes(x, 8)) }
        case PReal(x) =>
          out.write(0x23); out.write(beBytes(java.lang.Double.doubleToLongBits(x), 8))
        case PDate(s) =>
          out.write(0x33); out.write(beBytes(java.lang.Double.doubleToLongBits(s), 8))
        case PData(b) =>
          writeCount(0x4, b.length); out.write(b)
        case PString(s) =>
          if (s.forall(_ < 0x80)) {
            writeCount(0x5, s.length); out.write(s.getBytes(ISO_8859_1))
          } else {
            writeCount(0x6, s.length); out.write(s.getBytes(UTF_16BE))
          }
        case PArray(items) =>
          writeCount(0xa, items.length)
          childIdx(i).foreach(c => out.write(beBytes(c.toLong, refSize)))
        case PDict(es) =>
          writeCount(0xd, es.length)
          childIdx(i).foreach(c => out.write(beBytes(c.toLong, refSize)))
      }
    }
    val offsetTableOffset = out.size().toLong
    val offsetIntSize =
      if (offsetTableOffset <= 0xff) 1 else if (offsetTableOffset <= 0xffff) 2 else 4
    offsets.foreach(o => out.write(beBytes(o, offsetIntSize)))
    // trailer: 5 unused + sortVersion, offsetIntSize, objectRefSize,
    // numObjects, topObject, offsetTableOffset
    out.write(new Array[Byte](6))
    out.write(offsetIntSize); out.write(refSize)
    out.write(beBytes(all.length.toLong, 8))
    out.write(beBytes(0L, 8))
    out.write(beBytes(offsetTableOffset, 8))
    out.toByteArray
  }
}
