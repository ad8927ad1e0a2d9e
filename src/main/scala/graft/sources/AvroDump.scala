package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import scala.collection.mutable.ArrayBuffer
import graft.core.ParseFailure
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro Object Container Files as an INGESTION format — the third common
  * corpus-dump shape next to JSONL and parquet (Obj\x01 magic, schema in
  * the header, sync-marked blocks). Same contract as the other dump
  * routes: one child per row, NULL text as an empty child, refused rows
  * counted, malformed bytes classified.
  *
  * The text field is the first string field named `text`/`content`/
  * `body` (union-with-null aware), else the first string field. A row
  * whose text-field value is a non-string union branch throws (no
  * silent `toString` garbage).
  *
  * Memory guard: a [[preflight]] pre-walk validates EVERY declared
  * length in the container framing (metadata values, block sizes)
  * against the actual input before the library decodes anything, and
  * refuses non-null codecs — with the null codec, no declared size can
  * exceed the bytes already in memory, so a crafted header cannot make
  * the decoder allocate past the input (the library's own limit
  * properties latch at class-load and cannot be relied on here). The
  * pre-walk also yields the TOTAL row count from block headers, so rows
  * past the cap are counted without decoding them.
  */
object AvroDump {

  def isAvro(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(0) == 'O' && bytes(1) == 'b' && bytes(2) == 'j' && bytes(3) == 1

  private val TextNames = Seq("text", "content", "body")

  private def isStringType(s: Schema): Boolean = s.getType match {
    case Schema.Type.STRING => true
    case Schema.Type.UNION =>
      s.getTypes.stream().anyMatch(t => t.getType == Schema.Type.STRING)
    case _ => false
  }

  private final class Cur(var i: Int)

  private def vlong(b: Array[Byte], c: Cur): Long = {
    var shift = 0
    var acc = 0L
    var more = true
    while (more) {
      if (c.i >= b.length) throw new ParseFailure("avro varint past input end")
      val x = b(c.i) & 0xff
      c.i += 1
      acc |= (x & 0x7fL) << shift
      shift += 7
      if (shift > 70) throw new ParseFailure("avro varint longer than 10 bytes")
      more = (x & 0x80) != 0
    }
    (acc >>> 1) ^ -(acc & 1) // zigzag
  }

  /** Skip (or read) a length-prefixed byte string, bounds-validated. */
  private def byteString(b: Array[Byte], c: Cur, keep: Boolean): Array[Byte] = {
    val len = vlong(b, c)
    if (len < 0 || len > b.length - c.i)
      throw new ParseFailure(s"avro declared length $len past input end")
    val out = if (keep) java.util.Arrays.copyOfRange(b, c.i, c.i + len.toInt) else null
    c.i += len.toInt
    out
  }

  /** Validate the container framing end-to-end BEFORE any library decode
    * (see the object scaladoc) and return the declared total row count.
    */
  private def preflight(bytes: Array[Byte]): Long = {
    if (!isAvro(bytes)) throw new ParseFailure("not an avro container: bad Obj1 magic")
    val c = new Cur(4)
    var codec = "null"
    // header metadata map: (count, entries)* terminated by 0; a negative
    // count is followed by the byte size of that map block
    var n = vlong(bytes, c)
    while (n != 0) {
      val entries = if (n < 0) { vlong(bytes, c): Unit; -n } else n
      if (entries > 1000) throw new ParseFailure("avro metadata map implausibly large")
      var i = 0L
      while (i < entries) {
        val key = new String(byteString(bytes, c, keep = true), java.nio.charset.StandardCharsets.UTF_8)
        val value = byteString(bytes, c, keep = key == "avro.codec")
        if (key == "avro.codec")
          codec = new String(value, java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
      n = vlong(bytes, c)
    }
    if (c.i + 16 > bytes.length) throw new ParseFailure("avro header sync truncated")
    c.i += 16
    if (codec != "null")
      throw new ParseFailure(
        s"avro codec '$codec' unsupported — null codec only (compressed blocks have no declared decompressed size to guard)")
    var total = 0L
    while (c.i < bytes.length) {
      val rows = vlong(bytes, c)
      val size = vlong(bytes, c)
      if (rows < 0 || size < 0 || size > bytes.length - c.i)
        throw new ParseFailure("avro block declares an impossible size")
      total += rows
      c.i += size.toInt
      if (c.i + 16 > bytes.length) throw new ParseFailure("avro block sync truncated")
      c.i += 16
    }
    total
  }

  /** The per-row text values (capped at `maxRows`) plus the TOTAL row
    * count from the validated block headers (rows past the cap are never
    * decoded — the count is framing metadata).
    */
  def textRows(bytes: Array[Byte], maxRows: Int, maxRowBytes: Int): (Vector[String], Long) =
    try {
      val total = preflight(bytes)
      val stream = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
      try {
        val schema = stream.getSchema
        if (schema.getType != Schema.Type.RECORD)
          throw new ParseFailure("avro dump is not a record stream")
        val fields = schema.getFields
        var field: Schema.Field = null
        TextNames.foreach { n =>
          if (field == null)
            fields.forEach { f =>
              if (field == null && f.name.equalsIgnoreCase(n) && isStringType(f.schema())) field = f
            }
        }
        if (field == null)
          fields.forEach { f => if (field == null && isStringType(f.schema())) field = f }
        if (field == null) throw new ParseFailure("avro dump has no string field")
        val pos = field.pos() // resolved once: no per-row name lookup
        val out = ArrayBuffer.empty[String]
        var reuse: GenericRecord = null
        while (out.length < maxRows && stream.hasNext) {
          reuse = stream.next(reuse)
          reuse.get(pos) match {
            case null => out += ""
            case cs: CharSequence =>
              val txt = cs.toString
              out += (if (txt.length > maxRowBytes) txt.substring(0, maxRowBytes) else txt)
            case other =>
              // a non-string union branch in the text field is malformed
              // for this route — refuse, never silent toString garbage
              throw new ParseFailure(
                s"avro text field carries a non-string branch (${other.getClass.getSimpleName})")
          }
        }
        (out.toVector, total)
      } finally stream.close()
    } catch {
      case pf: ParseFailure => throw pf
      // DataFileStream surfaces corruption as IOExceptions and
      // AvroRuntimeException — all are THIS document's corruption, never
      // a task failure
      case e @ (_: java.io.IOException | _: RuntimeException) =>
        throw new ParseFailure(s"corrupt avro dump: ${e.getMessage}")
    }

  // ---------------------------------------------------------------- writer

  private val DumpSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"dump","fields":[
      |{"name":"text","type":["null","string"],"default":null}]}""".stripMargin)

  /** Deterministic container file: fixed sync marker, null codec. */
  def build(texts: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](DumpSchema))
    val sync = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte) // fixed: byte-deterministic files
    writer.create(DumpSchema, bos, sync)
    try {
      texts.foreach { t =>
        val rec = new org.apache.avro.generic.GenericData.Record(DumpSchema)
        rec.put("text", t)
        writer.append(rec)
      }
    } finally writer.close()
    bos.toByteArray
  }
}
