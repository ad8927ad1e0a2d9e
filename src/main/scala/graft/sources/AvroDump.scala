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
  * `body` (union-with-null aware), else the first string field.
  *
  * Value-size guard: Avro has no footer with declared decompressed
  * sizes, so the per-VALUE ceiling uses the library's own decoder limit
  * (`org.apache.avro.limits.string.maxLength`, set process-wide to
  * 64 MiB here if the deployment has not set it) — an over-limit string
  * throws inside the decoder BEFORE materializing and classifies below.
  */
object AvroDump {

  locally {
    val key = "org.apache.avro.limits.string.maxLength"
    if (System.getProperty(key) == null) System.setProperty(key, (64 << 20).toString): Unit
  }

  def isAvro(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(0) == 'O' && bytes(1) == 'b' && bytes(2) == 'j' && bytes(3) == 1

  private val TextNames = Seq("text", "content", "body")

  private def isStringType(s: Schema): Boolean = s.getType match {
    case Schema.Type.STRING => true
    case Schema.Type.UNION =>
      s.getTypes.stream().anyMatch(t => t.getType == Schema.Type.STRING)
    case _ => false
  }

  /** The per-row text values (capped at `maxRows`) plus the TOTAL row
    * count (rows past the cap are decode-counted, not kept, so the
    * caller can report them as counted refusals).
    */
  def textRows(bytes: Array[Byte], maxRows: Int, maxRowBytes: Int): (Vector[String], Long) =
    try {
      val stream = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
      try {
        val schema = stream.getSchema
        if (schema.getType != Schema.Type.RECORD)
          throw new ParseFailure("avro dump is not a record stream")
        val fields = schema.getFields
        var field: String = null
        TextNames.foreach { n =>
          if (field == null)
            fields.forEach { f =>
              if (field == null && f.name.equalsIgnoreCase(n) && isStringType(f.schema())) field = f.name
            }
        }
        if (field == null)
          fields.forEach { f => if (field == null && isStringType(f.schema())) field = f.name }
        if (field == null) throw new ParseFailure("avro dump has no string field")
        val out = ArrayBuffer.empty[String]
        var total = 0L
        while (stream.hasNext) {
          val rec = stream.next()
          total += 1
          if (out.length < maxRows) {
            val v = rec.get(field)
            val txt = if (v == null) "" else v.toString
            out += (if (txt.length > maxRowBytes) txt.substring(0, maxRowBytes) else txt)
          }
        }
        (out.toVector, total)
      } finally stream.close()
    } catch {
      case pf: ParseFailure => throw pf
      // DataFileStream surfaces corruption as IOExceptions and
      // AvroRuntimeException (incl. the decoder size limits) — all are
      // THIS document's corruption, never a task failure
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
