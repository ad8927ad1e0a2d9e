package graft.sources

import scala.collection.mutable.ArrayBuffer
import graft.core.ParseFailure
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.{ColumnIOFactory, DelegatingSeekableInputStream,
  InputFile, OutputFile, PositionOutputStream, SeekableInputStream}
import org.apache.parquet.schema.{MessageTypeParser, PrimitiveType}

/** Parquet corpus dumps as an INGESTION format: training text ships as
  * .parquet at least as often as .jsonl, and a dump dropped into the
  * document walk should explode one child per row exactly like a JSONL
  * dump — the reference-era equivalent is Tika treating unknown
  * container formats via dedicated parsers, re-expressed here over
  * parquet-java, which already rides the Spark classpath. (This is the
  * FILE-IN-THE-WALK route; tables the engine itself manages are read
  * natively by Spark as tables, never through this path.)
  *
  * The text column is the first BINARY/STRING field named `text`,
  * `content`, or `body` (the common dump schemas), else the first
  * string field. Rows with a NULL text value yield "" (an empty child,
  * reason=empty-file — the JSONL convention). Malformed bytes throw
  * ParseFailure — classified upstream, never a task failure.
  */
object ParquetDump {

  /** PAR1 magic at BOTH ends (the footer magic is what distinguishes a
    * real file from a text that merely starts with "PAR1").
    */
  def isParquet(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'P' && bytes(1) == 'A' && bytes(2) == 'R' && bytes(3) == '1' &&
      bytes(bytes.length - 4) == 'P' && bytes(bytes.length - 3) == 'A' &&
      bytes(bytes.length - 2) == 'R' && bytes(bytes.length - 1) == '1'

  private val TextNames = Seq("text", "content", "body")

  /** In-memory InputFile over a byte array (no filesystem round trip). */
  private final class BytesInputFile(bytes: Array[Byte]) extends InputFile {
    override def getLength: Long = bytes.length.toLong
    override def newStream(): SeekableInputStream = {
      val bis = new java.io.ByteArrayInputStream(bytes)
      new DelegatingSeekableInputStream(bis) {
        private var pos = 0L
        override def getPos: Long = pos
        override def seek(newPos: Long): Unit = {
          bis.reset(); bis.skip(newPos): Unit; pos = newPos
        }
        override def read(): Int = { val r = bis.read(); if (r >= 0) pos += 1; r }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          val r = bis.read(b, off, len); if (r > 0) pos += r; r
        }
      }
    }
  }

  /** Declared-decompressed-size ceiling: the footer's per-row-group
    * total_byte_size is UNCOMPRESSED metadata, checked BEFORE any page
    * inflates — the same refuse-before-materialize posture as the
    * archive declared-size guards (a small compressed file claiming
    * gigabytes classifies instead of exhausting the executor).
    */
  private val MaxDeclaredBytes: Long = 256L << 20

  /** The per-row text values (file order, capped at `maxRows`) plus the
    * file's DECLARED total row count, so the caller can count refused
    * rows instead of silently truncating.
    */
  def textRows(bytes: Array[Byte], maxRows: Int, maxRowBytes: Int): (Vector[String], Long) =
    try {
      val reader = ParquetFileReader.open(new BytesInputFile(bytes))
      try {
        val footer = reader.getFooter
        var declared = 0L
        footer.getBlocks.forEach { b =>
          declared += b.getTotalByteSize
          // UNCOMPRESSED pages only (the avro route's rationale): footer
          // sizes are attacker-controlled metadata, and compressed PAGE
          // headers can declare decompressed sizes the footer never
          // admits to — with no codec, every allocation is bounded by
          // bytes already in memory
          b.getColumns.forEach { c =>
            if (c.getCodec != org.apache.parquet.hadoop.metadata.CompressionCodecName.UNCOMPRESSED)
              throw new ParseFailure(
                s"parquet dump codec ${c.getCodec} unsupported — uncompressed dumps only (compressed page sizes are unguardable declared metadata)")
          }
        }
        if (declared > MaxDeclaredBytes)
          throw new ParseFailure(
            s"parquet dump declares $declared bytes, over the ${MaxDeclaredBytes} cap")
        val schema = footer.getFileMetaData.getSchema
        val fields = schema.getFields
        // STRING-annotated binary first (a bare binary named `content`
        // may be image bytes); fall back to any binary only when the
        // file carries NO annotated string column at all (pre-logical-
        // type writers)
        def isBinary(i: Int): Boolean = {
          val f = fields.get(i)
          f.isPrimitive &&
            f.asPrimitiveType().getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.BINARY
        }
        def isAnnotatedString(i: Int): Boolean = isBinary(i) && {
          val ann = fields.get(i).getLogicalTypeAnnotation
          ann != null && ann == org.apache.parquet.schema.LogicalTypeAnnotation.stringType()
        }
        val anyAnnotated = (0 until fields.size).exists(isAnnotatedString)
        def eligible(i: Int): Boolean = if (anyAnnotated) isAnnotatedString(i) else isBinary(i)
        var textIdx = -1
        TextNames.foreach { n =>
          if (textIdx < 0)
            (0 until fields.size).foreach { i =>
              if (textIdx < 0 && fields.get(i).getName.equalsIgnoreCase(n) && eligible(i))
                textIdx = i
            }
        }
        if (textIdx < 0)
          (0 until fields.size).foreach { i => if (textIdx < 0 && eligible(i)) textIdx = i }
        if (textIdx < 0) throw new ParseFailure("parquet dump has no string column")
        // project to JUST the text column: other column chunks (embedding
        // lists, metadata structs) are never decoded
        val projection = new org.apache.parquet.schema.MessageType(
          schema.getName, fields.get(textIdx))
        reader.setRequestedSchema(projection)
        val total = reader.getRecordCount
        val out = ArrayBuffer.empty[String]
        var pages = reader.readNextRowGroup()
        val io = new ColumnIOFactory().getColumnIO(projection)
        while (pages != null && out.length < maxRows) {
          val recReader = io.getRecordReader(pages, new GroupRecordConverter(projection))
          var i = 0L
          val n = pages.getRowCount
          while (i < n && out.length < maxRows) {
            val g: Group = recReader.read()
            // the projection holds exactly one field: index 0, resolved
            // statically — no per-row name lookup
            val txt =
              if (g == null || g.getFieldRepetitionCount(0) == 0) ""
              else g.getString(0, 0)
            out += (if (txt.length > maxRowBytes) txt.substring(0, maxRowBytes) else txt)
            i += 1
          }
          pages = reader.readNextRowGroup()
        }
        (out.toVector, total)
      } finally reader.close()
    } catch {
      case pf: ParseFailure => throw pf
      // parquet-java surfaces malformed footers/pages as IOExceptions and
      // assorted RuntimeExceptions; all of them are THIS document's
      // corruption, never a task failure
      case e @ (_: java.io.IOException | _: RuntimeException) =>
        throw new ParseFailure(s"corrupt parquet dump: ${e.getMessage}")
    }

  // ---------------------------------------------------------------- writer

  private final class BytesOutputFile(bos: java.io.ByteArrayOutputStream) extends OutputFile {
    override def create(blockSizeHint: Long): PositionOutputStream = stream
    override def createOrOverwrite(blockSizeHint: Long): PositionOutputStream = stream
    override def supportsBlockSize(): Boolean = false
    override def defaultBlockSize(): Long = 0L
    private def stream: PositionOutputStream = new PositionOutputStream {
      private var pos = 0L
      override def getPos: Long = pos
      override def write(b: Int): Unit = { bos.write(b); pos += 1 }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        bos.write(b, off, len); pos += len
      }
    }
  }

  /** A deterministic one-string-column dump for fixtures and the oracle
    * (fixed schema, one row group, no compression: row ORDER is the only
    * thing child identity depends on).
    */
  private val BuildConf = new org.apache.hadoop.conf.Configuration(false)
  private val SchemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.parquet.schema.MessageType]()

  def build(texts: Seq[String], column: String = "text",
            codec: org.apache.parquet.hadoop.metadata.CompressionCodecName =
              org.apache.parquet.hadoop.metadata.CompressionCodecName.UNCOMPRESSED): Array[Byte] = {
    val schema = SchemaMemo.computeIfAbsent(column, c =>
      MessageTypeParser.parseMessageType(s"message dump { optional binary $c (STRING); }"))
    val bos = new java.io.ByteArrayOutputStream()
    val conf = BuildConf
    val writer = ExampleParquetWriter.builder(new BytesOutputFile(bos))
      .withType(schema)
      .withConf(conf)
      .withCompressionCodec(codec)
      .build()
    try {
      val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      texts.foreach { t =>
        val g = factory.newGroup()
        if (t != null) g.append(column, t): Unit
        writer.write(g)
      }
    } finally writer.close()
    bos.toByteArray
  }
}
