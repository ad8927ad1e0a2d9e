package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-level batches.
  *
  * ALL THREE modalities decode REAL container bytes with pure JDK:
  * images via `javax.imageio` (PNG/GIF/BMP/JPEG ship with the JDK —
  * [[decodeImage]]/[[resizeImage]]), audio via `javax.sound.sampled`
  * (RIFF/WAVE — [[decodeAudio]]), and video via a RIFF/AVI chunk walker
  * plus ImageIO MJPEG frame decode ([[decodeAviMjpeg]]). Each is
  * oracle-checked by synthesizing real containers whose parameters are a
  * pure function of doc_id, so DuckDB recomputes the expected decode
  * output without any codec. The header-byte-arithmetic STUB remains only
  * as the generic-binary fallback (decodeStub / q_media_meta).
  */
object Media {

  final case class ImageMeta(
      doc_id: Long,
      width: Long,
      height: Long,
      r: Long, g: Long, b: Long,      // top-left pixel channels
      thumb_w: Long, thumb_h: Long,   // real half-size resize output dims
      thumb_r: Long                   // resized top-left red channel
  )

  /** Synthesize a REAL solid-color image in the given ImageIO format —
    * the shared fixture generator for the real-decode paths.
    */
  def encodeSolid(width: Int, height: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(new java.awt.Color(rgb))
    gfx.fillRect(0, 0, width, height)
    gfx.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] =
    encodeSolid(width, height, rgb, "png")

  /** REAL image decode (JDK ImageIO): dimensions + top-left pixel. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    (img.getWidth, img.getHeight, img.getRGB(0, 0) & 0xffffff)
  }

  /** REAL resize (Graphics2D scaled draw), returning the new dims and the
    * resized top-left pixel.
    */
  def resizeImage(bytes: Array[Byte], factor: Int = 2): (Int, Int, Int) = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = math.max(1, src.getWidth / factor)
    val h = math.max(1, src.getHeight / factor)
    val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = dst.createGraphics()
    gfx.drawImage(src, 0, 0, w, h, null)
    gfx.dispose()
    (w, h, dst.getRGB(0, 0) & 0xffffff)
  }

  /** Synthesize a REAL RIFF/WAVE file (PCM 16-bit mono) — fixture generator
    * for the real audio-decode path.
    */
  def encodeWav(sampleRate: Int, nSamples: Int, amplitude: Short): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { bb.putShort(amplitude); i += 1 }
    bb.array()
  }

  /** REAL audio decode (JDK javax.sound.sampled — WAV/AIFF/AU built in):
    * (sampleRateHz, channels, bitsPerSample, frameCount, firstSample).
    */
  def decodeAudio(bytes: Array[Byte]): (Int, Int, Int, Long, Int) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val f = in.getFormat
      val frames = in.getFrameLength
      val buf = new Array[Byte](2)
      val read = in.read(buf)
      val first =
        if (read == 2) ((buf(1) << 8) | (buf(0) & 0xff)) // little-endian s16
        else 0
      (f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits, frames, first)
    } finally in.close()
  }

  /** Real-audio pipeline over synthesized REAL WAV bytes: rate/length/
    * amplitude derive from doc_id, and the decode must recover them from
    * the RIFF container for the oracle to match.
    */
  def decodeAudios(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val rate = 8000 + (id % 4).toInt * 4000
        val n = 100 + (id % 50).toInt
        val amp = (id % 1000).toShort
        val wav = encodeWav(rate, n, amp)
        val (r, ch, bits, frames, first) = decodeAudio(wav)
        // duration in microseconds: integer-exact for these rates
        val durUs = frames * 1000000L / r
        (id, r.toLong, ch.toLong, bits.toLong, frames, first.toLong, durUs)
      })
      .toDF("doc_id", "sample_rate", "channels", "bits", "n_frames", "first_sample", "dur_us")
  }

  // ------------------------------------------------------------- video ----

  /** Synthesize a REAL AVI (RIFF) container with MJPEG frames — minimal
    * spec-conformant layout: RIFF('AVI ') { LIST('hdrl'){ 'avih' main
    * header carrying frame count + dims } LIST('movi'){ '00dc' JPEG
    * chunks } }. Frames are solid-color JPEGs encoded by ImageIO.
    */
  def encodeAviMjpeg(width: Int, height: Int, frameRgbs: Seq[Int]): Array[Byte] =
    encodeAviMjpegJpegs(width, height,
      frameRgbs.map(rgb => encodeSolid(width, height, rgb, "jpg")))

  /** Same container, caller-supplied JPEG frame payloads (the [[Vfp]]
    * fixtures wrap pattern keyframes).
    */
  def encodeAviMjpegJpegs(width: Int, height: Int, frameJpegs: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc.getBytes("US-ASCII")).putInt(body.length).put(body)
      if ((body.length & 1) == 1) bb.put(0.toByte) // RIFF chunks pad to even
      bb.array()
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = bodies.flatten.toArray
      val bb = java.nio.ByteBuffer.allocate(12 + inner.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + inner.length)
        .put(listType.getBytes("US-ASCII")).put(inner)
      bb.array()
    }
    val avih = { // MainAVIHeader: the fields a reader needs, rest zero
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(33333) // dwMicroSecPerFrame (30fps)
      bb.putInt(0).putInt(0).putInt(0)
      bb.putInt(frameJpegs.length) // dwTotalFrames
      bb.putInt(0).putInt(1).putInt(0)
      bb.putInt(width).putInt(height)
      bb.array()
    }
    val frames = frameJpegs.map(chunk("00dc", _))
    val inner = list("hdrl", Seq(chunk("avih", avih))) ++ list("movi", frames)
    val bb = java.nio.ByteBuffer.allocate(12 + inner.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + inner.length)
      .put("AVI ".getBytes("US-ASCII")).put(inner)
    bb.array()
  }

  /** REAL AVI/MJPEG parse: walk the RIFF tree, read the avih main header
    * (declared frames + dims), collect '00dc' frame chunks, and ImageIO-
    * decode the first frame's JPEG to cross-check the header dims against
    * actual pixel data. Returns (declaredFrames, width, height,
    * parsedChunks, firstFrameW, firstFrameH).
    */
  def decodeAviMjpeg(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12, "truncated RIFF header")
    require(fourcc() == "RIFF", "not a RIFF file")
    bb.getInt // riff size
    require(fourcc() == "AVI ", "not an AVI")
    var declaredFrames = 0; var w = 0; var h = 0
    var chunks = 0; var firstFrame: Array[Byte] = null
    // malformed-input guards: a lying/negative chunk size must neither
    // spin the walk (next <= position), overrun the buffer, nor allocate
    // from attacker-controlled lengths; list nesting is depth-capped
    def walk(end: Int, depth: Int): Unit = {
      if (depth > 64) throw new graft.core.ParseFailure("RIFF list nesting > 64")
      while (bb.position() + 8 <= end) {
        val id = fourcc(); val rawSize = bb.getInt
        if (rawSize < 0 || rawSize > end - bb.position())
          throw new graft.core.ParseFailure(s"RIFF chunk '$id' size $rawSize out of bounds")
        val next = bb.position() + rawSize + (rawSize & 1)
        id match {
          case "LIST" =>
            val contentEnd = bb.position() + rawSize // children end (excl. pad)
            if (rawSize < 4) throw new graft.core.ParseFailure("RIFF LIST too small")
            fourcc() // list type — descend regardless
            walk(contentEnd, depth + 1)
          case "avih" =>
            if (rawSize < 40) throw new graft.core.ParseFailure("avih too small")
            val p = bb.position()
            bb.position(p + 16); declaredFrames = bb.getInt
            bb.position(p + 32); w = bb.getInt; h = bb.getInt
          case "00dc" =>
            chunks += 1
            if (firstFrame == null) {
              firstFrame = new Array[Byte](rawSize); bb.get(firstFrame)
            }
          case _ => ()
        }
        bb.position(math.min(math.max(next, bb.position()), end))
      }
    }
    walk(bytes.length, 0)
    val (fw, fh) =
      if (firstFrame == null) (0, 0)
      else {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(firstFrame))
        if (img == null) throw new graft.core.ParseFailure("first frame is not a decodable image")
        (img.getWidth, img.getHeight)
      }
    (declaredFrames, w, h, chunks, fw, fh)
  }

  /** The first `maxFrames` '00dc' frame payloads, via the same guarded
    * RIFF walk as [[decodeAviMjpeg]] (lying sizes classify, nesting
    * capped). [[Vfp]] keyframe hashing reads exactly one.
    */
  def aviFrameChunks(bytes: Array[Byte], maxFrames: Int): Vector[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12, "truncated RIFF header")
    if (fourcc() != "RIFF") throw new graft.core.ParseFailure("not a RIFF file")
    bb.getInt
    if (fourcc() != "AVI ") throw new graft.core.ParseFailure("not an AVI")
    val out = Vector.newBuilder[Array[Byte]]
    var n = 0
    def walk(end: Int, depth: Int): Unit = {
      if (depth > 64) throw new graft.core.ParseFailure("RIFF list nesting > 64")
      while (bb.position() + 8 <= end && n < maxFrames) {
        val id = fourcc(); val rawSize = bb.getInt
        if (rawSize < 0 || rawSize > end - bb.position())
          throw new graft.core.ParseFailure(s"RIFF chunk '$id' size $rawSize out of bounds")
        val next = bb.position() + rawSize + (rawSize & 1)
        id match {
          case "LIST" =>
            val contentEnd = bb.position() + rawSize
            if (rawSize < 4) throw new graft.core.ParseFailure("RIFF LIST too small")
            fourcc()
            walk(contentEnd, depth + 1)
          case "00dc" =>
            val f = new Array[Byte](rawSize); bb.get(f)
            out += f; n += 1
          case _ => ()
        }
        bb.position(math.min(math.max(next, bb.position()), end))
      }
    }
    walk(bytes.length, 0)
    out.result()
  }

  /** Real-video pipeline: REAL AVI/MJPEG containers (params = f(doc_id))
    * parsed and first-frame-decoded; the oracle recomputes the expected
    * values arithmetically. %7 sample bounds the JPEG-encode fixture cost.
    */
  def decodeVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id").filter(col("doc_id") % 7 === 0).as[Long]
      .mapPartitions(_.map { id =>
        val w = 32 + (id % 8).toInt * 4
        val h = 24 + (id % 5).toInt * 4
        val n = 2 + (id % 4).toInt
        val avi = encodeAviMjpeg(w, h, Seq.tabulate(n)(f => (f * 37 + id % 200).toInt))
        val (df, dw, dh, chunks, fw, fh) = decodeAviMjpeg(avi)
        (id, df.toLong, dw.toLong, dh.toLong, chunks.toLong, fw.toLong, fh.toLong)
      })
      .toDF("doc_id", "n_frames", "width", "height", "n_chunks", "frame_w", "frame_h")
  }

  /** Real-decode pipeline over synthesized REAL PNG bytes: encode (fixture)
    * then decode + resize (the operators under test) per partition batch.
    */
  def decodeImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // %5 sample: the dominant cost is ImageIO PNG ENCODE of the fixture
    // bytes, not the decode under test — a fifth of the corpus keeps the
    // bench honest without benchmarking the fixture generator
    docs.select("doc_id").filter(col("doc_id") % 5 === 0).as[Long]
      .mapPartitions { it =>
        // per-batch codec init would go here (ImageIO is stateless)
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 16 + (id % 11).toInt
          val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 13) % 256)).toInt
          val png = encodePng(w, h, rgb)
          val (dw, dh, pix) = decodeImage(png)
          val (tw, th, tpix) = resizeImage(png)
          ImageMeta(id, dw.toLong, dh.toLong,
            (pix >> 16 & 0xff).toLong, (pix >> 8 & 0xff).toLong, (pix & 0xff).toLong,
            tw.toLong, th.toLong, (tpix >> 16 & 0xff).toLong)
        }
      }
      .toDF()
  }

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      magic: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      thumb_w: Long, // resize stub: bounded quarter-size thumbnail dims
      thumb_h: Long
  )

  /** STUB decoder: derives fake image metadata from header bytes.
    * Replace with a real decode (e.g. javax.imageio / ffmpeg bindings) on a
    * real cluster; the signature (bytes => meta) is the contract.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    val w = 64L + (b0 % 8) * 16
    val h = 64L + (b1 % 8) * 16
    MediaMeta(
      doc_id = docId,
      n_bytes = bytes.length.toLong,
      magic = b0.toLong,
      width = w,
      height = h,
      n_frames = 1L + bytes.length / 64,
      thumb_w = math.max(16L, w / 4), // resize stub (real impl: scaled decode)
      thumb_h = math.max(16L, h / 4))
  }

  /** Build a binary media column from the documents table (UTF-8 payload
    * stands in for image bytes) and run the batched decode. The
    * mapPartitions boundary is where a real decoder would amortize per-batch
    * init (model load, codec context) — the reference's per-pool parser
    * reuse (`DocumentConsumer.java`), stage-level instead of thread-level.
    */
  def decodeAll(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-batch decoder init would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
  }

  /** Frame sampling stub: every k-th 64-byte "frame" offset. Exercises the
    * explode/flatMap shape a video pipeline needs.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, everyK: Int = 4): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = 1 + bytes.length / 64
        Iterator.range(0, nFrames, everyK).map { f =>
          val off = f * 64
          val b = if (off < bytes.length) bytes(off) & 0xff else 0
          (id, f.toLong, off.toLong, b.toLong)
        }
      }
      .toDF("doc_id", "frame_idx", "byte_offset", "frame_byte")
  }
}
