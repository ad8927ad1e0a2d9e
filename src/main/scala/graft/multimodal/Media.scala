package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-level batches.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (header-byte arithmetic standing in for
  * a real decoder); everything Spark-side — binary column construction,
  * schema, batched mapPartitions shape, partitioning — is real and tested.
  * On a cluster the stub body is the only thing a real decoder replaces.
  */
object Media {

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
