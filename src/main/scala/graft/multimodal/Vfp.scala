package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Video near-duplicate fingerprinting over REAL container walks — the
  * third member of the multimodal dedup tier ([[Phash]] images, [[Afp]]
  * audio). A web corpus carries the same clip re-cut (different
  * trailing frames), re-scaled, and re-encoded; none share bytes.
  *
  * Signature: the keyframe perceptual hash — walk the RIFF/AVI container
  * (the guarded [[Media.aviFrameChunks]] path), decode the FIRST video
  * frame, and take its [[Phash.dHash]]. First-frame hashing is the
  * standard cheap tier of shot-based video fingerprinting (the
  * keyframe-signature family, e.g. Coskun 2006's hash-per-keyframe):
  * invariant to frame-count changes (re-cuts that keep the opening
  * shot), frame rescale, and JPEG re-encode. Clustering reuses
  * [[Phash.clusterHashes]]; only (doc_id, hash) ever shuffles, and the
  * container walk reads exactly one frame payload — a real decoder would
  * not even demux the rest.
  */
object Vfp {

  /** 64-bit keyframe hash: first '00dc' payload, ImageIO-decoded, dHashed. */
  def keyframeHash(bytes: Array[Byte]): Long = {
    val frames = Media.aviFrameChunks(bytes, maxFrames = 1)
    require(frames.nonEmpty, "vfp: AVI carries no video frames")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames.head))
    if (img == null) throw new graft.core.ParseFailure("vfp: keyframe is not a decodable image")
    Phash.dHash(img)
  }

  /** (doc_id, hash) over real AVI bytes — map-side only. */
  def hashes(spark: SparkSession, clips: Dataset[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    clips.map { case (id, bytes) => (id, keyframeHash(bytes)) }
      .toDF("doc_id", "hash")
  }

  /** Near-duplicate video clusters — same output contract as
    * [[Phash.clusters]]: (doc_id, hash_hi, hash_lo, rep_id, n_cluster).
    */
  def clusters(spark: SparkSession, clips: Dataset[(Long, Array[Byte])],
               maxHamming: Int = 3, bucketCap: Int = 10000): DataFrame =
    Phash.clusterHashes(spark, hashes(spark, clips).localCheckpoint(false),
      maxHamming, bucketCap)

  // ------------------------------------------------------------ fixtures

  /** A REAL AVI/MJPEG clip opening on group `g`'s pattern keyframe.
    * Variants: 0 = 2 frames at 16px blocks; 1 = 5 frames (the re-cut
    * twin — extra trailing footage); 2 = 8px blocks (the rescale twin);
    * 3 = retouched keyframe (exactly bit(0,0) flips, Hamming 1). Filler
    * frames are solid JPEGs whose color varies by variant so the clips
    * are byte-disjoint beyond the keyframe too.
    */
  def fixtureBytes(g: Int, variant: Int): Array[Byte] = {
    val block = if (variant == 2) 8 else 16
    val w = 9 * block; val h = 8 * block
    val key = Phash.encodePattern(g, block, flip = variant == 3, format = "jpg")
    val nFiller = if (variant == 1) 4 else 1
    val fillers = Seq.tabulate(nFiller)(i =>
      Media.encodeSolid(w, h, 0x101010 * (i + 1) + variant, "jpg"))
    Media.encodeAviMjpegJpegs(w, h, key +: fillers)
  }
}
