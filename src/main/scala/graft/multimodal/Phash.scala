package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual-hash near-duplicate detection over REAL decoded images —
  * the multimodal twin of the text MinHash/SimHash tier.
  *
  * The reference treats images as opaque pass-through media (media spans
  * keep their `media_ref`, `extractor/EmbedLinker.java:36` — the ancestor
  * of our media passthrough), so image-level dedup is an ENGINE addition
  * for the training-data pipeline: a web-scale corpus carries the same
  * image re-encoded (PNG vs JPEG), rescaled, and slightly retouched, and
  * none of those variants share bytes, so `sha2(media_bytes)` exact dedup
  * misses all of them.
  *
  * Algorithm: the difference hash ("dHash", Krawetz 2013 "Kinds of Like
  * That", the public aHash/dHash/pHash family) — area-average the decoded
  * pixels to a 9x8 grayscale grid and emit one bit per horizontally
  * adjacent cell pair (right brighter than left), giving a 64-bit
  * signature that is invariant to scale and re-encoding and moves ~1 bit
  * per local retouch. Candidate generation then mirrors the text-side LSH
  * discipline exactly ([[graft.operators.Dedup.minhashPairs]]): 4 bands of
  * 16 bits, banded bucket join with the BoundedMinIds per-bucket cap (hot
  * buckets — e.g. near-solid thumbnails at web scale — degrade to a
  * bounded candidate set, observably, never quadratically), Hamming
  * verification via codegen'd `bit_count(xor)`, and connected components
  * for the cluster labels.
  *
  * Scale shape: one image decode per row map-side (embarrassingly
  * parallel, the dominant cost, never shuffled); everything that moves in
  * a shuffle after that is (doc_id, 64-bit hash) — 16 bytes/row, the same
  * "signatures not payloads" rule the MinHash tier follows. The hash
  * frame is localCheckpoint'd once so the decode pass runs exactly once
  * (bands + both verify sides + the final projection all read it).
  */
object Phash {

  /** Largest image the hasher accepts: keeps the exact integer
    * cross-multiplied mean comparison (sum * count) inside Long range
    * (255 * (8192*8192)^2 / grid ~ 2^60) and refuses decompression-bomb
    * dimensions the way the embed size guard refuses declared sizes.
    */
  val MaxDim = 8192

  /** 64-bit dHash over a decoded image: integer area-average to a 9x8
    * grayscale grid (ITU-R 601 luma, 299/587/114 per mille), bit r*8+c =
    * cell(r,c+1) brighter than cell(r,c). Cell means are compared by
    * exact cross-multiplication (sumR*cntL > sumL*cntR) — no float, no
    * rounding ambiguity, so the Spark result is bit-reproducible and
    * oracle-checkable.
    */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    require(w >= 9 && h >= 8, s"phash: image ${w}x$h below the 9x8 grid")
    require(w <= MaxDim && h <= MaxDim, s"phash: image ${w}x$h over $MaxDim")
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8; val y1 = (r + 1) * h / 8
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9; val x1 = (c + 1) * w / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        sums(r)(c) = s
        cnts(r)(c) = (x1 - x0).toLong * (y1 - y0).toLong
        c += 1
      }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (sums(r)(c + 1) * cnts(r)(c) > sums(r)(c) * cnts(r)(c + 1))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** (doc_id, hash) over real bytes: decode (ImageIO — the pure-JDK path
    * [[Media]] established) then [[dHash]]. Map-side only.
    */
  def hashes(spark: SparkSession, imgs: Dataset[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    imgs.map { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"phash: undecodable image bytes for doc $id")
      (id, dHash(img))
    }.toDF("doc_id", "hash")
  }

  /** Near-duplicate clusters: banded-LSH candidates -> Hamming verify ->
    * connected components. Output one row per image:
    * (doc_id, hash_hi, hash_lo, rep_id, n_cluster) — the hash split into
    * two unsigned 32-bit halves so both engines compare sign-free
    * integers, rep = smallest doc_id reachable within `maxHamming`,
    * n_cluster = that component's size (1 for singletons).
    */
  def clusters(spark: SparkSession, imgs: Dataset[(Long, Array[Byte])],
               maxHamming: Int = 3, bucketCap: Int = 10000): DataFrame =
    // the hash frame is narrow (16 bytes/row) and read more than once
    // below: checkpoint so the image decode map runs exactly once
    clusterHashes(spark, hashes(spark, imgs).localCheckpoint(false), maxHamming, bucketCap)

  /** The signature-agnostic clustering stage: any (doc_id, 64-bit hash)
    * frame — image dHash, audio energy contour ([[Afp]]), … — through the
    * banded-LSH / Hamming-verify / connected-components pipeline.
    * Callers pass a checkpointed/cached frame (it is read three times).
    *
    * Round-6 scale fix (guide §2.5 — the hot-key case): identical hashes
    * collapse to a min-id REPRESENTATIVE before banding. The dominant
    * web-corpus near-dup is the exact duplicate — the same logo/thumbnail
    * appears millions of times, every copy shares the identical 64-bit
    * hash and ALL band buckets — so pairing members directly pushed an
    * at-cap bucket's ~cap^2/2 verified pairs (all Hamming 0) through one
    * bucket reducer and into connected components as a clique of edges.
    * Now banding, the pair join, Hamming verification and CC all run on
    * DISTINCT hashes only (pair volume O(distinct hashes^2) per bucket;
    * an exact-dup clique costs ONE node), and members rejoin their
    * representative's component label afterwards by a hash-keyed join.
    * Uncapped results are IDENTICAL (members of one hash are mutually
    * Hamming-0 connected through their representative); the cap now
    * bounds distinct hashes per bucket — exact-duplicate members are
    * never dropped from their cluster, see [[hotBuckets]].
    */
  def clusterHashes(spark: SparkSession, hs: DataFrame,
                    maxHamming: Int, bucketCap: Int): DataFrame = {
    val groups = hs.groupBy("hash").agg(min("doc_id").as("rep"))
    val comp = graft.operators.Dedup.connectedComponents(
      verifiedPairs(groups.select(col("rep").as("doc_id"), col("hash")),
        maxHamming, bucketCap))
    val labeled = hs.join(groups, "hash")
      .join(comp.select(col("doc_id").as("rep"), col("component")),
        Seq("rep"), "left")
      .withColumn("rep_id", coalesce(col("component"), col("rep")))
    val sizes = labeled.groupBy("rep_id").agg(count(lit(1)).as("n_cluster"))
    labeled.join(sizes, "rep_id")
      .select(col("doc_id"),
        shiftrightunsigned(col("hash"), 32).as("hash_hi"),
        col("hash").bitwiseAND(lit(0xffffffffL)).as("hash_lo"),
        col("rep_id"), col("n_cluster"))
  }

  /** The candidate + verify stage on its own: banded buckets, bounded
    * per-bucket membership (lowest ids kept — plan- and retry-stable),
    * within-bucket pair join on the narrow bucket key, then the
    * codegen'd `bit_count(xor)` Hamming filter. Exposed so plan tests
    * can pin the verify shape (the clustering stage checkpoints, hiding
    * this subtree from the final plan).
    */
  def verifiedPairs(hs: DataFrame, maxHamming: Int, bucketCap: Int): DataFrame = {
    val bands = hs.select(col("doc_id"),
      explode(array((0 until 4).map(b =>
        shiftrightunsigned(col("hash"), 16 * b).bitwiseAND(lit(0xffffL))
          .plus(lit(b.toLong * 65536L))): _*)).as("bucket"))
    val capped = bands.groupBy("bucket")
      .agg(graft.functions.BoundedMinIds.minIds(bucketCap)(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_id"), col("bucket"))
    val cand = capped.as("l").join(capped.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    cand
      .join(hs.select(col("doc_id").as("a"), col("hash").as("ha")), "a")
      .join(hs.select(col("doc_id").as("b"), col("hash").as("hb")), "b")
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .select("a", "b")
  }

  /** Band-bucket occupancy vs the cap over any (doc_id, hash) frame — the
    * multimodal tier's no-silent-caps record, mirroring
    * [[graft.operators.Dedup.hotBuckets]]. Counts DISTINCT hashes per
    * bucket — the unit the round-6 [[clusterHashes]] cap actually binds
    * on: distinct hashes beyond the cap lose candidate pairs (their
    * groups surface as separate clusters), and this report makes that
    * loss observable instead of silent. Exact-duplicate members of one
    * hash are never capped out of their own cluster.
    */
  def hotBuckets(spark: SparkSession, hs: DataFrame, bucketCap: Int): DataFrame =
    hs.groupBy("hash").agg(min("doc_id").as("rep"))
      .select(col("rep"),
        explode(array((0 until 4).map(b =>
          shiftrightunsigned(col("hash"), 16 * b).bitwiseAND(lit(0xffffL))
            .plus(lit(b.toLong * 65536L))): _*)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_members"))
      .withColumn("n_kept", least(col("n_members"), lit(bucketCap.toLong)))
      .filter(col("n_members") > bucketCap)

  // ------------------------------------------------------------ fixtures

  private val Units = Array(1, 2, 4, 5, 7, 8) // the units of Z/9

  /** The 9x8 block-pattern cell value for dedup group `g` — an affine
    * walk over Z/9 ((a*(r*10+c)+b) mod 9, a a unit so horizontally
    * adjacent cells ALWAYS land on different residues) quantized to 9
    * luminance levels 24 apart. The 24-step gap dwarfs JPEG block-mean
    * error (~±2 on DCT-aligned uniform blocks), so the lossy variant
    * hashes identically to the PNG ones; distinct groups differ in >= 7
    * hash bits (pinned by PhashSpec), safely past the verify threshold.
    */
  def patternValue(g: Int, r: Int, c: Int): Int = {
    val a = Units(g % 6); val b = (g * 5 + 3) % 9
    16 + 24 * ((a * (r * 10 + c) + b) % 9)
  }

  /** The base pattern's bit(0,0) for group `g` — the one the flip variant
    * inverts.
    */
  def baseBit00(g: Int): Boolean = {
    val a = Units(g % 6); val b = (g * 5 + 3) % 9
    b % 9 < 9 - a
  }

  /** Render a group's pattern as a REAL encoded image. Variants per the
    * fixture contract: 0 = PNG at 8px blocks, 1 = PNG at 16px blocks (the
    * rescale twin), 2 = JPEG at 16px blocks (the re-encode twin), 3 = PNG
    * with cell (0,0) replaced so exactly bit(0,0) flips (the retouch
    * twin, Hamming 1 from the base).
    */
  def fixtureBytes(g: Int, variant: Int): Array[Byte] = {
    val block = if (variant == 1 || variant == 2) 16 else 8
    encodePattern(g, block, flip = variant == 3,
      format = if (variant == 2) "jpg" else "png")
  }

  /** The rendered pattern grid itself — [[Vfp]] wraps these as video
    * keyframes at its own block sizes.
    */
  def patternImage(g: Int, block: Int, flip: Boolean): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      9 * block, 8 * block, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val v0 = patternValue(g, r, c)
        val v = if (flip && r == 0 && c == 0) (if (baseBit00(g)) 255 else 0) else v0
        val rgb = (v << 16) | (v << 8) | v
        var y = r * block
        while (y < (r + 1) * block) {
          var x = c * block
          while (x < (c + 1) * block) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        c += 1
      }
      r += 1
    }
    img
  }

  def encodePattern(g: Int, block: Int, flip: Boolean, format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(patternImage(g, block, flip), format, bos)
    bos.toByteArray
  }
}
