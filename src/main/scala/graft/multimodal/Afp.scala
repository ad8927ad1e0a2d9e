package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Audio near-duplicate fingerprinting over REAL decoded PCM — the audio
  * member of the multimodal dedup tier ([[Phash]] is the image one; the
  * reference passes media through opaquely, `extractor/EmbedLinker.java`,
  * so like image dedup this is an engine addition for the training-data
  * pipeline).
  *
  * Signature: the energy-contour fingerprint (the public
  * Haitsma-Kalker 2002 "robust audio fingerprinting" family, reduced to
  * its time-axis term): split the decoded sample stream into 64
  * equal-length frames, take each frame's mean absolute amplitude, and
  * emit bit i = frame(i+1) louder than frame(i) — 63 bits of loudness
  * contour that survive resampling (per-frame means are rate-free) and
  * uniform volume change (scaling preserves the ordering), the two
  * transforms that defeat byte-level dedup of re-encoded audio. Means are
  * compared by exact integer cross-multiplication like [[Phash.dHash]] —
  * no float, bit-reproducible, oracle-checkable.
  *
  * Clustering reuses [[Phash.clusterHashes]] verbatim: banded LSH with
  * the bounded bucket cap, codegen'd Hamming verify, connected
  * components. Only (doc_id, hash) ever shuffles.
  */
object Afp {

  /** Frames in the contour; 63 comparison bits. */
  val Frames = 64

  /** Longest clip accepted, in samples: keeps sum*count inside Long and
    * refuses absurd declared lengths the way the embed size guard does
    * (2^31 samples ~ 74 h at 8 kHz).
    */
  val MaxSamples: Long = Int.MaxValue

  /** 63-bit energy-contour fingerprint over signed 16-bit mono samples. */
  def fingerprint(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= Frames, s"afp: $n samples below the $Frames-frame grid")
    val sums = new Array[Long](Frames)
    val cnts = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      val i0 = f.toLong * n / Frames; val i1 = (f + 1).toLong * n / Frames
      var s = 0L
      var i = i0
      while (i < i1) { s += math.abs(samples(i.toInt).toLong); i += 1 }
      sums(f) = s; cnts(f) = i1 - i0
      f += 1
    }
    var hash = 0L
    f = 0
    while (f < Frames - 1) {
      if (sums(f + 1) * cnts(f) > sums(f) * cnts(f + 1)) hash |= 1L << f
      f += 1
    }
    hash
  }

  /** REAL WAV decode (javax.sound, the [[Media.decodeAudio]] path) to
    * signed 16-bit little-endian mono samples.
    */
  def decodeSamples(bytes: Array[Byte]): Array[Short] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16,
        s"afp: want s16 mono, got ${fmt.getChannels}ch/${fmt.getSampleSizeInBits}bit")
      require(in.getFrameLength <= MaxSamples, "afp: declared length over cap")
      val raw = in.readAllBytes()
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
        i += 1
      }
      out
    } finally in.close()
  }

  /** (doc_id, hash) over real WAV bytes — map-side only. */
  def hashes(spark: SparkSession, clips: Dataset[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    clips.map { case (id, bytes) => (id, fingerprint(decodeSamples(bytes))) }
      .toDF("doc_id", "hash")
  }

  /** Near-duplicate audio clusters — same output contract as
    * [[Phash.clusters]]: (doc_id, hash_hi, hash_lo, rep_id, n_cluster).
    */
  def clusters(spark: SparkSession, clips: Dataset[(Long, Array[Byte])],
               maxHamming: Int = 3, bucketCap: Int = 10000): DataFrame =
    Phash.clusterHashes(spark, hashes(spark, clips).localCheckpoint(false),
      maxHamming, bucketCap)

  // ------------------------------------------------------------ fixtures

  private val Units = Array(1, 2, 4, 5, 7, 8)

  /** Per-frame amplitude for dedup group `g`: the same affine walk over
    * Z/9 as [[Phash.patternValue]], on the time axis — adjacent frames
    * always land on different residues, quantized 400 apart (far past
    * any integer-halving rounding), peak 3400 of 32767 so the 2x volume
    * variant has headroom.
    */
  def frameAmp(g: Int, i: Int): Int = {
    val a = Units(g % 6); val b = (g * 5 + 3) % 9
    200 + 400 * ((a * i + b) % 9)
  }

  /** The base contour's bit 0 — what the retouch variant inverts. */
  def baseBit0(g: Int): Boolean = {
    val a = Units(g % 6); val b = (g * 5 + 3) % 9
    b < 9 - a
  }

  /** Render a group's contour as a REAL RIFF/WAVE clip. Variants:
    * 0 = 8 kHz / 50 samples per frame; 1 = 16 kHz / 100 per frame (the
    * resample twin — same duration, same contour); 2 = 8 kHz at exactly
    * half volume (the gain twin — ordering preserved); 3 = 8 kHz with
    * frame 0 replaced so exactly bit 0 flips (the edit twin, Hamming 1).
    */
  def fixtureBytes(g: Int, variant: Int): Array[Byte] = {
    val perFrame = if (variant == 1) 100 else 50
    val rate = if (variant == 1) 16000 else 8000
    val n = Frames * perFrame
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < Frames) {
      val base = frameAmp(g, f)
      val amp0 =
        if (variant == 3 && f == 0) (if (baseBit0(g)) 32000 else 0)
        else base
      val amp = if (variant == 2) amp0 / 2 else amp0
      // alternate sign so the clip is a real waveform, |sample| constant
      var i = 0
      while (i < perFrame) {
        bb.putShort((if (i % 2 == 0) amp else -amp).toShort)
        i += 1
      }
      f += 1
    }
    bb.array()
  }
}
