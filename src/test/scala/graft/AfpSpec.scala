package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Afp

/** Pins the audio energy-contour fingerprint: bit exactness over real
  * WAV decodes, invariance across the resample/gain variants, the edit
  * variant's Hamming-1 contract, inter-group separation, and the shared
  * clustering pipeline end to end.
  */
class AfpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def expectedHash(g: Int, flipped: Boolean): Long = {
    var h = 0L
    for (i <- 0 until 63) {
      val base = Afp.frameAmp(g, i + 1) > Afp.frameAmp(g, i)
      val bit = if (flipped && i == 0) !base else base
      if (bit) h |= 1L << i
    }
    h
  }

  test("fingerprint recovers the contour bits from real WAV bytes (all groups)") {
    for (g <- 0 until 12)
      assert(Afp.fingerprint(Afp.decodeSamples(Afp.fixtureBytes(g, 0))) ===
        expectedHash(g, flipped = false), s"group $g")
  }

  test("fingerprint is invariant under resample and half volume; edit flips exactly bit 0") {
    for (g <- 0 until 12) {
      val base = expectedHash(g, flipped = false)
      assert(Afp.fingerprint(Afp.decodeSamples(Afp.fixtureBytes(g, 1))) === base,
        s"group $g 16kHz")
      assert(Afp.fingerprint(Afp.decodeSamples(Afp.fixtureBytes(g, 2))) === base,
        s"group $g half volume")
      val edit = Afp.fingerprint(Afp.decodeSamples(Afp.fixtureBytes(g, 3)))
      assert(edit === expectedHash(g, flipped = true), s"group $g edit")
      assert(java.lang.Long.bitCount(base ^ edit) === 1)
    }
  }

  test("inter-group Hamming separation stays past the verify threshold") {
    val all = for (g <- 0 until 12; f <- Seq(false, true))
      yield (g, expectedHash(g, f))
    var minD = 64
    for (((g1, h1), i) <- all.zipWithIndex; (g2, h2) <- all.drop(i + 1); if g1 != g2)
      minD = math.min(minD, java.lang.Long.bitCount(h1 ^ h2))
    assert(minD >= 7, s"min inter-group hamming $minD — fixture parameterization regressed")
  }

  test("clusters recovers exactly the contour groups end-to-end") {
    import spark.implicits._
    val clips = (0 until 12).map { i =>
      val g = i % 3; val v = i / 3
      (500L + i * 11L, Afp.fixtureBytes(g, v))
    }
    val out = Afp.clusters(spark, clips.toDS()).collect()
    assert(out.length === 12)
    val byRep = out.groupBy(_.getAs[Long]("rep_id"))
    assert(byRep.size === 3)
    for ((rep, members) <- byRep) {
      assert(members.length === 4)
      assert(rep === members.map(_.getAs[Long]("doc_id")).min)
      val gs = members.map(m => (((m.getAs[Long]("doc_id") - 500) / 11) % 3)).toSet
      assert(gs.size === 1, s"cluster $rep mixes groups $gs")
    }
  }

  test("fingerprint and decode refuse malformed input cleanly") {
    intercept[IllegalArgumentException](Afp.fingerprint(new Array[Short](63)))
    // stereo clip: channels guard
    val stereo = {
      val bb = java.nio.ByteBuffer.allocate(44 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(2)
        .putInt(8000).putInt(8000 * 4).putShort(4).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(8)
      bb.putShort(1).putShort(2).putShort(3).putShort(4)
      bb.array()
    }
    intercept[IllegalArgumentException](Afp.decodeSamples(stereo))
  }
}
