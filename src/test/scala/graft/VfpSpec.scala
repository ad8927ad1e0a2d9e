package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Media, Phash, Vfp}

/** Pins the video keyframe fingerprint: hash exactness through the real
  * container walk + JPEG decode at both block scales, re-cut/rescale
  * invariance, the retouch contract, and the shared clustering stage.
  */
class VfpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def expectedHash(g: Int, flipped: Boolean): Long = {
    var h = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val base = Phash.patternValue(g, r, c + 1) > Phash.patternValue(g, r, c)
      val bit = if (flipped && r == 0 && c == 0) !base else base
      if (bit) h |= 1L << (r * 8 + c)
    }
    h
  }

  test("keyframe hash survives re-cut, rescale; retouch flips exactly bit(0,0)") {
    for (g <- 0 until 12) {
      val base = expectedHash(g, flipped = false)
      assert(Vfp.keyframeHash(Vfp.fixtureBytes(g, 0)) === base, s"group $g base")
      assert(Vfp.keyframeHash(Vfp.fixtureBytes(g, 1)) === base, s"group $g re-cut")
      assert(Vfp.keyframeHash(Vfp.fixtureBytes(g, 2)) === base, s"group $g rescale (8px jpeg)")
      val re = Vfp.keyframeHash(Vfp.fixtureBytes(g, 3))
      assert(re === expectedHash(g, flipped = true), s"group $g retouch")
      assert(java.lang.Long.bitCount(base ^ re) === 1)
    }
  }

  test("clusters recovers exactly the keyframe groups end-to-end") {
    import spark.implicits._
    val clips = (0 until 12).map { i =>
      val g = i % 3; val v = i / 3
      (900L + i * 13L, Vfp.fixtureBytes(g, v))
    }
    val out = Vfp.clusters(spark, clips.toDS()).collect()
    assert(out.length === 12)
    val byRep = out.groupBy(_.getAs[Long]("rep_id"))
    assert(byRep.size === 3)
    for ((rep, members) <- byRep) {
      assert(members.length === 4)
      assert(rep === members.map(_.getAs[Long]("doc_id")).min)
      val gs = members.map(m => (((m.getAs[Long]("doc_id") - 900) / 13) % 3)).toSet
      assert(gs.size === 1, s"cluster $rep mixes groups $gs")
    }
  }

  test("frameless and malformed containers classify instead of mis-hashing") {
    // AVI with zero video frames
    val empty = Media.encodeAviMjpegJpegs(16, 16, Seq.empty)
    intercept[IllegalArgumentException](Vfp.keyframeHash(empty))
    // non-RIFF bytes
    intercept[graft.core.ParseFailure](
      Vfp.keyframeHash("definitely not a RIFF container".getBytes("US-ASCII")))
    // lying chunk size inside a real header
    val lying = Vfp.fixtureBytes(0, 0).clone()
    // corrupt the first '00dc' size field (scan for the fourcc)
    val idx = lying.indexOfSlice("00dc".getBytes("US-ASCII"))
    assert(idx > 0)
    lying(idx + 4) = 0xff.toByte; lying(idx + 5) = 0xff.toByte
    lying(idx + 6) = 0xff.toByte; lying(idx + 7) = 0x7f.toByte
    intercept[graft.core.ParseFailure](Vfp.keyframeHash(lying))
  }

  test("aviFrameChunks reads only the requested frames") {
    val avi = Vfp.fixtureBytes(1, 1) // 5 frames
    assert(Media.aviFrameChunks(avi, 1).length === 1)
    assert(Media.aviFrameChunks(avi, 99).length === 5)
  }
}
