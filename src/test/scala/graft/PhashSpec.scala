package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Phash

/** Pins the perceptual-hash dedup tier: the dHash arithmetic, its
  * invariance across the rescale/re-encode/retouch variants, the
  * inter-group Hamming separation the clustering contract rests on, and
  * the end-to-end LSH + Hamming + connected-components pipeline.
  */
class PhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def decode(b: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))

  /** The hash the oracle predicts for a group's pattern. */
  private def expectedHash(g: Int, flipped: Boolean): Long = {
    var h = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val base = Phash.patternValue(g, r, c + 1) > Phash.patternValue(g, r, c)
      val bit = if (flipped && r == 0 && c == 0) !base else base
      if (bit) h |= 1L << (r * 8 + c)
    }
    h
  }

  test("dHash recovers the pattern bits from real PNG bytes (all groups)") {
    for (g <- 0 until 12) {
      assert(Phash.dHash(decode(Phash.fixtureBytes(g, 0))) === expectedHash(g, flipped = false),
        s"group $g png")
    }
  }

  test("dHash is invariant under 2x rescale and JPEG re-encode; retouch flips exactly bit(0,0)") {
    for (g <- 0 until 12) {
      val base = expectedHash(g, flipped = false)
      assert(Phash.dHash(decode(Phash.fixtureBytes(g, 1))) === base, s"group $g 2x png")
      assert(Phash.dHash(decode(Phash.fixtureBytes(g, 2))) === base, s"group $g jpeg")
      val flip = Phash.dHash(decode(Phash.fixtureBytes(g, 3)))
      assert(flip === expectedHash(g, flipped = true), s"group $g retouch")
      assert(java.lang.Long.bitCount(base ^ flip) === 1, s"group $g retouch distance")
    }
  }

  test("inter-group Hamming separation stays past the verify threshold") {
    // the clustering contract: verify threshold 3, so NO cross-group pair
    // (including retouch variants) may come within 3 bits
    val all = for (g <- 0 until 12; f <- Seq(false, true))
      yield (g, expectedHash(g, f))
    var minD = 64
    for (((g1, h1), i) <- all.zipWithIndex; (g2, h2) <- all.drop(i + 1); if g1 != g2)
      minD = math.min(minD, java.lang.Long.bitCount(h1 ^ h2))
    assert(minD >= 7, s"min inter-group hamming $minD — fixture parameterization regressed")
  }

  test("clusters recovers exactly the pattern groups end-to-end") {
    import spark.implicits._
    // 3 groups x all 4 variants, ids laid out so group != id order
    val imgs = (0 until 12).map { i =>
      val g = i % 3; val v = i / 3
      (100L + i * 7L, Phash.fixtureBytes(g, v))
    }
    val out = Phash.clusters(spark, imgs.toDS()).collect()
    assert(out.length === 12)
    val byRep = out.groupBy(_.getAs[Long]("rep_id"))
    assert(byRep.size === 3, "expected one cluster per pattern group")
    for ((rep, members) <- byRep) {
      assert(members.length === 4)
      assert(members.map(_.getAs[Long]("n_cluster")).toSet === Set(4L))
      assert(rep === members.map(_.getAs[Long]("doc_id")).min)
      // all members derive from one group: ids 100+i*7 with g = i%3
      val gs = members.map(m => (((m.getAs[Long]("doc_id") - 100) / 7) % 3)).toSet
      assert(gs.size === 1, s"cluster $rep mixes groups $gs")
    }
    // hash halves reassemble to the expected 64-bit hashes
    for (row <- out) {
      val id = row.getAs[Long]("doc_id"); val i = ((id - 100) / 7).toInt
      val h = (row.getAs[Long]("hash_hi") << 32) | row.getAs[Long]("hash_lo")
      assert(h === expectedHash(i % 3, flipped = i / 3 == 3), s"doc $id")
    }
  }

  test("exact-dup clique costs ONE node: identical images cluster whole at any cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    // round 6: identical hashes collapse to a min-id representative BEFORE
    // banding, so an exact-dup group can never be split by the bucket cap
    // (members rejoin the representative's label) and the pair stage sees
    // ONE node instead of a member-quadratic clique
    val imgs = (0 until 6).map(i => (10L + i, Phash.fixtureBytes(0, 0)))
    val out = Phash.clusters(spark, imgs.toDS(), maxHamming = 3, bucketCap = 2).collect()
    assert(out.length === 6)
    assert(out.forall(r => r.getAs[Long]("rep_id") === 10L &&
      r.getAs[Long]("n_cluster") === 6L), "one cluster, min-id representative")
    val hs = Phash.hashes(spark, imgs.toDS())
    // candidate-pair volume is DISTINCT-HASH-bounded, not member-quadratic:
    // the collapsed frame clusterHashes feeds the pair stage has one row
    val collapsed = hs.groupBy("hash").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("hash"))
    assert(Phash.verifiedPairs(collapsed, 3, 2).count() === 0L,
      "a single distinct hash must generate zero candidate pairs")
    // one distinct hash is under every bucket cap: nothing hot to report
    assert(Phash.hotBuckets(spark, hs, 2).collect().isEmpty)
    // the codegen'd Hamming verify is in the verify stage's physical plan
    // (the clustering stage checkpoints, so assert on the exposed subtree)
    val plan = Phash.verifiedPairs(hs, 3, 2).queryExecution.executedPlan.toString
    assert(plan.contains("bit_count"), s"expected codegen'd Hamming verify:\n${plan.take(1200)}")
  }

  test("member-quadratic pair volume is gone: big clique verifies via one rep pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    // two exact-dup groups of 200 whose hashes are Hamming-1 apart: the
    // verify stage must propose exactly ONE rep-level pair (not the
    // ~2*C(200,2)+200^2 member pairs of the old member-level banding),
    // and the clusters output still merges all 400 docs
    val hs = ((0 until 200).map(i => (1000L + i, 0x0123456789abcdefL)) ++
      (0 until 200).map(i => (2000L + i, 0x0123456789abcdeeL)))
      .toDF("doc_id", "hash")
    val collapsed = hs.groupBy("hash").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("hash"))
    assert(Phash.verifiedPairs(collapsed, 3, 10000).count() === 1L)
    val out = Phash.clusterHashes(spark, hs, 3, 10000).collect()
    assert(out.length === 400)
    assert(out.forall(r => r.getAs[Long]("rep_id") === 1000L &&
      r.getAs[Long]("n_cluster") === 400L))
  }

  test("distinct hashes beyond the bucket cap lose pairs observably, never silently") {
    import spark.implicits._
    // 5 DISTINCT hashes i<<16 (pairwise Hamming <= 3) share band buckets
    // 0, 2 and 3; cap 2 keeps the two lowest representatives per bucket,
    // the rest surface as singletons and hotBuckets reports the loss
    val hs = (1 to 5).map(i => (10L + i, i.toLong << 16)).toDF("doc_id", "hash")
    val out = Phash.clusterHashes(spark, hs, 3, 2).collect()
    val reps = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
    assert(reps(11L) === 11L && reps(12L) === 11L, "kept pair clusters")
    assert((13L to 15L).forall(id => reps(id) === id), "capped-out hashes are singletons")
    val hot = Phash.hotBuckets(spark, hs, 2).collect()
    assert(hot.length === 3, "bands 0, 2, 3 each hold 5 distinct hashes > cap")
    assert(hot.forall(r => r.getAs[Long]("n_members") === 5L && r.getAs[Long]("n_kept") === 2L))
  }

  test("dHash refuses sub-grid and bomb dimensions; undecodable bytes classify") {
    intercept[IllegalArgumentException](
      Phash.dHash(new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)))
    intercept[IllegalArgumentException](
      Phash.dHash(new java.awt.image.BufferedImage(Phash.MaxDim + 1, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)))
  }

  test("area-average cross-multiplication is exact on non-divisible dims") {
    // 13x11 image (cells of unequal size): a horizontal two-tone split
    // must still hash to all-ones-then-zeros rows deterministically
    val img = new java.awt.image.BufferedImage(13, 11,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 11; x <- 0 until 13) {
      val v = if (x < 6) 40 else 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val h = Phash.dHash(img)
    // every row sees the same columns, so all 8 row bytes must agree; and
    // with brightness non-decreasing in x the 1 bits (strict increases)
    // form one contiguous run around the step
    val rows = (0 until 8).map(r => (h >>> (r * 8)) & 0xffL)
    assert(rows.toSet.size === 1, "rows must hash identically")
    val ones = (0 until 8).filter(c => ((rows.head >> c) & 1L) == 1L)
    assert(ones.nonEmpty && ones === (ones.head to ones.last),
      s"expected one contiguous rising run, got $ones")
  }
}
