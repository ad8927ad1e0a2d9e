package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Knn

/** ANN scale guarantees: recall vs the exact baseline, and bounded bucket
  * occupancy under skew (the 100 TB safety property — no bucket may go
  * quadratic).
  */
class KnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def probes = emb.filter(col("vec_id") % 100 === 0).select("vec_id")

  test("LSH ANN reaches >=0.8 recall@5 vs brute force on the fixture corpus") {
    val brute = Knn.bruteTopK(spark, emb, probes)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Knn.lshTopK(spark, emb, probes)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(brute.nonEmpty)
    assert(recall >= 0.8, s"recall@5 = $recall")
  }

  test("IVF ANN searches nProbe/nLists of the corpus at measured >=0.7 recall@5") {
    val brute = Knn.bruteTopK(spark, emb, probes)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixture-pinned 16/8 (the oracle's setting); derived params are the
    // production default and are covered by the derivation test below
    val ivf = Knn.ivfTopK(spark, emb, probes, nLists = 16, nProbe = 8)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.7, s"recall@5 = $recall") // measured 0.76 on this fixture
  }

  test("IVF defaults derive nLists ~ sqrt(N); occupancy and selectivity bounded") {
    val n = emb.count()
    val nl = Knn.deriveNLists(n)
    assert(nl == math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
    val np = Knn.deriveNProbe(nl)
    assert(np >= 2 && np <= nl)
    // derived selectivity stays a small fraction as N grows (the scale
    // property a fixed nLists loses): <= 25% for any corpus >= 256 vectors
    assert(Knn.deriveNProbe(Knn.deriveNLists(1000000)) * 4 <=
      Knn.deriveNLists(1000000))
    val stats = Knn.ivfStats(spark, emb).collect().head
    assert(stats.getAs[Long]("n_lists") == nl.toLong)
    assert(stats.getAs[Long]("selectivity_pct") == 100L * np / nl)
    // end-to-end with derived params: still k rows per probe
    val out = Knn.ivfTopK(spark, emb, probes)
    val perProbe = out.groupBy("probe_id").count().select("count")
      .collect().map(_.getLong(0))
    assert(perProbe.nonEmpty && perProbe.forall(_ == 5L))
  }

  test("two-level quantizer caps the assignment scan at ~sqrt(nLists)") {
    // the cost bound is the mechanism, oracle-surfaced via assign_scan
    assert(Knn.assignScanBound(16) == 16L) // flat below threshold
    assert(Knn.assignScanBound(4096) == 4096L)
    val big = Knn.assignScanBound(1000000)
    assert(big < 5000L, s"10^6 lists must scan ~sqrt, got $big") // ~3k
    assert(Knn.assignScanBound(65536) == 256L + 2L * 256L)
    // forcing the two-level path (threshold below nLists) stays
    // deterministic and returns full top-k; with the threshold at or
    // above nLists the flat path is bit-identical to the default
    val probes2 = probes
    val two1 = Knn.ivfTopK(spark, emb, probes2, nLists = 64, nProbe = 8,
      exactAssignMax = 8).collect().map(_.toString).sorted
    val two2 = Knn.ivfTopK(spark, emb, probes2, nLists = 64, nProbe = 8,
      exactAssignMax = 8).collect().map(_.toString).sorted
    assert(two1.sameElements(two2)) // deterministic under re-run
    assert(two1.nonEmpty)
    val flatA = Knn.ivfTopK(spark, emb, probes2, nLists = 64, nProbe = 8)
      .collect().map(_.toString).sorted
    val flatB = Knn.ivfTopK(spark, emb, probes2, nLists = 64, nProbe = 8,
      exactAssignMax = 64).collect().map(_.toString).sorted
    assert(flatA.sameElements(flatB))
    // full top-k shape survives the two-level path
    val perProbe = Knn.ivfTopK(spark, emb, probes2, nLists = 64, nProbe = 8,
      exactAssignMax = 8).groupBy("probe_id").count()
      .collect().map(_.getLong(1))
    assert(perProbe.nonEmpty && perProbe.forall(_ == 5L))
  }

  test("semantic dedup marks lower-id cluster-mates within tau, min-id kept") {
    val out = Knn.semanticDedup(spark, emb, nClusters = 16, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == emb.count())
    // cluster ids are the 16 lowest vec_ids (the deterministic seeds)
    val seedIds = out.map(_._1).sorted.take(16).toSet
    assert(out.map(_._2).toSet.subsetOf(seedIds))
    assert(out.exists(_._3 == 0L) && out.exists(_._3 == 1L)) // both outcomes occur
    // the lowest vec_id of every cluster is always kept (nothing earlier)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.minBy(_._1)._3 == 1L)
    }
    // deterministic under re-run
    val again = Knn.semanticDedup(spark, emb, nClusters = 16, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("bucket cap bounds occupancy on a skewed corpus; truncation is reported") {
    import spark.implicits._
    // worst-case skew: 400 identical vectors (templated docs) + 100 varied —
    // the identical ones all land in the same bucket of every table
    val skewed = spark.createDataset(
      (0 until 400).map(i => (i.toLong, Seq.fill(64)(0.5f))) ++
        (400 until 500).map(i => (i.toLong, Seq.tabulate(64)(d => ((i * 7 + d) % 13 - 6) / 6.0f)))
    ).toDF("vec_id", "embedding")
    val cap = 16
    val capped = Knn.cappedMemberships(
      Knn.tableMemberships(spark, Knn.quantized(spark, skewed), Knn.BitsPerTable, Knn.NumTables),
      cap)
    val maxOcc = capped.groupBy("t", "bucket").agg(count(lit(1)).as("n"))
      .agg(max("n")).first().getLong(0)
    assert(maxOcc <= cap, s"a bucket exceeded the cap: $maxOcc")
    // and the truncation is observable, never silent
    val stats = Knn.bucketStats(spark, skewed, cap = cap)
    val truncated = stats.filter(col("n_members") > col("n_kept")).count()
    assert(truncated > 0)
    assert(stats.filter(col("n_kept") > cap).count() == 0)
  }

  test("deterministic cap keeps the lowest vec_ids (plan- and retry-stable)") {
    import spark.implicits._
    val dup = spark.createDataset(
      (0 until 50).map(i => (i.toLong, Seq.fill(64)(1.0f)))).toDF("vec_id", "embedding")
    val capped = Knn.cappedMemberships(
      Knn.tableMemberships(spark, Knn.quantized(spark, dup), 2, 1), 10)
    val kept = capped.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == (0L until 10L))
  }
}
