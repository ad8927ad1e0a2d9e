package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{HashParams, Ids}

/** Deduplication operators for the training-data pipeline.
  *
  * Algorithms: MinHash (Broder, "On the resemblance and containment of
  * documents", 1997) with banded LSH; SimHash (Charikar, "Similarity
  * estimation techniques from rounding algorithms", STOC 2002); shingled
  * Jaccard; winnowing fingerprints live in TextStats (Schleimer/Wilkerson/
  * Aiken, SIGMOD 2003).
  *
  * Scale notes (100 TB target):
  *  - exact dedup is a single hash-shuffle on the content hash — the hash is
  *    computed BEFORE the shuffle so only (hash, id) moves, never the text;
  *  - MinHash+LSH shuffles (bucket_key, doc_id) pairs only: candidate
  *    generation is a self-equi-join on the bucket key, which AQE
  *    skew-splits if a bucket is hot;
  *  - SimHash emits one 64-bit signature per doc (map-only), pairs via a
  *    banded equi-join, never an all-pairs product;
  *  - n-gram Jaccard is the only quadratic-ish op and is gated on an
  *    explicit probe set (sampled ids), keeping the join |probes| x |docs|.
  */
object Dedup {

  /** TEST FIXTURE (not operator semantics): documents plus injected
    * duplicates (doc_id<100 copied, shifted by 1e6) so dedup queries have
    * true positives to find. Deterministic. Callers (the query layer / specs)
    * apply this BEFORE an operator — the operators themselves dedupe exactly
    * the frame they are given.
    */
  def withInjectedDups(docs: DataFrame): DataFrame = {
    val dups = docs.filter(col("doc_id") < 100)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    docs.unionByName(dups)
  }

  /** Exact dedup by content hash (reference duplicate suppression,
    * `TikaDocument.java:310-316`, generalized to hash-groupBy).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper_id"))

  /** MinHash signature of one text: 3-word shingles -> md5-derived 32-bit
    * codes -> NumMinHash universal hashes, min over shingles.
    */
  def minhashSig(text: String): Array[Long] = {
    val w = text.split(" ", -1) // string_split semantics
    val sig = Array.fill(HashParams.NumMinHash)(Long.MaxValue)
    val nSh = math.max(1, w.length - 2)
    var i = 0
    while (i < nSh) {
      val shingle =
        if (w.length < 3) text
        else w(i) + " " + w(i + 1) + " " + w(i + 2)
      val x = Ids.code32(shingle)
      var h = 0
      while (h < HashParams.NumMinHash) {
        val v = HashParams.minhash(h, x)
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys for a signature: bands of BandSize rows, key =
    * "band:v,v,v".
    */
  def bandKeys(sig: Array[Long]): Seq[String] = {
    val nBands = HashParams.NumMinHash / HashParams.BandSize
    (0 until nBands).map { b =>
      val vs = (0 until HashParams.BandSize)
        .map(r => sig(b * HashParams.BandSize + r)).mkString(",")
      s"$b:$vs"
    }
  }

  /** MinHash+LSH near-duplicate candidate pairs (a<b, distinct). */
  def minhashPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val buckets = docs
      .select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) => bandKeys(minhashSig(t)).map(k => (k, id)) }
      .toDF("bucket", "doc_id")
    buckets.as("l").join(buckets.as("r"), col("l.bucket") === col("r.bucket")
        && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
  }

  /** SimHash signatures (map-only; one row per doc). */
  def simhash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, graft.core.text.TextStats.simhash32(t)) }
      .toDF("doc_id", "simhash")
  }

  /** n-gram (2-word shingle) Jaccard similarity, probe-gated:
    * probes = doc_id % 50 == 0; emit (a=probe, b, inter, uni) where
    * 5*inter >= uni (Jaccard >= 0.2), a != b. Integer-only output.
    */
  def ngramJaccard(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val shingles = docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) =>
        val w = t.split(" ", -1) // string_split semantics
        val set = scala.collection.mutable.HashSet.empty[String]
        var i = 0
        while (i < w.length - 1) { set += (w(i) + " " + w(i + 1)); i += 1 }
        set.iterator.map(s => (id, s))
      }.toDF("doc_id", "shingle")
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val probes = shingles.filter(col("doc_id") % 50 === 0)
      .withColumnRenamed("doc_id", "a")
    val inter = probes.join(shingles.withColumnRenamed("doc_id", "b"), "shingle")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza")), "a")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb")), "b")
      .withColumn("uni", col("sza") + col("szb") - col("inter"))
      .filter(col("inter") * 5 >= col("uni"))
      .select("a", "b", "inter", "uni")
  }
}
