package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * Cross-engine determinism: embeddings are quantized to integers
  * (round(e*1000)), so dot products and norms are EXACT int64 on both Spark
  * and the DuckDB oracle; the final cosine is a single IEEE-correctly-rounded
  * sqrt+divide over exact integers — bit-identical across engines. Ranking
  * ties break on vec_id.
  *
  * Scale path: brute force is |probes| x |corpus| with a broadcast probe set
  * (baseline); LSH restricts candidates to shared hyperplane-sign buckets —
  * at 100 TB the bucketed variant shuffles (bucket, id, qvec) once and joins
  * within buckets only.
  */
object Knn {

  val Quant = 1000.0
  val NumPlanes = 8

  /** Deterministic integer hyperplane weights: exact in any engine.
    * w(p,d) = ((p*64+d) * 2654435761) mod 65536 - 32768.
    */
  def planeWeight(p: Int, d: Int): Long =
    ((p.toLong * 64 + d) * 2654435761L) % 65536L - 32768L

  def quantize(v: Seq[Float]): Array[Long] =
    v.iterator.map(e => math.round(e.toDouble * Quant)).toArray

  def sigBucket(q: Array[Long]): Long = {
    var bucket = 0L
    var p = 0
    while (p < NumPlanes) {
      var dot = 0L
      var d = 0
      while (d < q.length) { dot += planeWeight(p, d) * q(d); d += 1 }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def cosineQ(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  private def quantized(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, quantize(v)) }
      .toDF("vec_id", "q")
  }

  /** Brute-force top-k cosine neighbors for probes (vec_id%100==0). */
  def bruteTopK(spark: SparkSession, emb: DataFrame, k: Int = 5): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, emb)
    val probes = q.filter(col("vec_id") % 100 === 0)
      .withColumnRenamed("vec_id", "probe_id").withColumnRenamed("q", "pq")
    val scored = broadcast(probes).join(q, col("probe_id") =!= col("vec_id"))
      .as[(Long, Array[Long], Long, Array[Long])]
      .map { case (pid, pq, vid, vq) => (pid, vid, cosineQ(pq, vq)) }
      .toDF("probe_id", "neighbor_id", "cos")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id")
  }

  /** LSH-bucketed ANN: candidates share the 8-bit hyperplane-sign bucket;
    * top-k by exact cosine within the bucket.
    */
  def lshTopK(spark: SparkSession, emb: DataFrame, k: Int = 5): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, emb).as[(Long, Array[Long])]
      .map { case (id, v) => (id, v, sigBucket(v)) }
      .toDF("vec_id", "q", "bucket")
    val probes = q.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("bucket"))
    val scored = probes.join(q, Seq("bucket"))
      .filter(col("probe_id") =!= col("vec_id"))
      .select("probe_id", "pq", "vec_id", "q")
      .as[(Long, Array[Long], Long, Array[Long])]
      .map { case (pid, pq, vid, vq) => (pid, vid, cosineQ(pq, vq)) }
      .toDF("probe_id", "neighbor_id", "cos")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id")
  }

  /** Embedding-cosine near-duplicate pairs: probes (vec_id%50==0) vs all,
    * cosine >= minCos, a != b. Output integral ids only.
    */
  def cosinePairs(spark: SparkSession, emb: DataFrame, minCos: Double): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, emb)
    val probes = q.filter(col("vec_id") % 50 === 0)
      .withColumnRenamed("vec_id", "a").withColumnRenamed("q", "pq")
    broadcast(probes).join(q.withColumnRenamed("vec_id", "b"), col("a") =!= col("b"))
      .as[(Long, Array[Long], Long, Array[Long])]
      .map { case (a, pq, b, vq) => (a, b, cosineQ(pq, vq)) }
      .toDF("a", "b", "cos")
      .filter(col("cos") >= minCos)
      .select("a", "b")
  }
}
