package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway in-JVM A/B harness (not part of the measured surface):
  * alternates two implementations in one warmed session, flipping the
  * within-pair order each round so host drift hits both sides equally.
  */
object AB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "8").toInt
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def rawDocs = graft.core.Corpus.documents(spark, sfDir)
    def parDocs = graft.core.Corpus.documentsDistributed(spark, sfDir)

    // wordFreqScore-shaped kernel
    def wf(d: DataFrame): Unit = {
      val words = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val counts = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      words.join(counts, "w").groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum("cnt").as("s")).count(): Unit
    }
    // perplexity-shaped kernel (bigram explode + model + score join)
    def ppl(d: DataFrame): Unit = {
      val ws = d.select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("l"))
      val bg = ws.filter(size(col("l")) >= 2)
        .select(col("doc_id"),
          explode(arrays_zip(
            expr("slice(l, 1, size(l) - 1)").as("w1"),
            expr("slice(l, 2, size(l) - 1)").as("w2"))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
      val v = ws.select(explode(col("l")).as("w")).agg(countDistinct(col("w")).as("v"))
      bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .withColumn("bits", length(bin(expr("(c1 + v) div (c2 + 1)"))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("ppl_bits"))
        .count(): Unit
    }
    // tokenBudget-shaped kernel (split+sha2 map, then two windows)
    def tb(d: DataFrame): Unit = { Queries.tokenBudget(spark, sfDir); () }

    import graft.operators.Dedup
    def c4(d: DataFrame): Unit = {
      import spark.implicits._
      val spans = d.select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          val w = t.split(" ", -1)
          (0 to w.length - 15 by 5).map(i => (id, i / 5, w.slice(i, i + 15).mkString(" ")))
        }
        .toDF("doc_id", "sid", "span")
        .select(col("doc_id"), xxhash64(col("span")).as("sh"),
          (col("doc_id") * lit(1000000L) + col("sid")).as("k"))
      val first = spans.groupBy("sh").agg(min(col("k")).as("fk"))
      spans.join(first, "sh").groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("k") =!= col("fk"), 1L).otherwise(0L)).as("n_dup"))
        .count(): Unit
    }
    def jac(d: DataFrame): Unit = {
      val injected = d.withColumn("text", concat(col("text"), lit(" ubiq bigram")))
      Dedup.ngramJaccard(spark, injected, 500L).count(): Unit
    }
    def dbl(d: DataFrame): Unit =
      Dedup.decontaminateBloom(spark,
        d.filter(col("doc_id") % 97 =!= 0),
        d.filter(col("doc_id") % 97 === 0), 20).count(): Unit
    def mh(d: DataFrame): Unit =
      Dedup.minhashPairs(spark, Dedup.withInjectedDups(d)).count(): Unit
    import graft.operators.Dedup
    import spark.implicits._
    def ccOn(force: Long): Unit = {
      val imgs = graft.core.Corpus.documentsDistributed(spark, sfDir)
        .select("doc_id").as[Long]
        .filter(_ % 17 == 0)
        .map { id =>
          val k = id / 17
          (id, graft.multimodal.Phash.fixtureBytes(((k / 4) % 12).toInt, (k % 4).toInt))
        }
      val hs = graft.multimodal.Phash.hashes(spark, imgs).localCheckpoint(false)
      val groups = hs.groupBy("hash").agg(min("doc_id").as("rep"))
      Dedup.connectedComponents(
        graft.multimodal.Phash.verifiedPairs(
          groups.select(col("rep").as("doc_id"), col("hash")), 3, 10000),
        localEdgeMax = force).count(): Unit
    }
    val cases: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("cc dist/local", () => ccOn(0L), () => ccOn(Long.MaxValue))
    )
    cases.foreach { case (name, fa, fb) =>
      fa(); fb()
      val as = collection.mutable.ArrayBuffer[Double]()
      val bs = collection.mutable.ArrayBuffer[Double]()
      for (r <- 1 to rounds) {
        if (r % 2 == 1) { as += time(fa()); bs += time(fb()) }
        else { bs += time(fb()); as += time(fa()) }
      }
      println(f"$name%-16s A min=${as.min}%.3f med=${as.sorted.apply(as.length / 2)}%.3f all=${as.map(t => f"$t%.2f").mkString(",")}")
      println(f"$name%-16s B min=${bs.min}%.3f med=${bs.sorted.apply(bs.length / 2)}%.3f all=${bs.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
