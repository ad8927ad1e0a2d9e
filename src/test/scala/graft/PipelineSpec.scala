package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.pipeline.ExtractJob

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pipe").toString

  private def corpus(n: Int) = {
    import spark.implicits._
    spark.createDataset((0 until n).map { i =>
      Corpus.synthesizeOne(i.toLong, s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima unit$i")
    })
  }

  test("end-to-end run writes extracted, lineage, and checkpoints") {
    val out = tmpDir()
    val (nd, nl) = ExtractJob.run(spark, corpus(30), None, out)
    assert(nl == 30)
    // docs: 30 roots + 10 level-1 children (doc_id%3==0) + 1 level-2 child
    // (doc 27 is a chain container)
    assert(nd == 41)
    val lineage = spark.read.parquet(s"$out/lineage")
    assert(lineage.filter(col("status") === Status.Success).count() == 30)
    assert(lineage.filter(col("docs_per_sec") > 0).count() == 30)
    val ckpt = spark.read.parquet(s"$out/checkpoints")
    assert(ckpt.filter(col("committed")).count() > 0)
    assert(ckpt.agg(sum("n_docs")).first().getLong(0) == 30)
  }

  test("resume skips terminal statuses and retries the rest") {
    import spark.implicits._
    val input = corpus(20)
    val lineage = spark.createDataFrame(Seq(
      (0L, Status.Success), (1L, Status.Timeout), (2L, Status.Fatal),
      (3L, Status.Unknown), (4L, Status.NotParsed)
    )).toDF("doc_id", "status")
    val pending = ExtractJob.resume(input, lineage).collect().map(_.doc_id).sorted
    // 0,1,2 terminal -> skipped; 3,4 retryable -> kept
    assert(pending.toSeq == (3L until 20L))
  }

  test("second run over its own lineage extracts nothing (idempotent resume)") {
    val out = tmpDir()
    val input = corpus(10)
    ExtractJob.run(spark, input, None, out)
    val lineage = spark.read.parquet(s"$out/lineage")
    val pending = ExtractJob.resume(input, lineage)
    assert(pending.count() == 0)
  }

  test("poison document yields a classified failure row, not a job failure") {
    import spark.implicits._
    // spans=null triggers an NPE inside extraction -> FAILURE_NOT_PARSED;
    // encrypted-only content -> FAILURE_NOT_DECRYPTED (retryable)
    val poisoned = spark.createDataset(Seq(
      DocIn(1, Array(SpanIn("text", "fine", "", 0))),
      DocIn(2, null),
      DocIn(3, Array(SpanIn("pdf", "ENCRYPTED:blob", "", 0)))
    ))
    val res = ExtractJob.extractPartitions(poisoned, ExtractJob.JobConfig()).collect()
    val lineages = res.flatMap(_._2)
    assert(lineages.find(_.doc_id == 2).get.status == Status.NotParsed)
    assert(lineages.find(_.doc_id == 1).get.status == Status.Success)
    assert(lineages.find(_.doc_id == 3).get.status == Status.NotDecrypted)
    // NOT_DECRYPTED is non-terminal: a resume retries it
    assert(!Status.terminal.contains(Status.NotDecrypted))
  }

  test("salted repartition spreads oversized docs and keeps all rows") {
    import spark.implicits._
    val big = DocIn(999, Array(SpanIn("text", "x" * 2000, "", 0)))
    val docs = spark.createDataset(
      (0 until 50).map(i => DocIn(i.toLong, Array(SpanIn("text", "small", "", 0)))) :+ big)
    val cfg = ExtractJob.JobConfig(partitions = 8, oversizedChars = 1000)
    val parted = ExtractJob.saltedRepartition(docs, cfg)
    assert(parted.count() == 51)
    assert(parted.rdd.getNumPartitions == 8)
  }

  test("span-parallel extraction equals the per-doc path exactly (giant-doc skew)") {
    import spark.implicits._
    // mixed corpus incl. chain containers, content-less media, bin junk,
    // encrypted spans
    val docs = (0 until 60).map(i =>
      Corpus.synthesizeOne(i.toLong, "a b c d e f g h i j k l m n")) :+
      DocIn(900, Array(SpanIn("pdf", "ENCRYPTED:x", "", 0))) :+
      DocIn(901, Array.empty[SpanIn])
    val ds = spark.createDataset(docs)
    def norm(d: DocOut) = (d.doc_id, d.parent_id, d.root_id, d.level,
      d.spans.toSeq, d.no_content_reason)
    val viaSpans = ExtractJob.extractSpanParallel(ds, ExtractJob.JobConfig(partitions = 6))
      .collect().map(norm).toSet
    val viaDocs = docs.flatMap(d => graft.core.route.Extract.explode(d)).map(norm).toSet
    assert(viaSpans == viaDocs)
  }

  test("extraction output equals the direct per-doc computation (plan-independent)") {
    import spark.implicits._
    val input = corpus(15)
    val expected = (0 until 15).flatMap(i =>
      graft.core.route.Extract.explode(
        Corpus.synthesizeOne(i.toLong, s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima unit$i")))
      .map(_.doc_id).sorted
    val got = ExtractJob.extractPartitions(
      ExtractJob.saltedRepartition(input, ExtractJob.JobConfig(partitions = 5)),
      ExtractJob.JobConfig())
      .collect().flatMap(_._1).map(_.doc_id).sorted.toSeq
    assert(got == expected)
  }
}
