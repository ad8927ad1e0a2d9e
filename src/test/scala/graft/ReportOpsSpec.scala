package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.ReportOps

class ReportOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("retryQueue: latest-terminal wins, new docs are not retries") {
    import spark.implicits._
    val input = spark.createDataset((1L to 5L).map(i =>
      DocIn(i, Array(SpanIn("text", s"t$i", "", 0)))))
    // 1: failed then succeeded (terminal wins, no retry); 2: failed only;
    // 3: succeeded; 4: no lineage (new, not a retry); 5: timeout (terminal)
    val lineage = Seq(
      (1L, Status.NotParsed), (1L, Status.Success),
      (2L, Status.NotDecrypted),
      (3L, Status.Success),
      (5L, Status.Timeout)
    ).toDF("doc_id", "status")
    val retry = ReportOps.retryQueue(input, lineage).collect().map(_.doc_id).toSeq
    assert(retry == Seq(2L))
  }

  test("cleanNonTerminal keeps exactly the terminal log") {
    import spark.implicits._
    val lineage = Seq(
      (1L, Status.Success), (2L, Status.NotParsed), (3L, Status.Timeout),
      (4L, Status.Fatal), (5L, Status.Unknown)
    ).toDF("doc_id", "status")
    val kept = ReportOps.cleanNonTerminal(lineage).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("report JSON dump/load round-trips the lineage; inspect summarizes it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-report").toString + "/r"
    val lineage = Seq(
      ("a1", "SUCCESS"), ("a2", "SUCCESS"), ("a3", "FAILURE_NOT_PARSED"),
      ("a4", "FAILURE_TIMEOUT")).toDF("doc_id", "status")
    ReportOps.dumpReport(lineage, dir)
    val loaded = ReportOps.loadReport(spark, dir, lineage.schema)
    assert(loaded.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      lineage.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq)
    val hist = ReportOps.inspectDump(spark, dir, lineage.schema).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hist == Map("SUCCESS" -> 2L, "FAILURE_NOT_PARSED" -> 1L, "FAILURE_TIMEOUT" -> 1L))
  }

  test("queue JSON dump/load round-trips the spans queue (reference dump/load tasks)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-queue").toString + "/q"
    val queue = spark.createDataset((0 until 20).map(i =>
      Corpus.synthesizeOne(i.toLong, "a b c d e f g h i")))
    ReportOps.dumpQueue(queue, dir)
    val loaded = ReportOps.loadQueue(spark, dir).collect()
      .map(d => (d.doc_id, d.spans.toSeq)).sortBy(_._1).toSeq
    val orig = queue.collect().map(d => (d.doc_id, d.spans.toSeq)).sortBy(_._1).toSeq
    assert(loaded == orig)
  }
}
