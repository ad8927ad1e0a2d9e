package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamJob
import graft.streaming.StreamJob.Event

class StreamJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("windowed counts with watermark aggregate into 5-minute buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = StreamJob.windowedCounts(src.toDS())
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append).start()
    try {
      src.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(100), 1, "click", 2.0),
        Event(3, ts(400), 2, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      src.addData(Event(9, ts(100000), 9, "late", 0.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.contains(("1970-01-01 00:00:00", "click", 2L, 300L)))
      assert(rows.contains(("1970-01-01 00:05:00", "view", 1L, 300L)))
    } finally q.stop()
  }

  test("streaming extraction drains incrementally and resumes exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.core.Corpus
    val base = java.nio.file.Files.createTempDirectory("graft-stream")
    val (in, ckpt, out) = (s"$base/in", s"$base/ckpt", s"$base/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    def addBatch(ids: Range): Unit =
      spark.createDataset(ids.map(i =>
        Corpus.synthesizeOne(i.toLong, "a b c d e f g h i j k l")))
        .write.mode("append").parquet(in)

    addBatch(0 until 10)
    val q1 = graft.streaming.StreamJob.extractStream(spark, in, ckpt, out)
    q1.awaitTermination() // AvailableNow: drains what exists, then stops
    val docs1 = spark.read.parquet(out).filter(col("doc").isNotNull)
    // 10 roots + children for doc_id%3==0 (0,3,6,9)
    assert(docs1.count() == 14)

    // second batch lands; a RESTARTED query must process only the new files
    addBatch(10 until 20)
    val q2 = graft.streaming.StreamJob.extractStream(spark, in, ckpt, out)
    q2.awaitTermination()
    val after = spark.read.parquet(out).filter(col("doc").isNotNull)
    // + 10 roots + 3 children (12,15,18), nothing reprocessed or duplicated
    assert(after.count() == 27)
    assert(after.select("doc.doc_id").distinct().count() == 27)
    // per-doc lineage rides the same stream: one row per input doc
    val lineage = spark.read.parquet(out).filter(col("lineage").isNotNull)
    assert(lineage.count() == 20)
  }

  test("streaming raw-file ingestion sniffs, explodes containers, resumes") {
    import org.apache.spark.sql.functions.col
    import java.nio.charset.StandardCharsets.UTF_8
    import java.nio.file.{Files, Paths}
    import graft.core.office.Msg
    import graft.sources.Archive
    val base = Files.createTempDirectory("graft-stream-ingest")
    val (in, ckpt, out) = (s"$base/in", s"$base/ckpt", s"$base/out")
    Files.createDirectories(Paths.get(in))

    Files.write(Paths.get(in, "plain.txt"), "hello stream world again".getBytes(UTF_8))
    Files.write(Paths.get(in, "arch.zip"),
      Archive.zipBytes(Seq(("a.txt", "alpha".getBytes(UTF_8)), ("b.txt", "beta".getBytes(UTF_8)))))
    Files.write(Paths.get(in, "mail.msg"), Msg.build(Msg.MsgDoc(
      "subj", "from@example.com", "msg body",
      Vector(Msg.FileAtt("att.txt", "attached".getBytes(UTF_8))))))
    Files.write(Paths.get(in, "Thumbs.db"), Array[Byte](1, 2, 3)) // junk: excluded

    val q1 = StreamJob.ingestStream(spark, in, ckpt, out)
    q1.awaitTermination()
    val docs1 = spark.read.parquet(out).filter(col("doc").isNotNull).select("doc.*")
    // 3 roots (junk excluded) + 2 zip children + 1 msg attachment child
    assert(docs1.count() == 6)
    val texts = docs1.collect().map(r =>
      r.getAs[Seq[org.apache.spark.sql.Row]]("spans").map(_.getString(1)).mkString).toSet
    assert(texts.contains("hello stream world again") && texts.contains("alpha") &&
      texts.contains("beta") && texts.contains("msg body") && texts.contains("attached"))

    // a new file lands; the restarted query processes ONLY it
    Files.write(Paths.get(in, "late.txt"), "late arrival".getBytes(UTF_8))
    val q2 = StreamJob.ingestStream(spark, in, ckpt, out)
    q2.awaitTermination()
    val docs2 = spark.read.parquet(out).filter(col("doc").isNotNull)
    assert(docs2.count() == 7)
    assert(docs2.select("doc.doc_id").distinct().count() == 7) // no reprocessing
  }

  test("streaming poison doc yields a classified failure record, stream continues") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.core.{Corpus, DocIn, SpanIn, Status}
    val base = java.nio.file.Files.createTempDirectory("graft-stream-poison")
    val (in, ckpt, out) = (s"$base/in", s"$base/ckpt", s"$base/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    spark.createDataset(Seq(
      Corpus.synthesizeOne(1L, "a b c d e f"),
      DocIn(2L, Array(SpanIn("html", "POISON:tagsoup", "", 0))),
      Corpus.synthesizeOne(4L, "g h i j k l")))
      .write.mode("append").parquet(in)
    val q = graft.streaming.StreamJob.extractStream(spark, in, ckpt, out)
    q.awaitTermination()
    val lineage = spark.read.parquet(out)
      .filter(col("lineage").isNotNull).select("lineage.*")
    // the poison doc is RECORDED (batch taxonomy), not silently dropped
    assert(lineage.filter(col("doc_id") === 2 &&
      col("status") === Status.NotParsed).count() == 1)
    // and the stream still progressed: the healthy docs extracted
    assert(spark.read.parquet(out).filter(col("doc").isNotNull)
      .select("doc.doc_id").distinct().count() == 2)
  }

  test("streaming near-dup flags copies against in-batch AND prior-batch owners") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[StreamJob.StreamDocIn]
    val q = StreamJob.nearDupStream(src.toDS())
      .writeStream.format("memory").queryName("neardup").outputMode(OutputMode.Append).start()
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    try {
      // batch 1: an original, its in-batch copy, and an unrelated doc
      src.addData(
        StreamJob.StreamDocIn(10, ts(100), body),
        StreamJob.StreamDocIn(11, ts(110), body),
        StreamJob.StreamDocIn(20, ts(120), other))
      q.processAllAvailable()
      // batch 2: a copy arriving later must match batch 1's owner state
      src.addData(StreamJob.StreamDocIn(30, ts(200), body))
      q.processAllAvailable()
      val dups = spark.table("neardup").as[StreamJob.NearDup].collect()
        .map(d => (d.doc_id, d.dup_of)).distinct.sorted.toSeq
      assert(dups == Seq((11L, 10L), (30L, 10L))) // 20 never flags
    } finally q.stop()
  }

  test("streaming dedup drops watermark-window duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = StreamJob.dedupStream(src.toDS())
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1, ts(100), 1, "a", 0), Event(2, ts(150), 1, "a", 0))
      q.processAllAvailable()
      // same event_id replayed in a LATER batch, still inside the watermark
      src.addData(Event(1, ts(160), 1, "a", 0), Event(3, ts(200), 2, "b", 0))
      q.processAllAvailable()
      val ids = spark.table("dedup").as[Event].collect().map(_.event_id).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // each id exactly once
    } finally q.stop()
  }

  test("streaming sessionization matches the batch gap rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = StreamJob.sessionize(src.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append).start()
    try {
      // user 1: two sessions separated by a >30min gap. Start past t=0:
      // rows at exactly the initial watermark are dropped by the
      // pre-state-function late filter (ts > watermark).
      src.addData(
        Event(1, ts(10), 1, "a", 0), Event(2, ts(70), 1, "a", 0),
        Event(3, ts(70 + 1801 + 60), 1, "a", 0))
      q.processAllAvailable()
      // push watermark forward to time out the open session; the timeout
      // fires in the batch AFTER the watermark advances, so nudge twice
      src.addData(Event(9, ts(1000000), 2, "z", 0))
      q.processAllAvailable()
      src.addData(Event(10, ts(1000001), 2, "z", 0))
      q.processAllAvailable()
      val rows = spark.table("sess").as[StreamJob.SessionOut].collect()
        .filter(_.user_id == 1).sortBy(_.session_id)
      assert(rows.length == 2)
      assert(rows(0).n_events == 2 && rows(0).start_sec == 10 && rows(0).end_sec == 70)
      assert(rows(1).n_events == 1 && rows(1).start_sec == 1931)
    } finally q.stop()
  }
}
