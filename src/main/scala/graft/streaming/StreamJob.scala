package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.core.DocIn

/** Structured Streaming surface — the reference's queue-drainer analogy
  * (`DocumentQueueDrainer.java:25,112-124`) done with real stream semantics:
  * the queue becomes a source, the poison pill becomes watermark-driven
  * state eviction.
  *
  * Two operators:
  *  - windowed counts with a watermark (tumbling 5 min, 30 min lateness);
  *  - gap-based sessionization via flatMapGroupsWithState, the streaming
  *    twin of Queries.sessionize (same 1800 s gap rule), so batch and
  *    stream results are comparable on the same input.
  */
object StreamJob {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              start_sec: Long, end_sec: Long)

  // public: the state encoder's generated code must construct it
  final case class SessionState(sessionId: Long, n: Long,
                                startSec: Long, lastSec: Long)

  val GapSeconds = 1800L

  /** Streaming extraction drainer: the reference's scanner->queue->consumer
    * loop (`DocumentQueueDrainer.java:25`) as a Structured Streaming job —
    * new span files land in `inputDir`, are extracted incrementally, and
    * the checkpoint gives exactly-once resume across restarts (the
    * Reporter-skip semantics for free; a restarted query reprocesses
    * nothing already committed).
    *
    * Runs the SAME per-partition transformation as the batch job
    * ([[graft.pipeline.ExtractJob.extractPartitions]]), so a poison document
    * yields a classified failure lineage row — never a silent drop, never a
    * wedged checkpointed query (the batch would replay the poison on every
    * restart). Output rows are (doc, lineage) nullable structs, identical to
    * the batch combined table.
    */
  def extractStream(spark: SparkSession, inputDir: String, checkpointDir: String,
                    outDir: String,
                    cfg: graft.pipeline.ExtractJob.JobConfig =
                      graft.pipeline.ExtractJob.JobConfig()): StreamingQuery = {
    import spark.implicits._
    val schema = spark.emptyDataset[DocIn].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4) // bounded micro-batches = backpressure
      .parquet(inputDir)
      .as[DocIn]
    graft.pipeline.ExtractJob.extractPartitions(stream, cfg)
      .toDF("doc", "lineage")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming RAW-FILE ingestion — the reference's directory Scanner
    * feeding its queue continuously (`Scanner.java` + `DocumentQueueDrainer`)
    * as one Structured Streaming job over the binaryFile source: real files
    * (PDF/zip/msg/eml/text bytes) landing in `inputDir` are magic-byte
    * sniffed, extracted, and container-EXPLODED incrementally, with the
    * checkpoint giving exactly-once resume. Same shared mapping as the
    * batch walk ([[graft.sources.Ingest.toDocIn]]) and the same
    * per-partition transformation as the batch job, so stream output is
    * row-identical to a batch run over the same files.
    */
  def ingestStream(spark: SparkSession, inputDir: String, checkpointDir: String,
                   outDir: String, glob: String = "*",
                   cfg: graft.pipeline.ExtractJob.JobConfig =
                     graft.pipeline.ExtractJob.JobConfig()): StreamingQuery = {
    import spark.implicits._
    import graft.sources.Ingest
    val base = spark.readStream
      .format("binaryFile")
      .schema(Ingest.BinaryFileSchema)
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true") // batch/stream row identity: both walks descend
      .option("maxFilesPerTrigger", 16) // bounded micro-batches = backpressure
      .load(inputDir)
    val docs = base
      .filter(!Ingest.junkNameFilter(col("path"), inputDir))
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (p, b) => Ingest.toDocIn(p, b) }
    graft.pipeline.ExtractJob.extractPartitions(docs, cfg)
      .toDF("doc", "lineage")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming exact deduplication — the DocumentQueue.removeDuplicates
    * semantics on an unbounded stream: state is bounded by the watermark
    * (a duplicate arriving within the lateness horizon is dropped; state
    * older than the watermark is evicted), so the operator runs forever at
    * O(watermark-window) memory instead of O(stream) — the only dedup
    * contract that survives an unbounded source.
    */
  final case class StreamDocIn(doc_id: Long, ts: Timestamp, text: String)
  final case class NearDup(doc_id: Long, dup_of: Long, bucket: String)
  final case class BucketOwner(owner: Long, lastSec: Long)

  /** Streaming MinHash+LSH near-dup — the streaming twin of
    * `Dedup.minhashPairs`, built on the SAME per-document signature and
    * band-key functions so batch and stream agree on candidates. Each doc
    * explodes to its band buckets; per-bucket state keeps the FIRST-SEEN
    * owner id (watermark-bounded, timeout-evicted — state never grows past
    * the window), and every later arrival emits (doc, dup_of=owner). A doc
    * colliding in several buckets emits once per bucket; consumers take
    * min(dup_of) per doc, like the batch pair generator's distinct.
    * In-batch arrivals process in doc_id order, so parallel == serial.
    */
  def nearDupStream(docs: Dataset[StreamDocIn]): Dataset[NearDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.Dedup
    docs
      .withWatermark("ts", "1 hour")
      .flatMap(d => Dedup.bandKeys(Dedup.minhashSig(d.text))
        .map(b => (b, d.doc_id, d.ts)))
      .toDF("bucket", "doc_id", "ts")
      .withWatermark("ts", "1 hour")
      .as[(String, Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketOwner, NearDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: String, batch: Iterator[(String, Long, Timestamp)],
         state: GroupState[BucketOwner]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = batch.toVector.sortBy(_._2) // doc_id order: deterministic
            var cur = state.getOption
            val out = Vector.newBuilder[NearDup]
            rows.foreach { case (_, id, t) =>
              val sec = t.getTime / 1000
              cur match {
                case Some(o) =>
                  if (id != o.owner) out += NearDup(id, o.owner, bucket)
                  cur = Some(o.copy(lastSec = math.max(o.lastSec, sec)))
                case None =>
                  cur = Some(BucketOwner(id, sec))
              }
            }
            cur.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 3600 * 1000,
                o.lastSec * 1000 + 3600 * 1000))
            }
            out.result().iterator
          }
      }
  }

  def dedupStream(events: Dataset[Event]): Dataset[Event] =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Tumbling 5-minute windowed counts with a 30-minute watermark. */
  def windowedCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win"),
        col("event_type"), col("n"), col("cents"))

  /** Gap-based sessionization with explicit state: emits a session row when
    * the gap rule closes it (or on timeout). Matches Queries.sessionize on
    * in-order input.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n > 0) {
              // close the open session but KEEP a sentinel (n=0) carrying
              // the next session ordinal, so a user returning after an
              // eviction doesn't restart numbering at 1; the sentinel
              // itself times out one gap later and is then removed.
              state.update(SessionState(s.sessionId + 1, 0, s.lastSec, s.lastSec))
              // must stay above the current watermark or set() throws
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + GapSeconds * 1000,
                s.lastSec * 1000 + 2 * GapSeconds * 1000))
              Iterator.single(SessionOut(userId, s.sessionId, s.n, s.startSec, s.lastSec))
            } else {
              state.remove()
              Iterator.empty
            }
          } else {
            val sorted = batch.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Vector.newBuilder[SessionOut]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if s.n > 0 && sec - s.lastSec <= GapSeconds =>
                  // late cross-batch events may have sec < lastSec: widen the
                  // session bounds instead of regressing them
                  cur = Some(s.copy(n = s.n + 1,
                    startSec = math.min(s.startSec, sec),
                    lastSec = math.max(s.lastSec, sec)))
                case Some(s) if s.n > 0 =>
                  closed += SessionOut(userId, s.sessionId, s.n, s.startSec, s.lastSec)
                  cur = Some(SessionState(s.sessionId + 1, 1, sec, sec))
                case Some(sentinel) => // n == 0: resume numbering after eviction
                  cur = Some(SessionState(sentinel.sessionId, 1, sec, sec))
                case None =>
                  cur = Some(SessionState(1, 1, sec, sec))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSec * 1000 + GapSeconds * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
