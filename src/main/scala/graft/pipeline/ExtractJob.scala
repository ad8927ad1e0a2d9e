package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.core.route.Extract

/** The production extraction job — SURVEY §3.1's Spark equivalent:
  *
  * read spans table -> anti-join lineage (exact resume) -> salted
  * repartition on doc_id (skew handling) -> mapPartitions(extract) ->
  * write extracted spans + lineage + per-partition checkpoint manifests.
  *
  * Scale design (the 100 TB story):
  *  - ONE shuffle in the whole job (the salted repartition), moving only
  *    rows that still need processing: the resume anti-join runs first,
  *    against the narrow terminal-id projection of the lineage table;
  *  - ONE extraction pass: doc rows and lineage rows are emitted together
  *    from the same mapPartitions and written once as a combined table
  *    (two nullable structs); `extracted/` and `lineage/` are then cheap
  *    columnar re-projections (on Iceberg they would simply be views);
  *  - skew: a 10-GB-span document can't be split by Spark, so rows are
  *    salted by a cheap size estimate — oversized docs spread across the
  *    salt domain, the reference's PST folder fan-out
  *    (`Extractor.java:142-146`) lifted to partition level;
  *  - lineage rows carry per-partition docs/sec and bytes/sec (north rule)
  *    from monotonic nanoTime deltas inside the partition;
  *  - checkpoint manifests: one row per partition derived from the lineage
  *    that actually landed (read back after commit), so a re-run can prove
  *    which partitions committed — Iceberg snapshot-commit analog;
  *  - resume is idempotent: re-running after a partial failure re-extracts
  *    only docs without terminal lineage (Reporter.skip semantics,
  *    `Reporter.java:120-135`).
  */
object ExtractJob {

  final case class JobConfig(
      partitions: Int = 32,
      oversizedChars: Int = 1 << 20, // salting threshold on total span chars
      extract: Extract.Config = Extract.DefaultConfig,
      /** false when the input is already bucketed on doc_id (the production
        * Iceberg layout): extraction then runs IN the scan stage with no
        * shuffle at all — the scale-correct plan for an embarrassingly
        * parallel map. true re-balances unbucketed/skewed inputs via the
        * salted repartition.
        */
      shuffleInput: Boolean = true
  )

  private def prepare(input: Dataset[DocIn], cfg: JobConfig): Dataset[DocIn] =
    if (cfg.shuffleInput) saltedRepartition(input, cfg) else input

  /** Resume filter: drop docs whose lineage status is terminal. The lineage
    * side is projected to ids before the join so the build side stays
    * narrow (and broadcastable when the terminal set is small).
    */
  def resume(input: Dataset[DocIn], lineage: DataFrame): Dataset[DocIn] = {
    val spark = input.sparkSession
    import spark.implicits._
    val terminal = lineage
      .filter(col("status").isin(Status.terminal.toSeq: _*))
      .select(col("doc_id").cast("long").as("doc_id"))
    input.join(terminal, Seq("doc_id"), "left_anti").as[DocIn]
  }

  /** Salted repartition: normal docs shuffle on doc_id; oversized docs are
    * additionally spread over a salt domain so one hot doc can't pin a
    * partition (AQE's skew handling only helps joins; this is the map-side
    * equivalent).
    */
  def saltedRepartition(input: Dataset[DocIn], cfg: JobConfig): Dataset[DocIn] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .withColumn("_sz", expr("aggregate(spans, 0L, (acc, s) -> acc + length(s.text))"))
      .withColumn("_salt",
        // deterministic (pure function of doc_id): a position-dependent salt
        // would re-route rows across task retries and duplicate/lose docs
        when(col("_sz") > cfg.oversizedChars,
          pmod(hash(col("doc_id"), lit("oversized-salt")), lit(cfg.partitions)))
          .otherwise(lit(0)))
      .repartition(cfg.partitions, col("doc_id"), col("_salt"))
      .drop("_sz", "_salt").as[DocIn]
  }

  /** Span-parallel extraction — the real skew answer for a GIANT document
    * (SURVEY §7.4 hard part 4: one 10-GB-spans row cannot be split by
    * Spark's row-level parallelism). The document's SPANS are exploded to
    * individual rows, spread across partitions by (doc_id, offset) — this
    * is the salted repartitioning that actually distributes one document's
    * work — extracted span-locally, and reassembled per doc_id with order
    * restored from offsets. Output is byte-identical to [[Extract.explode]]
    * (asserted in tests); cost is one extra shuffle, so it is the path for
    * the oversized tail, not the default.
    */
  def extractSpanParallel(input: Dataset[DocIn], cfg: JobConfig): Dataset[DocOut] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .flatMap { d =>
        val spans = if (d.spans == null) Array.empty[graft.core.SpanIn] else d.spans
        if (spans.isEmpty)
          // sentinel keeps span-less docs visible to the reassembly
          Iterator.single((d.doc_id, "", "", "", Int.MinValue))
        else spans.iterator.map(s =>
          (d.doc_id, s.kind, s.text, if (s.media_ref == null) "" else s.media_ref, s.offset))
      }
      .repartition(cfg.partitions, col("_1"), col("_5"))
      .as[(Long, String, String, String, Int)]
      .map { case (id, kind, text, ref, off) =>
        val (txt, why) = Extract.extractSpan(kind, text, cfg.extract)
        // raw media content rides along: children need it for ids/spawning
        val raw = if (kind == "media") { if (text == null) "" else text } else ""
        (id, kind, txt, ref, off, raw, why)
      }
      .groupByKey(_._1)
      .flatMapGroups { (id: Long, it: Iterator[(Long, String, String, String, Int, String, String)]) =>
        val rows = it.toArray.filter(_._5 != Int.MinValue)
          .sortBy(_._5).take(cfg.extract.maxSpans)
        var anyContent = false
        var anyEncrypted = false
        val spans = new Array[SpanOut](rows.length)
        var i = 0
        while (i < rows.length) {
          val (_, kind, txt, ref, _, _, why) = rows(i)
          if (txt.nonEmpty) anyContent = true
          if (why == Reason.Encrypted) anyEncrypted = true
          spans(i) = SpanOut(kind, txt, ref, i)
          i += 1
        }
        val reason =
          if (!anyContent && anyEncrypted) Reason.Encrypted
          else if (rows.isEmpty || !anyContent) Reason.Empty
          else ""
        val rid = graft.core.Ids.rootId(id)
        val root = DocOut(rid, "", rid, 0, spans, reason)
        val mediaContents = rows.iterator.filter(_._2 == "media").map(_._6).toSeq
        val (children, _) = Extract.spawnEmbeds(mediaContents, rid, cfg.extract)
        Iterator.single(root) ++ children.iterator
      }
  }

  /** The core typed transformation, ONE pass: per-partition batched
    * extraction emitting doc rows (Some(doc), None) and one lineage row
    * (None, Some(lineage)) per input document. A poison row yields a
    * classified failure lineage row, never a task failure (error taxonomy,
    * `Extractor.java:785-826`); VM errors escape for Spark's retry/
    * blacklist machinery (`ExtractionErrors` semantics).
    */
  def extractPartitions(input: Dataset[DocIn], cfg: JobConfig)
  : Dataset[(Option[DocOut], Option[LineageRow])] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val t0 = System.nanoTime()
      var docsDone = 0L
      var bytesDone = 0L
      it.flatMap { doc =>
        val bytesIn =
          if (doc.spans == null) 0L
          else doc.spans.iterator
            .map(s => if (s.text == null) 0L else s.text.length.toLong).sum
        val nIn = if (doc.spans == null) 0 else doc.spans.size
        val res =
          try Right(Extract.explodeCounted(doc, cfg.extract))
          catch {
            case e: OutOfMemoryError => throw e
            case e: Exception => Left(e)
          }
        docsDone += 1
        bytesDone += bytesIn
        val elapsed = math.max(1e-9, (System.nanoTime() - t0) / 1e9)
        res match {
          case Right((outs, skipped)) =>
            // taxonomy: undecryptable content is NOT_DECRYPTED (retryable,
            // non-terminal), everything extracted is SUCCESS
            val status = outs.headOption.map(_.no_content_reason) match {
              case Some(Reason.Encrypted) => Status.NotDecrypted
              case _ => Status.Success
            }
            val row = LineageRow(doc.doc_id, pid, status,
              if (skipped > 0) s"embeds_skipped=$skipped" else "",
              nIn, outs.iterator.map(_.spans.length).sum, bytesIn,
              docsDone / elapsed, bytesDone / elapsed)
            // doc rows are emitted ONLY for SUCCESS: a retryable status must
            // not append output that a later retry would append again
            val docRows =
              if (status == Status.Success)
                outs.iterator.map(o => (Option(o), Option.empty[LineageRow]))
              else Iterator.empty
            docRows ++ Iterator.single((Option.empty[DocOut], Option(row)))
          case Left(e) =>
            val row = LineageRow(doc.doc_id, pid, Status.NotParsed,
              String.valueOf(e.getMessage), nIn, 0, bytesIn,
              docsDone / elapsed, bytesDone / elapsed)
            Iterator.single((Option.empty[DocOut], Option(row)))
        }
      }
    }
  }

  /** End-to-end run. Commit protocol:
    *
    *  1. extraction writes ONE combined table into a run-scoped directory —
    *     the atomic unit (parquet job commit; Iceberg snapshot analog);
    *     run dirs are append-only and are the source of truth;
    *  2. `extracted/` and `lineage/` are REBUILT projections over all run
    *     dirs, so a crash between projection writes can never desync
    *     resume state from committed output: the next run rebuilds both
    *     from the same truth. Extracted rows dedupe on doc_id (re-extracted
    *     rows are bit-identical by determinism); lineage keeps every
    *     attempt (it is a log — retries are part of the record);
    *  3. checkpoint manifests carry (run_id, partition_id) so each run's
    *     committed partitions are provable — appended, never rewritten.
    *
    * Returns (total docs in extracted, total lineage rows).
    */
  def run(spark: SparkSession, input: Dataset[DocIn], lineagePrev: Option[DataFrame],
          outDir: String, cfg: JobConfig = JobConfig()): (Long, Long) = {
    val pending = lineagePrev.map(resume(input, _)).getOrElse(input)
    val parted = prepare(pending, cfg)

    val runId = java.util.UUID.randomUUID.toString.take(8)
    val runDir = s"$outDir/combined/run-$runId"
    extractPartitions(parted, cfg).toDF("doc", "lineage")
      .write.mode(SaveMode.Overwrite).parquet(runDir)

    val all = spark.read.parquet(s"$outDir/combined/run-*")
    all.filter(col("doc").isNotNull).select("doc.*")
      .dropDuplicates("doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/extracted")
    all.filter(col("lineage").isNotNull).select("lineage.*")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineage")

    spark.read.parquet(runDir)
      .filter(col("lineage").isNotNull).select("lineage.*")
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_spans_out").as("n_spans"))
      .withColumn("run_id", lit(runId))
      .withColumn("committed", lit(true))
      .write.mode(SaveMode.Append).parquet(s"$outDir/checkpoints")

    val nd = spark.read.parquet(s"$outDir/extracted").count()
    val nl = spark.read.parquet(s"$outDir/lineage").count()
    (nd, nl)
  }

  /** Throughput-only variant for the bench harness: same plan shape, no
    * intermediate writes — extraction forced by a count over the combined
    * rows.
    */
  def runCount(spark: SparkSession, input: Dataset[DocIn], cfg: JobConfig = JobConfig()): Long =
    extractPartitions(prepare(input, cfg), cfg)
      .filter(_._2.isDefined).count()
}
