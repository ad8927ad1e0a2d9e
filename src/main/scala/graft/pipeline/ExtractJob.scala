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
          try Right(Extract.explode(doc, cfg.extract))
          catch {
            case e: OutOfMemoryError => throw e
            case e: Exception => Left(e)
          }
        docsDone += 1
        bytesDone += bytesIn
        val elapsed = math.max(1e-9, (System.nanoTime() - t0) / 1e9)
        res match {
          case Right(outs) =>
            // taxonomy: undecryptable content is NOT_DECRYPTED (retryable,
            // non-terminal), everything extracted is SUCCESS
            val status = outs.headOption.map(_.no_content_reason) match {
              case Some(Reason.Encrypted) => Status.NotDecrypted
              case _ => Status.Success
            }
            val row = LineageRow(doc.doc_id, pid, status, "",
              nIn, outs.headOption.map(_.spans.size).getOrElse(0), bytesIn,
              docsDone / elapsed, bytesDone / elapsed)
            outs.iterator.map(o => (Option(o), Option.empty[LineageRow])) ++
              Iterator.single((Option.empty[DocOut], Option(row)))
          case Left(e) =>
            val row = LineageRow(doc.doc_id, pid, Status.NotParsed,
              String.valueOf(e.getMessage), nIn, 0, bytesIn,
              docsDone / elapsed, bytesDone / elapsed)
            Iterator.single((Option.empty[DocOut], Option(row)))
        }
      }
    }
  }

  /** End-to-end run: the combined table is written once into a run-scoped
    * directory, then projected APPEND-wise into `extracted/` and
    * `lineage/`, so a resumed run adds only its pending docs and never
    * clobbers previously committed output (resume stays idempotent AND
    * accumulative). Checkpoint manifests are recomputed over the full
    * lineage. Returns (total docs in extracted, total lineage rows).
    */
  def run(spark: SparkSession, input: Dataset[DocIn], lineagePrev: Option[DataFrame],
          outDir: String, cfg: JobConfig = JobConfig()): (Long, Long) = {
    val pending = lineagePrev.map(resume(input, _)).getOrElse(input)
    val parted = prepare(pending, cfg)

    val runDir = s"$outDir/combined/run-${java.util.UUID.randomUUID.toString.take(8)}"
    extractPartitions(parted, cfg).toDF("doc", "lineage")
      .write.mode(SaveMode.Overwrite).parquet(runDir)

    val c = spark.read.parquet(runDir)
    c.filter(col("doc").isNotNull).select("doc.*")
      .write.mode(SaveMode.Append).parquet(s"$outDir/extracted")
    c.filter(col("lineage").isNotNull).select("lineage.*")
      .write.mode(SaveMode.Append).parquet(s"$outDir/lineage")

    val lineageOut = spark.read.parquet(s"$outDir/lineage")
    lineageOut.groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_spans_out").as("n_spans"))
      .withColumn("committed", lit(true))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/checkpoints")

    val nd = spark.read.parquet(s"$outDir/extracted").count()
    val nl = lineageOut.count()
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
