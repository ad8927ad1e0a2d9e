package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{DocIn, Status}

/** Report/lineage maintenance — the reference's report CLI surface
  * (`ReportMap` maintenance commands: status counts, cleaning retryable
  * rows, rebuilding the retry queue) as library functions over the lineage
  * table. All are metadata-narrow: they read (doc_id, status) projections,
  * never document payloads.
  */
object ReportOps {

  /** Status histogram — the report summary command. */
  def statusCounts(lineage: DataFrame): DataFrame =
    lineage.groupBy("status").agg(count(lit(1)).as("n"))

  /** The 'clean' maintenance op: keep only terminal rows (retryable
    * failures are dropped so the next run re-attempts them from scratch).
    */
  def cleanNonTerminal(lineage: DataFrame): DataFrame =
    lineage.filter(col("status").isin(Status.terminal.toSeq: _*))

  /** The retry queue: input docs whose LATEST known state is a non-terminal
    * failure (docs with no lineage at all are new, not retries).
    */
  def retryQueue(input: Dataset[DocIn], lineage: DataFrame): Dataset[DocIn] = {
    val spark = input.sparkSession
    import spark.implicits._
    val nonTerminal = lineage
      .filter(!col("status").isin(Status.terminal.toSeq: _*))
      .select(col("doc_id").cast("long").as("doc_id")).distinct()
    val terminal = lineage
      .filter(col("status").isin(Status.terminal.toSeq: _*))
      .select(col("doc_id").cast("long").as("doc_id")).distinct()
    input
      .join(nonTerminal, Seq("doc_id"), "left_semi")
      .join(terminal, Seq("doc_id"), "left_anti") // a later terminal attempt wins
      .as[DocIn]
  }

  /** JSON queue dump/load (the reference's queue dump/load tasks,
    * `DumpQueueTask`/`LoadQueueTask`): the spans queue serialized as
    * newline-delimited JSON and read back with the DocIn schema enforced.
    */
  def dumpQueue(queue: Dataset[DocIn], path: String): Unit =
    queue.toDF().write.mode("overwrite").json(path)

  def loadQueue(spark: SparkSession, path: String): Dataset[DocIn] = {
    import spark.implicits._
    spark.read.schema(spark.emptyDataset[DocIn].schema).json(path).as[DocIn]
  }

  /** JSON report dump/load (`DumpReportTask`/`LoadReportTask`): the lineage
    * table serialized as newline-delimited JSON and read back with the
    * WRITER's schema enforced (a dump is a contract, not schema inference —
    * a malformed line surfaces as nulls against the declared columns, never
    * as a silently different shape).
    */
  def dumpReport(lineage: DataFrame, path: String): Unit =
    lineage.write.mode("overwrite").json(path)

  def loadReport(spark: SparkSession, path: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** `InspectDumpTask`: the dump summarized without loading payloads —
    * row count + status histogram off the same narrow projection.
    */
  def inspectDump(spark: SparkSession, path: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame =
    statusCounts(loadReport(spark, path, schema))
}
