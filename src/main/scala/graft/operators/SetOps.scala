package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-side set/join operators — the reference's "solr machines"
  * (SURVEY §2.11, `solr/SolrMachine.java:33-137`) re-expressed as joins,
  * plus the resume anti-join (`Reporter.java:120-135`).
  *
  * Scale: semi/anti joins shuffle on the key; when one side is a small
  * id-set (the usual tagging case) Spark broadcasts it — we keep the join
  * key narrow (ids only) so the build side stays broadcastable.
  */
object SetOps {

  /** SolrIntersectionConsumer: tag docs whose id exists in the other core
    * -> left semi join.
    */
  def intersection(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.join(b.select(key), Seq(key), "left_semi")

  /** SolrComplementConsumer: docs whose id does NOT exist in the other
    * core -> left anti join.
    */
  def complement(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.join(b.select(key), Seq(key), "left_anti")

  /** Reporter.skip resume predicate: drop inputs whose lineage status is
    * terminal (SUCCESS / FAILURE_TIMEOUT / FAILURE_FATAL).
    */
  def resume(input: DataFrame, lineage: DataFrame, key: String): DataFrame = {
    val terminal = lineage
      .filter(col("status").isin(graft.core.Status.terminal.toSeq: _*))
      .select(key)
    input.join(terminal, Seq(key), "left_anti")
  }

  /** SolrRehashConsumer (`solr/SolrRehashConsumer.java:30-60`): regex path
    * rewrite + id re-digest.
    */
  def rehash(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(col("source"), "^src", "corpus/").as("new_path"))
      .withColumn("new_id",
        sha2(concat(col("new_path"), lit("/"), col("doc_id").cast("string")), 256))
}
