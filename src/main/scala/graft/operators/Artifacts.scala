package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.DocIn
import graft.core.route.Extract

/** On-demand artifact retrieval — the reference's
  * `EmbeddedDocumentExtractor.extract(root, digest)`
  * (`extractor/EmbeddedDocumentExtractor.java:111-136`): fetch any embedded
  * document by its content-derived id, either from the materialized output
  * (the content-addressed cache hit, `xx/yy/<id>/raw`) or by RE-DERIVING
  * from the input (the cache-miss re-parse of the root, `:94-96,377-424`).
  *
  * The reference's crown-jewel invariant — retrieval ids are byte-identical
  * to index-time ids (`EmbeddedDocumentExtractorPstIdParityTest`) — holds
  * here by construction: ids are pure functions of content + tree position,
  * so re-derivation reproduces them exactly (asserted in ArtifactsSpec on a
  * chain-embed corpus).
  *
  * Scale: [[lookup]] is a semi-join of a tiny request set against the output
  * table — on the production Iceberg layout doc_id is the bucket key, so
  * this partition-prunes to point reads; no hint is pinned (AQE broadcasts
  * the request side). [[rederive]] re-extracts ONLY the requested roots:
  * the root filter lands before the explode, so the corpus never re-parses.
  */
object Artifacts {

  /** Rows of `extracted` whose doc_id appears in `ids` (one column,
    * doc_id) — the point-read surface over the output table.
    */
  def lookup(extracted: DataFrame, ids: DataFrame): DataFrame =
    extracted.join(ids.select("doc_id").distinct(), Seq("doc_id"), "left_semi")

  /** Cache-miss path: re-extract the requested ROOTS from the input and
    * return the target embeds. `targets` is (root_doc_id: long, doc_id:
    * string) — the root bounds the re-parse exactly like the reference
    * re-parses one root per retrieval.
    */
  def rederive(spark: SparkSession, input: Dataset[DocIn], targets: DataFrame,
               cfg: Extract.Config = Extract.DefaultConfig): DataFrame = {
    import spark.implicits._
    val roots = targets.select(col("root_doc_id").cast("long").as("doc_id")).distinct()
    val reExtracted = input
      .join(roots, Seq("doc_id"), "left_semi").as[DocIn]
      .flatMap { d =>
        Extract.explode(d, cfg).map(o =>
          (o.doc_id, o.parent_id, o.root_id, o.level,
            o.spans.map(_.text).mkString(""), o.no_content_reason))
      }
      .toDF("doc_id", "parent_id", "root_id", "level", "txt", "reason")
    reExtracted.join(targets.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
  }

  /** Page/span-range retrieval — the `Extractor.extractPages` /
    * `extractPageIndices` analog (`Extractor.java:866-911`). The reference
    * re-parses the file and slices the page list; here span offsets are
    * COLUMNS with a dense per-document order index, so a page range is a
    * pushdown predicate over the span table — a scan-pruned filter, never
    * a re-parse.
    */
  def pageRange(spanRows: DataFrame, fromOrd: Int, toOrd: Int,
                ordCol: String = "ord"): DataFrame =
    spanRows.filter(col(ordCol) >= fromOrd && col(ordCol) <= toOrd)
}
