package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.core._
import graft.core.route.Extract

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full extraction pipeline's flattened span output.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.extractSpans(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.all
}

/** The operator surface. Each entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline op), expressed Spark-first.
  */
object Queries {

  /** §2.3+§2.4+§2.7: the extraction pipeline, flattened to one row per
    * output span — the span-sequence correctness surface
    * (kind, text, media_ref, order).
    */
  def extractSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Corpus.spans(spark, dir)
      .flatMap { d =>
        val out = Extract.extractDoc(d)
        out.spans.map(sp => (d.doc_id, sp.order, sp.kind, sp.text, sp.media_ref))
      }
      .toDF("doc_id", "ord", "kind", "text", "media_ref")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_extract_spans" -> ((s, dir) => extractSpans(s, dir))
  )
}

/** DuckDB oracle SQL, independently recomputing each query's expected output
  * from the raw parquet tables (never from our engine's intermediates).
  */
object Oracle {

  /** Shared prelude: per-document word split and third-points, matching
    * Corpus.splitPoints.
    */
  val docParts: String =
    """WITH p AS (
      |  SELECT doc_id, string_split(text,' ') AS w, len(string_split(text,' ')) AS m,
      |         len(string_split(text,' '))//3 AS i1, (2*len(string_split(text,' ')))//3 AS i2
      |  FROM documents
      |)""".stripMargin

  val extractSpans: String =
    s"""$docParts
       |SELECT doc_id, 0 AS ord, 'html' AS kind,
       |       'title '||doc_id||chr(10)||array_to_string(w[1:i1],' ') AS text, '' AS media_ref FROM p
       |UNION ALL SELECT doc_id, 1, 'text', array_to_string(w[i1+1:i2],' '), '' FROM p
       |UNION ALL SELECT doc_id, 2, 'pdf', array_to_string(w[i2+1:m],' '), '' FROM p
       |UNION ALL SELECT doc_id, 3, 'media',
       |       CASE WHEN doc_id%21=0 THEN '' ELSE 'ocr '||doc_id END,
       |       'art/'||substr(sha256(doc_id::VARCHAR),1,2)||'/'||sha256(doc_id::VARCHAR)
       |       FROM p WHERE doc_id%3=0
       |UNION ALL SELECT doc_id, CASE WHEN doc_id%3=0 THEN 4 ELSE 3 END, 'bin', '', ''
       |       FROM p WHERE doc_id%13=0""".stripMargin

  def all: Map[String, String] = Map(
    "q_extract_spans" -> extractSpans
  )
}
