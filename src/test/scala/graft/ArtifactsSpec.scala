package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.Artifacts

/** On-demand artifact retrieval (EmbeddedDocumentExtractor semantics):
  * point lookup over the output, cache-miss re-derivation from the input,
  * and the id-parity invariant (retrieval id == index-time id) on a
  * chain-embed corpus — the reference's PstIdParityTest analog.
  */
class ArtifactsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // chain corpus: every doc nests two levels (root -> child -> grandchild)
  private def chainCorpus(n: Int) = {
    import spark.implicits._
    spark.createDataset((0 until n).map { i =>
      DocIn(i.toLong, Array(
        SpanIn("text", s"plain $i", "", 0),
        SpanIn("media", s"chain:outer $i>inner $i", Ids.artifactRef(i.toLong), 1)))
    })
  }

  test("retrieval id == index-time id, down to the level-2 grandchild") {
    import spark.implicits._
    val input = chainCorpus(20)
    // index time: the full explode output
    val indexed = input.flatMap(d => graft.core.route.Extract.explode(d)
        .map(o => (o.doc_id, o.level, o.spans.map(_.text).mkString(""))))
      .toDF("doc_id", "level", "txt")
    // a retrieval client recomputes the GRANDCHILD digest independently
    val targets = (0 until 20).map { i =>
      val rid = Ids.rootId(i.toLong)
      val cid = Ids.embedId(s"chain:outer $i>inner $i", rid, 0)
      (i.toLong, Ids.embedId(s"chain:inner $i", cid, 0))
    }.toDF("root_doc_id", "doc_id")
    // cache hit: lookup over the output finds every grandchild
    val hits = Artifacts.lookup(indexed, targets)
    assert(hits.count() == 20)
    assert(hits.filter(col("level") === 2).count() == 20)
    assert(hits.filter(col("txt").startsWith("inner")).count() == 20)
    // cache miss: re-derivation from the input reproduces the same rows
    val redone = Artifacts.rederive(spark, input, targets)
    assert(redone.count() == 20)
    assert(redone.select("doc_id", "level", "txt").except(
      hits.select("doc_id", "level", "txt")).count() == 0)
  }

  test("rederive re-extracts ONLY the requested roots") {
    import spark.implicits._
    val input = chainCorpus(50)
    val one = Seq((7L, Ids.embedId(s"chain:outer 7>inner 7", Ids.rootId(7L), 0)))
      .toDF("root_doc_id", "doc_id")
    val out = Artifacts.rederive(spark, input, one).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("root_id") == Ids.rootId(7L))
    // the root filter sits BELOW the flatMap: the explode input is the
    // semi-joined dataset, so unrequested roots never re-parse
  }
}
