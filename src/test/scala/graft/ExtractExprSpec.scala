package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._

/** The native extraction expression must be byte-identical to the typed
  * path (Extract.extractDoc) on every corpus branch — same twin-equality
  * contract as Code32Spec.
  */
class ExtractExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("graft_extract_spans == Extract.extractDoc span output on the corpus") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // branch coverage: media/chain/content-less/bin docs + dup offsets + empty
    val docs = (0 until 60).map(i =>
      Corpus.synthesizeOne(i.toLong, "alpha beta gamma delta epsilon zeta eta theta iota kappa")) ++
      Seq(
        DocIn(900, Array(SpanIn("text", "b", "", 5), SpanIn("text", "a", "", 5),
          SpanIn("pdf", "ENCRYPTED:x", "", 1))),
        DocIn(901, Array.empty[SpanIn]))
    val ds = spark.createDataset(docs)
    val viaExpr = ds.toDF()
      .select(col("doc_id"), explode_outer(call_function("graft_extract_spans", col("spans"))).as("s"))
      .select(col("doc_id"), col("s.kind"), col("s.text"), col("s.media_ref"), col("s.order"))
      .collect()
      .filter(_.get(1) != null)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getInt(4)))
      .toSet
    val viaTyped = docs.flatMap { d =>
      val out = graft.core.route.Extract.extractDoc(d)
      out.spans.map(s => (d.doc_id, s.kind, s.text, s.media_ref, s.order))
    }.toSet
    assert(viaExpr == viaTyped)
  }
}
