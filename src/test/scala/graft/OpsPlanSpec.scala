package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guarantees for the session's corpus ops: the rarest-terms
  * top-k must ride the WindowGroupLimit pushdown (never a full per-doc
  * full per-doc sort), and overlapping chunking must stay exchange-free.
  */
class OpsPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("rareTerms: per-doc top-3 by ascending df, WindowGroupLimit in plan") {
    val df = Queries.rareTerms(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // at most 3 per doc, ranks 1..3, df ascending within a doc
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_.getLong(2)).toSeq == sorted.map(_.getLong(2)).sorted.toSeq)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank filter to push down:\n${plan.take(1500)}")
  }

  test("chunkOverlap: stride-4 windows of 8 words, exchange-free plan") {
    val df = Queries.chunkOverlap(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // spot-check one doc's chunks against direct arithmetic
    val docId = rows.head.getLong(0)
    val text = graft.core.Corpus.documents(spark, sf).filter(s"doc_id = $docId")
      .select("text").collect().head.getString(0)
    val w = text.split(" ", -1)
    val mine = rows.filter(_.getLong(0) == docId).sortBy(_.getLong(1))
    assert(mine.length == (w.length - 1) / 4 + 1)
    mine.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(2) == w.slice(4 * i, 4 * i + 8).mkString(" "))
      assert(r.getLong(3) == math.min(8, w.length - 4 * i))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle:\n${plan.take(1500)}")
  }
}
