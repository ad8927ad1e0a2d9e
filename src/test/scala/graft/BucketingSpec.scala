package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Demonstrates the north rule's "explicit bucketed partitioning on
  * doc_id": two tables bucketed on the same key join WITHOUT any shuffle
  * exchange — on a 10^12-doc Iceberg table this is what makes the
  * extraction join/resume layer scan-local.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("join of two doc_id-bucketed tables is exchange-free") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val lineage = (0L until 1000L by 2).map(i => (i, "SUCCESS")).toDF("doc_id", "status")

    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_docs_bucketed")
    lineage.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_lineage_bucketed")

    // disable broadcast so the join exercises bucket co-location (at
    // 10^12-doc scale neither side broadcasts anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_docs_bucketed")
        .join(spark.table("graft_lineage_bucketed"), Seq("doc_id"), "left_anti")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, got:\n$plan")
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
