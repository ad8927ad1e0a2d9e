package graft
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_scan_filter", "q_tpch_q1", "q_join_topn", "q_knn_brute", "q_dedup_minhash", "q_extract_spans", "q_profile", "q_dedup_jaccard", "q_knn_lsh", "q_dedup_edit", "q_ocr_cache", "q_c4_spandedup", "q_web_funnel", "q_substr_dedup")) {
      println(s"======== $q")
      println(Queries.all(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(3500))
    }
    spark.stop()
  }
}
