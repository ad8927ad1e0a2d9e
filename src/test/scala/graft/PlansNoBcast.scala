package graft

/** Proof that no O(corpus) side is broadcast-PINNED: with
  * autoBroadcastJoinThreshold=-1 a hint would still broadcast; a stats-based
  * choice falls back to shuffle joins. Used to generate PLANS.md snippets.
  */
object PlansNoBcast {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_dedup_jaccard", "q_ocr_cache", "q_dedup_edit")) {
      println(s"======== $q (autoBroadcastJoinThreshold=-1)")
      val plan = Queries.all(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      val lines = plan.linesIterator.toSeq
      println(lines.filter(l => l.contains("Join") || l.contains("Exchange")).mkString("\n"))
      val pinned = lines.count(_.contains("BroadcastExchange"))
      println(s"-> BroadcastExchange count with threshold=-1: $pinned (0 = nothing pinned)")
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }
}
