package graft

/** Round-6 measurement harness (guide §1) — NOT part of the frozen driver
  * contract in [[Bench]]: per-query isolation with BOTH actions (the
  * driver's `count()` and the guide §1.4 `noop` sink, which computes every
  * column and cannot be pruned), min-of-N timing, and optional
  * `.explain("formatted")` dumps for the plans/r06 evidence files.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra q_substr_dedup q_ppl_buckets"
  * Env:
  *   SPARK_GRAFT_SF_DIR       data dir        (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS         local[N]        (default 32)
  *   SPARK_GRAFT_EXTRA_REPEAT per-action runs (default 3, min is reported)
  *   SPARK_GRAFT_PLAN_DIR     if set, write <dir>/<query>_<suffix>.txt plans
  *   SPARK_GRAFT_PLAN_SUFFIX  plan file suffix (default "before")
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPEAT", "3").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = Bench.session(cpus)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      spark.sparkContext.setJobDescription(n)
      val cnt = (1 to repeat).map(_ => time(fn(spark, sfDir).count(): Unit))
      val noop = (1 to repeat).map(_ => time(
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()))
      planDir.foreach { d =>
        val p = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"${n}_$suffix.txt"),
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      println(f"$n%-24s count_min=${cnt.min}%.3f noop_min=${noop.min}%.3f " +
        s"count=${cnt.map(t => f"$t%.3f").mkString(",")} " +
        s"noop=${noop.map(t => f"$t%.3f").mkString(",")}")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
