package graft
import org.apache.spark.sql.SparkSession
object DeserBench {
  case class SpanA(kind: String, text: String, media_ref: String, offset: Int)
  case class DocA(doc_id: Long, spans: Array[SpanA])
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("32")
    import spark.implicits._
    val path = Bench.corpusPath(spark, "/root/testdata/sf0.1", 100, 128)
    def t(name: String)(f: => Long): Unit = {
      f // warm
      val times = (1 to 3).map { _ => val t0=System.nanoTime(); val n=f; (n, (System.nanoTime()-t0)/1e9) }
      val best = times.minBy(_._2)
      println(f"$name: ${best._1/best._2}%.0f docs/s")
    }
    t("deser Seq   ") { spark.read.parquet(path).as[graft.core.DocIn].mapPartitions(it => Iterator.single(it.size.toLong)).reduce(_+_) }
    t("deser Array ") { spark.read.parquet(path).as[DocA].mapPartitions(it => Iterator.single(it.size.toLong)).reduce(_+_) }
    t("row access  ") { spark.read.parquet(path).mapPartitions(it => Iterator.single(it.size.toLong)).reduce(_+_) }
    spark.stop()
  }
}
