package graft
import org.apache.spark.sql.SparkSession
object ScanOnly {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("32")
    import spark.implicits._
    val path = Bench.corpusPath(spark, "/root/testdata/sf0.1", 100, 128)
    for (r <- 1 to 3) {
      // scan + deserialize DocIn, no extraction
      var t0 = System.nanoTime()
      val n1 = spark.read.parquet(path).as[graft.core.DocIn]
        .mapPartitions(it => Iterator.single(it.size.toLong)).reduce(_+_)
      val scanDeser = (System.nanoTime()-t0)/1e9
      // scan only, no object deserialization (count pushdown disabled via select)
      t0 = System.nanoTime()
      val n2 = spark.read.parquet(path).select("doc_id","spans").rdd.count()
      val scanRow = (System.nanoTime()-t0)/1e9
      println(f"ROUND $r scan+deser: ${n1/scanDeser}%.0f docs/s  scanRow: ${n2/scanRow}%.0f docs/s")
    }
    spark.stop()
  }
}
