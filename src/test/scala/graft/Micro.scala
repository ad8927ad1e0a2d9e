package graft
import graft.core._
import graft.core.route.Extract
object Micro {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val rows = Corpus.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id","text").collect().map(r => (r.getLong(0), r.getString(1)))
    spark.stop()
    val docs = rows.map { case (id,t) => Corpus.synthesizeOne(id,t) }
    def time(name: String)(f: => Unit): Unit = {
      // warm
      f; f
      val t0 = System.nanoTime(); f; f; f
      println(f"$name: ${(System.nanoTime()-t0)/3e9/rows.length*1e6}%.2f us/doc")
    }
    time("synthesize") { rows.foreach { case (id,t) => Corpus.synthesizeOne(id,t) } }
    time("extractDoc") { docs.foreach(d => Extract.extractDoc(d)) }
    time("explode   ") { docs.foreach(d => Extract.explode(d)) }
    val htmls = docs.map(_.spans.head.text)
    val pdfs = docs.map(_.spans(2).text)
    time("htmlOnly  ") { htmls.foreach(h => graft.core.html.HtmlExtractor.mainText(h)) }
    time("pdfOnly   ") { pdfs.foreach(p => graft.core.pdf.PdfLayout.text(p)) }
    time("sha256x2  ") { docs.foreach(d => Ids.rootId(d.doc_id)) }
  }
}
