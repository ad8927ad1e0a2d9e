package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Sink

class SinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sink").resolve("t").toString

  test("replaceTrees: stale children deleted, other trees untouched") {
    import spark.implicits._
    val path = tmp()
    Seq(
      ("r1", "", "r1", 0), ("c1a", "r1", "r1", 1), ("c1b", "r1", "r1", 1),
      ("r2", "", "r2", 0), ("c2a", "r2", "r2", 1)
    ).toDF("doc_id", "parent_id", "root_id", "level")
      .write.parquet(path)

    val replacement = Seq(("r1", "", "r1", 0), ("c1new", "r1", "r1", 1))
      .toDF("doc_id", "parent_id", "root_id", "level")
    Sink.replaceTrees(spark, path, Seq("r1"), replacement)

    val after = spark.read.parquet(path).collect()
      .map(r => r.getString(0)).sorted.toSeq
    // c1a/c1b gone (stale-children delete), r1 tree replaced, r2 intact
    assert(after == Seq("c1new", "c2a", "r1", "r2"))
  }

  test("mergePaths: existing paths merged distinct, new docs inserted") {
    import spark.implicits._
    val path = tmp()
    Seq(("d1", Seq("/a")), ("d2", Seq("/b")))
      .toDF("doc_id", "paths").write.parquet(path)

    Sink.mergePaths(spark, path,
      Seq(("d1", Seq("/a", "/c")), ("d3", Seq("/z"))).toDF("doc_id", "paths"))

    val after = spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    assert(after("d1") == List("/a", "/c")) // merged, distinct
    assert(after("d2") == List("/b"))       // untouched
    assert(after("d3") == List("/z"))       // inserted
  }

  test("spewFiles: one file per doc; a per-doc IO failure -> FAILURE_NOT_SAVED") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import graft.core.{DocOut, SpanOut, Status}
    val dir = Files.createTempDirectory("graft-spew").toString
    val docs = spark.createDataset(Seq(
      DocOut("aaa", "", "aaa", 0, Array(SpanOut("text", "hello", "", 0)), ""),
      DocOut("bbb", "", "bbb", 0, Array(SpanOut("text", "world", "", 0)), "")))
    // pre-existing DIRECTORY at bbb's target path: ITS write fails, others don't
    Files.createDirectories(Paths.get(dir, "bbb.txt"))
    val st = Sink.spewFiles(docs, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st("aaa") == Status.Success)
    assert(st("bbb") == Status.NotSaved)
    assert(new String(Files.readAllBytes(Paths.get(dir, "aaa.txt"))) == "hello")
  }

  test("spewHtmlFiles: sanitized HTML5 output, markup never survives") {
    import java.nio.file.{Files, Paths}
    import graft.core.{DocOut, SpanOut, Status}
    val dir = Files.createTempDirectory("graft-spew-html").toString
    val evil = DocOut("ccc", "", "ccc", 0, Array(
      SpanOut("html", "line one\n<script>alert(1)</script> & \"q\"", "", 0),
      SpanOut("media", "scan text", "art/ab/cdef", 1)), "")
    val empty = DocOut("ddd", "", "ddd", 0, Array.empty, "empty-file")
    // golden render (the HTML5Serializer-semantics contract)
    assert(Sink.renderHtml(evil) ==
      """<!DOCTYPE html><html><head><meta charset="UTF-8"/><title>ccc</title></head>""" +
        """<body><section class="span" data-kind="html"><p>line one</p>""" +
        """<p>&lt;script&gt;alert(1)&lt;/script&gt; &amp; &quot;q&quot;</p></section>""" +
        """<section class="span" data-kind="media"><p>scan text</p>""" +
        """<a href="art/ab/cdef" download>art/ab/cdef</a></section></body></html>""")
    assert(Sink.renderHtml(empty).contains("""<p class="no-content">empty-file</p>"""))
    val st = Sink.spewHtmlFiles(spark.createDataset(Seq(evil, empty))(
      org.apache.spark.sql.Encoders.product[DocOut]), dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st("ccc") == Status.Success && st("ddd") == Status.Success)
    val written = new String(Files.readAllBytes(Paths.get(dir, "ccc.html")))
    assert(!written.contains("<script>")) // sanitization survives the write
  }

  test("compact merges a many-small-files dir losslessly") {
    import spark.implicits._
    val path = tmp()
    (1 to 3000).toDF("x").repartition(30).write.parquet(path)
    def parquetFiles = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 30)
    val n = Sink.compact(spark, path) // tiny data -> 1 target file
    assert(n == 1 && parquetFiles == 1)
    assert(spark.read.parquet(path).agg(org.apache.spark.sql.functions.sum("x"))
      .first().getLong(0) == 3000L * 3001 / 2)
  }

  test("writeAtomic: old data fully replaced, no mixed state") {
    import spark.implicits._
    val path = tmp()
    Seq(1, 2, 3).toDF("x").write.parquet(path)
    Sink.writeAtomic(spark, path, Seq(9, 10).toDF("x"))
    assert(spark.read.parquet(path).collect().map(_.getInt(0)).sorted.toSeq == Seq(9, 10))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".old")))
  }
}
