package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core.{DocOut, Status}

/** RESTSpewer (`RESTSpewer.java:36-56`): one HTTP PUT per document to
  * `baseUri/<doc_id>` with a url-encoded form body carrying id, parent/root
  * fields, and the extracted text — re-expressed as a per-partition sink
  * over the JDK HttpClient (one client per partition, the reference's
  * pooled-client analog). A non-2xx response or IO failure becomes a
  * FAILURE_NOT_SAVED status row for THAT document (`RESTSpewer.java:83-88`
  * raises TaggedIOException; here the taxonomy absorbs it) — the stream
  * continues. Returns (doc_id, status, http_code).
  *
  * At scale: requests fan out per partition; the endpoint's capacity is the
  * backpressure (bound partitions or rate-limit in the caller).
  */
object RestSpewer {

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  def formBody(d: DocOut): String = {
    val text = d.spans.iterator.map(_.text).mkString("\n")
    s"extract_id=${enc(d.doc_id)}&extract_parent_id=${enc(d.parent_id)}" +
      s"&extract_root=${enc(d.root_id)}&extract_level=${d.level}&content=${enc(text)}"
  }

  def spew(docs: Dataset[DocOut], baseUri: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val client = HttpClient.newHttpClient() // per-partition client reuse
      it.map { d =>
        try {
          val req = HttpRequest.newBuilder(URI.create(s"$baseUri/${d.doc_id}"))
            .header("Content-Type", "application/x-www-form-urlencoded")
            .PUT(HttpRequest.BodyPublishers.ofString(formBody(d), StandardCharsets.UTF_8))
            .build()
          val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
          val ok = resp.statusCode() >= 200 && resp.statusCode() < 300
          (d.doc_id, if (ok) Status.Success else Status.NotSaved, resp.statusCode().toLong)
        } catch {
          case _: java.io.IOException =>
            (d.doc_id, Status.NotSaved, 0L)
          case ie: InterruptedException =>
            // a task-kill interrupt must PROPAGATE, not be absorbed as a
            // per-doc status — restoring the flag and rethrowing lets Spark
            // cancel the partition immediately
            Thread.currentThread().interrupt()
            throw new RuntimeException("interrupted during REST spew", ie)
        }
      }
    }.toDF("doc_id", "status", "http_code")
  }
}
