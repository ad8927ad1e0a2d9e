package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DocOut, SpanOut, Status}
import graft.pipeline.RestSpewer

/** RESTSpewer against a real in-process HTTP server (JDK HttpServer):
  * per-doc PUT bodies land with the reference's field names; a failing
  * endpoint becomes a per-doc NOT_SAVED, never a job failure.
  */
class RestSpewerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("per-doc PUTs land; non-2xx becomes FAILURE_NOT_SAVED for that doc only") {
    import spark.implicits._
    val received = new ConcurrentHashMap[String, String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/docs", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.split('/').last
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      received.put(id, body)
      val code = if (id == "bad") 500 else 200
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/docs"
      val docs = spark.createDataset(Seq(
        DocOut("aaa", "", "aaa", 0, Array(SpanOut("text", "hello world", "", 0)), ""),
        DocOut("bad", "", "bad", 0, Array(SpanOut("text", "boom", "", 0)), ""),
        DocOut("ccc", "p1", "r1", 2, Array(SpanOut("text", "child text", "", 0)), "")))
      val st = RestSpewer.spew(docs, base).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(st("aaa") == (Status.Success, 200L))
      assert(st("bad") == (Status.NotSaved, 500L))
      assert(st("ccc") == (Status.Success, 200L))
      // reference field names + url-encoded content arrived
      assert(received.get("aaa").contains("extract_id=aaa"))
      assert(received.get("aaa").contains("content=hello+world"))
      assert(received.get("ccc").contains("extract_root=r1"))
      assert(received.get("ccc").contains("extract_level=2"))
    } finally server.stop(0)
  }
}
