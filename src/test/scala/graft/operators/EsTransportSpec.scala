package graft.operators

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** Wire-level tests of [[EsBulkTransport]] against an in-process stub
  * Elasticsearch: retry classification (429/502/503/504 → retried with
  * backoff, others permanent), basic-auth header, and byte-correct
  * NDJSON `_bulk` bodies — all offline, exactly what the reference's
  * client config promises (`elastic_controller.go:51-64`).
  */
class EsTransportSpec extends SparkSpec {

  /** Recorded request + scripted response stub. `statuses` is consumed
    * one per request; empty → 200 with a clean bulk response.
    */
  private final class StubEs {
    final case class Rec(path: String, auth: Option[String],
                         contentType: Option[String], body: String)
    val requests = new ConcurrentLinkedQueue[Rec]()
    val statuses = new ConcurrentLinkedQueue[(Int, String)]()
    private val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      requests.add(Rec(ex.getRequestURI.getPath,
        Option(ex.getRequestHeaders.getFirst("Authorization")),
        Option(ex.getRequestHeaders.getFirst("Content-Type")), body))
      val (code, resp) = Option(statuses.poll())
        .getOrElse((200, """{"took":1,"errors":false,"items":[]}"""))
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.start()
    def endpoint: String =
      s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def withStub(f: StubEs => Unit): Unit = {
    val stub = new StubEs
    try f(stub) finally stub.stop()
  }

  private val item1 = """{"index":{"_index":"t","_id":1}}""" + "\n" +
    """{"a":1}"""
  private val item2 = """{"index":{"_index":"t","_id":2}}""" + "\n" +
    """{"a":2}"""

  test("_bulk body is byte-correct NDJSON with auth + content type") {
    withStub { stub =>
      val t = new EsBulkTransport(stub.endpoint,
        username = Some("elastic"), password = Some("changeme"))
      t.send(Seq(item1, item2))
      val r = stub.requests.poll()
      assert(r.path == "/_bulk")
      assert(r.contentType.contains("application/x-ndjson"))
      // Basic base64("elastic:changeme")
      assert(r.auth.contains("Basic ZWxhc3RpYzpjaGFuZ2VtZQ=="))
      assert(r.body == item1 + "\n" + item2 + "\n",
        "NDJSON body must be newline-joined items plus trailing newline")
    }
  }

  test("no credentials -> no Authorization header") {
    withStub { stub =>
      new EsBulkTransport(stub.endpoint).send(Seq(item1))
      assert(stub.requests.poll().auth.isEmpty)
    }
  }

  test("429/502/503/504 raise RetryableFailure; 400 is permanent") {
    withStub { stub =>
      val t = new EsBulkTransport(stub.endpoint)
      Seq(429, 502, 503, 504).foreach { c =>
        stub.statuses.add((c, s"""{"error":"status $c"}"""))
        intercept[BulkSink.RetryableFailure](t.send(Seq(item1)))
      }
      stub.statuses.add((400, """{"error":"mapper_parsing_exception"}"""))
      val e = intercept[RuntimeException](t.send(Seq(item1)))
      assert(!e.isInstanceOf[BulkSink.RetryableFailure])
      assert(e.getMessage.contains("400"))
    }
  }

  test("2xx with errors:true is permanent (no double-indexing on retry)") {
    withStub { stub =>
      stub.statuses.add((200,
        """{"took":3,"errors":true,"items":[{"index":{"status":400}}]}"""))
      val e = intercept[RuntimeException](
        new EsBulkTransport(stub.endpoint).send(Seq(item1)))
      assert(!e.isInstanceOf[BulkSink.RetryableFailure])
      assert(e.getMessage.contains("bulk item failures"))
      // whitespace variants (proxies, pretty-printers) must also trip it
      stub.statuses.add((200, """{ "took": 3, "errors" : true }"""))
      intercept[RuntimeException](
        new EsBulkTransport(stub.endpoint).send(Seq(item1)))
      // and errors:false must NOT
      stub.statuses.add((200, """{ "took": 1, "errors" : false }"""))
      new EsBulkTransport(stub.endpoint).send(Seq(item1))
    }
  }

  test("connection refused is retryable (transient network class)") {
    // a port with no listener — connect fails, which must classify as
    // retryable, not permanent
    intercept[BulkSink.RetryableFailure](
      new EsBulkTransport("http://localhost:1", requestTimeoutMs = 500)
        .send(Seq(item1)))
  }

  test("end-to-end BulkSink.write: injected 503s are retried and counted") {
    withStub { stub =>
      // first two requests fail 503, then the stub answers 200 forever
      stub.statuses.add((503, """{"error":"unavailable"}"""))
      stub.statuses.add((503, """{"error":"unavailable"}"""))
      val spark2 = spark
      import spark2.implicits._
      val docs = (1 to 100)
        .map(i => s"""{"index":{"_index":"t","_id":$i}}""" + "\n" +
          s"""{"v":$i}""")
        .toDF("doc").repartition(1)
      val ep = stub.endpoint
      val stats = BulkSink.write(docs, () => new EsBulkTransport(ep),
        flushBytes = 1L << 20, maxRetries = 5, backoffMs = 1L)
      assert(stats.flushed == 100)
      assert(stats.retries == 2, s"expected 2 retries, got ${stats.retries}")
      assert(stats.failedBatches == 0)
      // 2 failed attempts + 1 success
      assert(stub.requests.size() == 3)
      // the successful request carried every doc
      val last = stub.requests.toArray.map(_.asInstanceOf[StubEs#Rec]).last
      assert(last.body.linesIterator.size == 200) // 100 action + 100 source
    }
  }

  test("end-to-end continueOnError: permanently failing batch is counted") {
    withStub { stub =>
      stub.statuses.add((400, """{"error":"bad"}"""))
      val spark2 = spark
      import spark2.implicits._
      val docs = Seq(item1).toDF("doc").repartition(1)
      val ep = stub.endpoint
      val stats = BulkSink.write(docs, () => new EsBulkTransport(ep),
        maxRetries = 2, backoffMs = 1L, continueOnError = true)
      assert(stats.failedBatches == 1 && stats.failedDocs == 1)
      assert(stats.flushed == 0 && stats.retries == 0)
    }
  }
}
