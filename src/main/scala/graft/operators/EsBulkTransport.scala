package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

import BulkSink.{BulkTransport, RetryableFailure}

/** Live Elasticsearch `_bulk` HTTP transport for [[BulkSink]] — the wire
  * client of the reference's sink (`elastic_controller.go:51-100`:
  * endpoint + basic auth from config, retry on 429/502/503/504;
  * `:143-158`: NDJSON flushes through esutil.BulkIndexer).
  *
  * Classification contract (BulkSink's sendWithRetry drives the
  * exponential-backoff loop around this):
  *  - connect/IO failures and HTTP 429/502/503/504 → [[RetryableFailure]]
  *    (the reference's RetryOnStatus list, `elastic_controller.go:63`);
  *  - any other non-2xx → permanent (thrown as-is);
  *  - 2xx whose body reports `"errors":true` → permanent: per-item
  *    rejections (mapping conflicts, malformed docs) do not heal on
  *    retry, and retrying the whole batch would double-index the items
  *    that WERE accepted.
  *
  * One instance per partition (built by the transport factory), so the
  * HTTP client and its connection pool are executor-local and amortized
  * across that partition's batches — the Spark twin of the reference's
  * one shared client across NumCPU workers.
  */
final class EsBulkTransport(endpoint: String,
                            username: Option[String] = None,
                            password: Option[String] = None,
                            requestTimeoutMs: Long = 30000L)
    extends BulkTransport {

  // whitespace-tolerant: proxies and pretty-printers may serialize the
  // flag as `"errors" : true`; a substring check would silently treat a
  // batch with per-item rejections as fully indexed
  private val ErrorsTrue = "\"errors\"\\s*:\\s*true".r

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(requestTimeoutMs)).build()
  private val bulkUri = URI.create(endpoint.stripSuffix("/") + "/_bulk")
  private val authHeader = username.map(u => "Basic " +
    Base64.getEncoder.encodeToString(
      s"$u:${password.getOrElse("")}".getBytes(StandardCharsets.UTF_8)))

  /** `batch` entries are `_bulk` items (action line + `\n` + source
    * document, the shape [[Indexer.bulkIndex]] emits); the request body
    * newline-joins them and keeps the trailing newline `_bulk` requires.
    */
  override def send(batch: Seq[String]): Unit = {
    val body = batch.mkString("", "\n", "\n")
    val builder = HttpRequest.newBuilder(bulkUri)
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/x-ndjson")
    authHeader.foreach(builder.header("Authorization", _))
    val req = builder
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw new RetryableFailure(s"bulk transport I/O: $e")
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new RuntimeException("bulk send interrupted", e)
      }
    resp.statusCode() match {
      case 429 | 502 | 503 | 504 =>
        throw new RetryableFailure(
          s"bulk HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      case c if c >= 200 && c < 300 =>
        if (ErrorsTrue.findFirstIn(resp.body()).isDefined)
          throw new RuntimeException(
            s"bulk item failures: ${resp.body().take(500)}")
      case c =>
        throw new RuntimeException(s"bulk HTTP $c: ${resp.body().take(500)}")
    }
  }
}
