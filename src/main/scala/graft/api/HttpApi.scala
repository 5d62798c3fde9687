package graft.api

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.engine.Tables
import graft.gate.{EngineError, QueryGate}
import graft.operators.Indexer

/** The live HTTP twin of the reference service — its three routes
  * (`api/controllers/routes.go:9-15`), each wrapped in the logging
  * middleware (O15, `api/middlewares/middlewares.go:40-59`), with the
  * reference's response envelope (`api/responses/json.go`: raw JSON on
  * success, `{"error": "..."}` on failure) and its error taxonomy
  * (400/401, `api/utils/error_handler.go`):
  *
  *   - `GET  /`              → welcome string (home_controller.go:9-11)
  *   - `GET  /query/`        → gated SQL → JSON array of row objects
  *                             (query_controller.go:54-109)
  *   - `POST /elastic/save/` → gated SQL → bulk-indexed to the
  *                             file-backed NDJSON index + stats record
  *                             (elastic_controller.go:252-299)
  *
  * Built on the JDK's `HttpServer` — in-process, zero dependencies —
  * so the one reference behavior that previously had no executable twin
  * (the live wire surface) is now spec-tested end to end. The handler
  * does what the reference's two-service hop does (O8: /elastic/save/
  * HTTP-GETs its own /query/ route and re-parses the JSON) WITHOUT the
  * self-call: the DataFrame flows from gate to sink in-process.
  *
  * Serving is request-scoped and driver-side by design — this is the
  * reference's control-plane API, not a data-plane operator; the heavy
  * lifting behind each request (scan/join/index) still executes as
  * distributed Spark jobs.
  */
object HttpApi {

  final case class Running(server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Start the API on `port` (0 = ephemeral). `indexRoot` is the
    * directory backing the NDJSON bulk index (the ES stand-in).
    */
  def start(spark: SparkSession, indexRoot: String, port: Int = 0,
            log: String => Unit = Console.err.println): Running = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/elastic/save/",
      logged(log, "POST /elastic/save/")(elasticSave(spark, indexRoot)))
    server.createContext("/query/",
      logged(log, "GET /query/")(queryRoute(spark)))
    server.createContext("/", logged(log, "GET /") { ex =>
      if (ex.getRequestURI.getPath == "/")
        (200,
          "\"Welcome to Database Query engine and Elastic Search bulk posting engine\"")
      else (404, """{"error":"no such route"}""")
    })
    server.start()
    Running(server)
  }

  // --- routes ---------------------------------------------------------

  private def queryRoute(spark: SparkSession)(ex: HttpExchange): (Int, String) = {
    val p = params(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
    run(spark, p) { df => (200, df.toJSON.collect().mkString("[", ",", "]")) }
  }

  private def elasticSave(spark: SparkSession, indexRoot: String)(
      ex: HttpExchange): (Int, String) = {
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    val p = params(body)
    val indexName = p.getOrElse("indexName", "")
    if (indexName.trim.isEmpty)
      (400, errorJson("incomplete request params: indexName"))
    else run(spark, p) { df =>
      val stats = Indexer.bulkIndex(df, indexRoot, indexName,
        orderBy = df.columns.toSeq.map(col), mode = "overwrite")
      (200, stats.jsonLine)
    }
  }

  /** Shared gate+execute step with the reference's error mapping. */
  private def run(spark: SparkSession, p: Map[String, String])(
      f: org.apache.spark.sql.DataFrame => (Int, String)): (Int, String) =
    try {
      val (driver, db, query) = (p.getOrElse("dbDriver", ""),
        p.getOrElse("dbName", ""), p.getOrElse("query", ""))
      if (driver == "parquet" && db.nonEmpty) Tables.register(spark, db)
      f(QueryGate.runQuery(spark, driver, db, query))
    } catch {
      case e: EngineError => (e.code, errorJson(e.getMessage))
      case NonFatal(e) => // analysis/execution errors → reference's 400
        (400, errorJson(String.valueOf(e.getMessage).take(500)))
    }

  // --- middleware + plumbing ------------------------------------------

  /** O15 twin: time the handler, answer with the JSON content type the
    * reference's writer shim forces, emit one structured log line.
    */
  private def logged(log: String => Unit, route: String)(
      f: HttpExchange => (Int, String)): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => {
      val t0 = System.nanoTime()
      val (code, bodyStr) =
        try f(ex)
        catch { case NonFatal(e) => (500, errorJson(String.valueOf(e))) }
      val bytes = bodyStr.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
      val ms = (System.nanoTime() - t0) / 1e6
      log(s"""{"route":"$route","status":$code,"bytes":${bytes.length},"latency_ms":$ms}""")
    }

  private def errorJson(msg: String): String =
    s"""{"error":"${msg.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")}"}"""

  /** Decode an application/x-www-form-urlencoded or query string. */
  private def params(s: String): Map[String, String] =
    s.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
    }.toMap
}
