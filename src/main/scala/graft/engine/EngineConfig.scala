package graft.engine

/** Env → engine settings: the rebuild of the reference's godotenv layer
  * (`api/controllers/base.go:26-35` reads `.env`; `:39-56` assembles a
  * DSN per driver from `DB_*` / `POSTGRESS_*` keys;
  * `elastic_controller.go:53-64` reads `ELASTICSEARCH_HOST` +
  * `USERNAME`/`PASSWORD` for the sink client).
  *
  * The SAME key names map onto this engine's knobs: mysql/postgres keys
  * assemble Spark JDBC URLs (the partitioned-scan path in
  * [[graft.sources.Sources]]), and the Elasticsearch keys feed
  * [[graft.operators.EsBulkTransport]]. `env` is injectable so specs
  * exercise the assembly without touching the process environment.
  */
final case class EngineConfig(env: Map[String, String] = sys.env) {

  private def get(k: String): Option[String] =
    env.get(k).map(_.trim).filter(_.nonEmpty)

  /** Credentials are spliced into the URL's query string, so reserved
    * characters ('&', '=', '%', '#', …) in a password would corrupt or
    * truncate the URL — percent-encode them (both the MySQL and
    * PostgreSQL JDBC drivers URL-decode connection-property values).
    */
  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, java.nio.charset.StandardCharsets.UTF_8)

  /** Reference mysql DSN (`base.go:40`:
    * `user:pass@tcp(host:port)/db?...`) as a Spark JDBC URL.
    */
  def mysqlJdbcUrl(dbName: String): Option[String] = for {
    host <- get("DB_HOST")
    port <- get("DB_PORT")
  } yield {
    val q = Seq(
      get("DB_USER").map(u => s"user=${enc(u)}"),
      get("DB_PASSWORD").map(p => s"password=${enc(p)}")).flatten
    s"jdbc:mysql://$host:$port/$dbName" +
      (if (q.isEmpty) "" else q.mkString("?", "&", ""))
  }

  /** Reference postgres DSN (`base.go:48`: `host=… port=… user=…
    * dbname=… sslmode=disable password=…`) as a Spark JDBC URL.
    */
  def postgresJdbcUrl(dbName: String): Option[String] = for {
    host <- get("POSTGRESS_DB_HOST") // sic — the reference's key spelling
    port <- get("POSTGRESS_DB_PORT")
  } yield {
    val q = Seq(
      get("POSTGRESS_DB_USER").map(u => s"user=${enc(u)}"),
      get("POSTGRESS_DB_PASSWORD").map(p => s"password=${enc(p)}"),
      Some("sslmode=disable")).flatten
    s"jdbc:postgresql://$host:$port/$dbName" + q.mkString("?", "&", "")
  }

  /** URL for a gate driver name; None when the env lacks the keys (the
    * caller falls back to treating dbName as a literal JDBC URL).
    */
  def jdbcUrl(dbDriver: String, dbName: String): Option[String] =
    dbDriver match {
      case "mysql"    => mysqlJdbcUrl(dbName)
      case "postgres" => postgresJdbcUrl(dbName)
      case _          => None
    }

  /** Sink client settings (`elastic_controller.go:53-64`). */
  def esEndpoint: Option[String] = get("ELASTICSEARCH_HOST")
  def esUsername: Option[String] = get("USERNAME")
  def esPassword: Option[String] = get("PASSWORD")

  /** A ready [[graft.operators.EsBulkTransport]] factory when the env
    * configures an endpoint — serializable-by-construction (captures
    * only strings), as [[graft.operators.BulkSink.write]] requires.
    */
  def esTransportFactory: Option[() => graft.operators.BulkSink.BulkTransport] =
    esEndpoint.map { ep =>
      val (u, p) = (esUsername, esPassword)
      () => new graft.operators.EsBulkTransport(ep, u, p)
    }
}
