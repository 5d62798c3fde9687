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
object EngineConfig {

  /** Parse dotenv file content (the godotenv subset the reference's
    * `.env` actually uses — `api/controllers/base.go:26-35` loads it
    * before every DSN assembly). Per line: blank lines and `#` comments
    * skipped, optional `export ` prefix, `KEY=VALUE` split at the first
    * `=`. Unquoted values are trimmed and lose a trailing ` # comment`
    * (the reference's own fixture carries trailing spaces, e.g.
    * `DB_PORT=3306 `); single-quoted values are literal; double-quoted
    * values process \n, \t, \r, \", \\ escapes. Later duplicates win,
    * matching godotenv's map-overwrite order.
    */
  def parseDotenv(content: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (raw <- content.linesIterator) {
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val stripped = if (line.startsWith("export ")) line.drop(7).trim else line
        val eq = stripped.indexOf('=')
        if (eq > 0) {
          val key = stripped.substring(0, eq).trim
          val rhs = stripped.substring(eq + 1).trim
          val value =
            if (rhs.length >= 2 && rhs.head == '"' && rhs.last == '"')
              unescape(rhs.substring(1, rhs.length - 1))
            else if (rhs.length >= 2 && rhs.head == '\'' && rhs.last == '\'')
              rhs.substring(1, rhs.length - 1)
            else {
              val hash = rhs.indexOf(" #")
              (if (hash >= 0) rhs.substring(0, hash) else rhs).trim
            }
          out(key) = value
        }
      }
    }
    out.toMap
  }

  /** Decode double-quoted-value escapes in ONE left-to-right scan.
    * Sequential `replace` calls cannot implement escape decoding: with
    * `\\` handled last, the two-backslash prefix of `\\n` (a literal
    * backslash then the letter n) is half-consumed by the `\n` rule
    * first and mis-decodes into backslash + newline. godotenv's subset:
    * \n \t \r \" \\; an unrecognized escape keeps both characters.
    */
  private def unescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => b.append('\n'); i += 2
          case 't'  => b.append('\t'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case '"'  => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case other => b.append(c).append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Build a config from a dotenv file merged under the process
    * environment — an already-set process variable wins over the file,
    * exactly godotenv's no-override contract. A missing or unreadable
    * file degrades to process-env-only (the reference fatals there,
    * `base.go:30-31`; a library stays usable and lets the caller decide).
    */
  def fromDotenv(path: String, processEnv: Map[String, String] = sys.env): EngineConfig = {
    val file = new java.io.File(path)
    // Try, not just isFile: an existing-but-unreadable file (permission
    // denied, I/O error) must also degrade, per the contract above.
    val fileEnv =
      if (file.isFile)
        scala.util.Try(parseDotenv(new String(
          java.nio.file.Files.readAllBytes(file.toPath),
          java.nio.charset.StandardCharsets.UTF_8)))
          .getOrElse(Map.empty[String, String])
      else Map.empty[String, String]
    EngineConfig(fileEnv ++ processEnv)
  }
}

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
