package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** The env→settings twin of the reference's godotenv layer: the SAME
  * `.env` keys (reference `.env` + `base.go:39-56`) must assemble the
  * engine's JDBC URLs and sink-client settings. No SparkSession needed —
  * pure string assembly.
  */
class EngineConfigSpec extends AnyFunSuite {

  // the reference repo's own .env fixture, verbatim keys
  private val refEnv = Map(
    "DB_HOST" -> "127.0.0.1", "DB_DRIVER" -> "mysql",
    "DB_USER" -> "rakesh", "DB_PASSWORD" -> "root",
    "DB_NAME" -> "testdb", "DB_PORT" -> "3306",
    "POSTGRESS_DB_HOST" -> "127.0.0.1", "POSTGRESS_DB_PORT" -> "5432",
    "POSTGRESS_DB_USER" -> "username", "POSTGRESS_DB_PASSWORD" -> "password",
    "ELASTICSEARCH_HOST" -> "http://localhost:9200",
    "USERNAME" -> "elastic", "PASSWORD" -> "elastic")

  test("mysql env keys assemble the jdbc url (base.go:40 DSN twin)") {
    val cfg = EngineConfig(refEnv)
    assert(cfg.jdbcUrl("mysql", "testdb").contains(
      "jdbc:mysql://127.0.0.1:3306/testdb?user=rakesh&password=root"))
  }

  test("postgres env keys assemble the jdbc url (base.go:48 DSN twin)") {
    val cfg = EngineConfig(refEnv)
    assert(cfg.jdbcUrl("postgres", "testdb").contains(
      "jdbc:postgresql://127.0.0.1:5432/testdb" +
        "?user=username&password=password&sslmode=disable"))
  }

  test("missing host/port -> None (caller falls back to literal URL)") {
    val cfg = EngineConfig(Map("DB_USER" -> "u"))
    assert(cfg.jdbcUrl("mysql", "db").isEmpty)
    assert(cfg.jdbcUrl("postgres", "db").isEmpty)
    assert(cfg.jdbcUrl("parquet", "db").isEmpty)
  }

  test("blank values are treated as unset") {
    val cfg = EngineConfig(Map("DB_HOST" -> " ", "DB_PORT" -> "3306"))
    assert(cfg.mysqlJdbcUrl("db").isEmpty)
  }

  test("elasticsearch sink settings surface the reference's keys") {
    val cfg = EngineConfig(refEnv)
    assert(cfg.esEndpoint.contains("http://localhost:9200"))
    assert(cfg.esUsername.contains("elastic"))
    assert(cfg.esPassword.contains("elastic"))
    assert(cfg.esTransportFactory.isDefined)
    assert(EngineConfig(Map.empty).esTransportFactory.isEmpty)
  }

  test("credentials omitted -> url without query params") {
    val cfg = EngineConfig(Map("DB_HOST" -> "h", "DB_PORT" -> "1"))
    assert(cfg.mysqlJdbcUrl("d").contains("jdbc:mysql://h:1/d"))
  }

  test(".env FILE loads end-to-end into a jdbc url (godotenv parity, base.go:26-35)") {
    // the reference's own .env shape, including its trailing spaces,
    // comment lines, and an inline comment
    val dotenv =
      """# Mysql
        |DB_HOST=127.0.0.1
        |DB_DRIVER=mysql
        |DB_USER=rakesh
        |DB_PASSWORD=root
        |DB_NAME=testdb
        |DB_PORT=3306
        |
        |# Postgres
        |POSTGRESS_DB_HOST=127.0.0.1
        |POSTGRESS_DB_PORT=5432  # default pg port
        |POSTGRESS_DB_USER=username
        |POSTGRESS_DB_PASSWORD=password
        |
        |#ElasticSearch
        |ELASTICSEARCH_HOST=http://localhost:9200
        |export USERNAME="elastic"
        |PASSWORD='elastic'
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("dotenv").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, ".env")
    java.nio.file.Files.write(f.toPath, dotenv.getBytes("UTF-8"))
    val cfg = EngineConfig.fromDotenv(f.getPath, processEnv = Map.empty)
    assert(cfg.jdbcUrl("mysql", "testdb").contains(
      "jdbc:mysql://127.0.0.1:3306/testdb?user=rakesh&password=root"))
    assert(cfg.jdbcUrl("postgres", "testdb").contains(
      "jdbc:postgresql://127.0.0.1:5432/testdb" +
        "?user=username&password=password&sslmode=disable"))
    assert(cfg.esEndpoint.contains("http://localhost:9200"))
    assert(cfg.esUsername.contains("elastic") && cfg.esPassword.contains("elastic"))
  }

  test("process env wins over the .env file (godotenv no-override contract)") {
    val dir = java.nio.file.Files.createTempDirectory("dotenv").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, ".env")
    java.nio.file.Files.write(f.toPath,
      "DB_HOST=from-file\nDB_PORT=1111\n".getBytes("UTF-8"))
    val cfg = EngineConfig.fromDotenv(f.getPath,
      processEnv = Map("DB_HOST" -> "from-proc"))
    assert(cfg.mysqlJdbcUrl("d").contains("jdbc:mysql://from-proc:1111/d"))
  }

  test("missing .env degrades to process-env-only") {
    val cfg = EngineConfig.fromDotenv("/nonexistent/.env",
      processEnv = Map("DB_HOST" -> "h", "DB_PORT" -> "9"))
    assert(cfg.mysqlJdbcUrl("d").contains("jdbc:mysql://h:9/d"))
  }

  test("dotenv parser: quotes, escapes, export prefix, duplicates") {
    val m = EngineConfig.parseDotenv(
      """A="x\ny"
        |B='lit\n'
        |export C=3
        |C=4
        |not-a-pair
        |=nokey
        |""".stripMargin)
    assert(m("A") == "x\ny" && m("B") == "lit\\n" && m("C") == "4")
    assert(!m.contains("") && m.size == 3)
  }

  test("dotenv parser: escaped backslash before n/t/r decodes to a " +
    "literal backslash, not a control character") {
    // "a\\nb" (backslash backslash n) is a literal backslash + n per
    // godotenv — a sequential-replace decoder half-consumes the pair
    // and yields an embedded newline
    val m = EngineConfig.parseDotenv(
      "P=\"a\\\\nb\"\nQ=\"t\\\\\\\\u\"\nR=\"odd\\\\\"\nS=\"\\x\"\n")
    assert(m("P") == "a\\nb", m("P"))      // \\ then n
    assert(m("Q") == "t\\\\u", m("Q"))     // four backslashes → two
    assert(m("R") == "odd\\", m("R"))      // trailing escaped backslash
    assert(m("S") == "\\x", m("S"))        // unrecognized escape kept
  }

  test("reserved characters in credentials are percent-encoded") {
    // '&', '=', '%', '#' would otherwise truncate or corrupt the URL's
    // query string; the JDBC drivers URL-decode property values
    val cfg = EngineConfig(Map("DB_HOST" -> "h", "DB_PORT" -> "1",
      "DB_USER" -> "a&b=c", "DB_PASSWORD" -> "p%25#x y"))
    val url = cfg.mysqlJdbcUrl("d").get
    assert(url == "jdbc:mysql://h:1/d?user=a%26b%3Dc&password=p%2525%23x+y", url)
    // round-trips back to the original values
    def dec(v: String) = java.net.URLDecoder.decode(v, "UTF-8")
    assert(dec("a%26b%3Dc") == "a&b=c" && dec("p%2525%23x+y") == "p%25#x y")
  }
}
