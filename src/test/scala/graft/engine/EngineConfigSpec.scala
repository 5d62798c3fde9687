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
