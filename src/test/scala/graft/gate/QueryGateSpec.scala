package graft.gate

import graft.SparkSpec

/** Gate parity with the reference's validation chain
  * (reference `api/controllers/query_controller.go:16-51`,
  * `api/utils/error_handler.go:18-39`): SELECT-only admission, param
  * null-check, driver allowlist. We reproduce the INTENT of the
  * SELECT-only regex, not its bug (the reference admits any string
  * containing "SELECT", e.g. `DROP TABLE "SELECT"`).
  */
class QueryGateSpec extends SparkSpec {

  test("admits plain SELECT") {
    QueryGate.validateQueryOnly(spark, "SELECT 1")
  }

  test("admits mixed-case Select (reference regex rejected this)") {
    QueryGate.validateQueryOnly(spark, "Select 1")
  }

  test("admits CTEs, set ops, subqueries") {
    QueryGate.validateQueryOnly(spark,
      "WITH t AS (SELECT 1 AS a) SELECT * FROM t UNION SELECT 2")
    QueryGate.validateQueryOnly(spark,
      "SELECT * FROM (SELECT 1 AS a) WHERE a IN (SELECT 1)")
  }

  test("rejects DDL/DML even when they mention SELECT") {
    val bad = Seq(
      "DROP TABLE `SELECT`",
      "CREATE TABLE t AS SELECT 1",
      "INSERT INTO t SELECT 1",
      "DELETE FROM t WHERE x IN (SELECT 1)",
      "UPDATE t SET x = 1",
      "TRUNCATE TABLE t")
    bad.foreach { q =>
      assertThrows[EngineError.UnauthorizedOperation](
        QueryGate.validateQueryOnly(spark, q))
    }
  }

  test("rejects unparseable SQL with InvalidSyntax") {
    assertThrows[EngineError.InvalidSyntax](
      QueryGate.validateQueryOnly(spark, "SELEC 1 FRM"))
  }

  test("rejects empty params with IncompleteParams") {
    val e = intercept[EngineError.IncompleteParams](
      QueryGate.validate(spark, "parquet", "", "SELECT 1"))
    assert(e.code == 400)
  }

  test("rejects unknown driver with IncorrectSource") {
    val e = intercept[EngineError.IncorrectSource](
      QueryGate.validate(spark, "mongodb", "db", "SELECT 1"))
    assert(e.code == 400)
    assert(e.getMessage == "incorrect db driver: mongodb")
  }

  test("mysql/postgres (the reference's literal allowlist) pass the gate " +
    "and dispatch to the jdbc path") {
    // gate: both reference driver names validate
    assert(QueryGate.validate(spark, "mysql", "db", "SELECT 1") == "SELECT 1")
    assert(QueryGate.validate(spark, "postgres", "db", "SELECT 1") == "SELECT 1")
    // dispatch: the aliases reach the jdbc reader (and so fail with a
    // jdbc URL error, not IncorrectSource, on a bogus URL)
    val e = intercept[Exception](
      graft.sources.Sources.table(spark, "mysql", "not-a-jdbc-url", "t")
        .collect())
    assert(!e.isInstanceOf[EngineError.IncorrectSource])
  }

  test("error codes mirror the reference taxonomy (401/400)") {
    assert(EngineError.UnauthorizedOperation("x").code == 401)
    assert(EngineError.IncompleteParams("x").code == 400)
    assert(EngineError.IncorrectSource("x").code == 400)
  }

  test("runQuery executes an admitted query") {
    val df = QueryGate.runQuery(spark, "parquet", "any", "SELECT 1 AS one")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("runLogged emits a 200 request line with latency (O15/O16)") {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    QueryGate.runLogged(spark, "parquet", "any", "SELECT 1 AS one",
      lines += _)
    assert(lines.size == 1)
    val l = lines.head
    assert(l.contains("\"status\":200") && l.contains("\"latency_ms\":"), l)
    assert(l.contains("\"driver\":\"parquet\""), l)
  }

  test("runLogged logs the taxonomy code on rejection and rethrows") {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    intercept[EngineError.UnauthorizedOperation] {
      QueryGate.runLogged(spark, "parquet", "any", "DROP TABLE t",
        lines += _)
    }
    assert(lines.size == 1)
    assert(lines.head.contains("\"status\":401"), lines.head)
    assert(lines.head.contains("\"error\":"), lines.head)
  }

  test("runLogged escapes quotes/newlines so the log line stays valid JSON") {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    QueryGate.runLogged(spark, "parquet", "any",
      "SELECT 'it''s' AS s,\n 2 AS two", lines += _)
    val l = lines.head
    assert(!l.contains("\n"), "raw newline leaked into the log line")
    assert(l.contains("\\n"), l)
  }
}
