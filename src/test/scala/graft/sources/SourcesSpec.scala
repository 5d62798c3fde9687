package graft.sources

import graft.SparkSpec
import graft.gate.EngineError

class SourcesSpec extends SparkSpec {

  test("parquet driver reads a fixture table") {
    val df = Sources.table(spark, "parquet", sf001, "region")
    assert(df.count() == 5)
    assert(df.columns.toSeq == Seq("r_regionkey", "r_name"))
  }

  test("unknown driver raises the reference's IncorrectSource error") {
    assertThrows[EngineError.IncorrectSource](
      Sources.table(spark, "mongodb", "db", "t"))
  }

  test("jdbc dispatch reaches the connector (fails at connect, not at dispatch)") {
    // No DB/driver jar in the zero-egress environment: schema resolution
    // must fail at the JDBC layer — proving the dispatch + option
    // plumbing is correct — not with a format/argument error.
    val e = intercept[Exception](
      Sources.jdbcTable(spark, "jdbc:postgresql://example:5432/db",
        "t", Some(("id", 0L, 1000L, 8))))
    val msg = String.valueOf(e.getMessage).toLowerCase
    assert(msg.contains("driver") || msg.contains("connect"), msg)
  }
}
