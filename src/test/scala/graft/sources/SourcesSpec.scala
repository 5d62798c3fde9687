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

  test("jdbc executes a real partitioned scan against embedded Derby") {
    // Derby ships with Spark's jars (the Hive metastore dependency), so
    // an in-JVM, zero-egress database is available: this executes the
    // reference's MySQL/Postgres role (base.go:38-66) end to end —
    // a real JDBC connection, a real range-partitioned parallel scan.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE people") catch { case _: Exception => () }
      st.execute(
        "CREATE TABLE people (id INT NOT NULL, name VARCHAR(32), score DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"name_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val df = Sources.jdbcTable(spark, url, "people",
      Some(("id", 1L, 101L, 4)))
    assert(df.rdd.getNumPartitions == 4, "partitioned read not split")
    import org.apache.spark.sql.functions._
    val row = df.agg(count(lit(1)), sum("id"), sum("score")).head()
    assert(row.getLong(0) == 100L)
    assert(row.getLong(1) == 5050L)
    assert(row.getDouble(2) == 7575.0)
    // and through the driver-dispatch gate (unpartitioned path)
    assert(Sources.table(spark, "jdbc", url, "people").count() == 100L)
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
