package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gate.EngineError

/** Source connectors — the rebuild of the reference's driver dispatch
  * (`api/controllers/base.go:38-66`: build a DSN from env for mysql or
  * postgres, `sql.Open`, hand the connection to the query path).
  *
  * Here a "driver" selects a Spark source format:
  *  - `parquet` — the primary, testable path: a directory of tables
  *    (`<dir>/<table>.parquet`), scanned distributed/vectorized with
  *    pushdown (the fixture layout, TESTDATA.md);
  *  - `jdbc` (aliases: `mysql`, `postgres` — the reference's literal
  *    allowlist, query_controller.go:46-51) — parity with the
  *    reference's MySQL/Postgres role: `spark.read.format("jdbc")`
  *    against a URL. Partitioned reads (partitionColumn/lowerBound/
  *    upperBound/numPartitions) are the scale knob — a
  *    single-connection JDBC scan is the reference's bottleneck
  *    reproduced, so [[jdbcTable]] requires the caller to think about
  *    it. Execution is exercised end-to-end against an embedded Derby
  *    database (SourcesSpec: real connection, 4-way range-partitioned
  *    scan, checksummed).
  */
object Sources {

  /** Open one table through the driver-dispatch gate. */
  def table(spark: SparkSession, dbDriver: String, dbName: String,
            tableName: String): DataFrame = dbDriver match {
    case "parquet" =>
      spark.read.parquet(s"$dbName/$tableName.parquet")
    case "jdbc" | "mysql" | "postgres" =>
      jdbcTable(spark, dbName, tableName)
    case other =>
      throw EngineError.IncorrectSource(other)
  }

  /** [[table]] through the reference's env-assembled DSN
    * ([[graft.engine.EngineConfig]], `base.go:39-56`): for
    * mysql/postgres, when the env provides host/port, `dbName` is the
    * DATABASE name and the JDBC URL is assembled around it — exactly
    * the reference's contract; with no env config, `dbName` falls back
    * to being a literal JDBC URL.
    */
  def table(spark: SparkSession, dbDriver: String, dbName: String,
            tableName: String, config: graft.engine.EngineConfig): DataFrame =
    dbDriver match {
      case "mysql" | "postgres" =>
        jdbcTable(spark,
          config.jdbcUrl(dbDriver, dbName).getOrElse(dbName), tableName)
      case _ => table(spark, dbDriver, dbName, tableName)
    }

  /** JDBC table read. `url` must be a full JDBC URL (the reference
    * assembles it from env, `base.go:42-60`); `partitionSpec` enables
    * the parallel range-partitioned scan.
    */
  def jdbcTable(spark: SparkSession, url: String, tableName: String,
                partitionSpec: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", tableName)
    val withPart = partitionSpec.fold(base) { case (col, lo, hi, n) =>
      base.option("partitionColumn", col)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
    withPart.load()
  }
}
