package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog layer.
  *
  * The reference has no catalog of its own — `dbName` is a per-request
  * parameter and tables live inside an external MySQL/Postgres server
  * (reference `api/controllers/base.go:38-66`). Here the engine IS the
  * database: every fixture table is registered as a temp view over its
  * parquet file, so `spark.sql(...)` can resolve the same names the
  * reference would forward to the external DB.
  *
  * Scale note: `spark.read.parquet` is a distributed, vectorized,
  * predicate-pushdown-capable scan. At 100 TB the same call reads a
  * partitioned directory tree; nothing here materializes on the driver.
  */
object Tables {

  /** All driver-generated fixture tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory.
    *
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default; read it as a nanos Long and truncate to
    * microsecond precision — the same truncation DuckDB applies — so
    * oracle comparisons line up. Integer `div` (not `/`) avoids the
    * double-precision loss on ~1.7e18 nano values.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else raw
    } else spark.read.parquet(path)
  }

  /** Register every fixture table as a temp view named after itself.
    * Idempotent; safe to call once per query entry.
    */
  def register(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
