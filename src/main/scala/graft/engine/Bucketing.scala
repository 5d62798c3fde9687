package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the shuffle-elimination half of the SCALE.md
  * story, made concrete. A fact-fact join (lineitem ⋈ orders on
  * orderkey) shuffles both sides on every run; bucketing both tables by
  * the join key at WRITE time moves that shuffle to ingestion, once —
  * subsequent joins read co-located buckets and the exchange disappears
  * from the plan (asserted in `BucketingSpec`, not just claimed).
  *
  * `bucketBy` requires a catalog table (`saveAsTable`) — bucket
  * metadata lives in the catalog, not the files.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed (and sorted) by `keys`. */
  def writeBucketed(df: DataFrame, tableName: String, numBuckets: Int,
                    keys: Seq[String]): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(tableName)

  /** Co-located equi-join of two bucketed catalog tables on their
    * bucket keys. With matching bucket counts, neither side shuffles.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
