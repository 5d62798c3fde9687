package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir =
    graft.queries.SqlSurface.ensureZonemappedLineitem(spark, sf001)
  private lazy val plain = spark.read.parquet(s"$sf001/lineitem.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("l_orderkey", "l_linenumber", "l_partkey")
    .as[(Long, Long, Long)].collect().toSet

  test("zone-mapped copy is lossless: a Bloom-pruned point lookup " +
    "returns exactly the plain table's rows") {
    val (survivors, df) = ZoneMap.zonemapScan(spark, dir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, point = 777L)
    assert(rows(df) == rows(plain.filter(col("l_orderkey") === 777)))
    assert(rows(df).nonEmpty, "fixture must contain order 777")
    // the Bloom lever: order 777 has a handful of lineitems, so at
    // most that many units (plus rare false positives) survive out
    // of 16 — the layout column cannot prune this predicate at all
    assert(survivors.size < 16,
      s"Bloom pruned nothing: $survivors")
    assert(survivors.size <= 8, s"pruning too weak: $survivors")
  }

  test("range lever prunes to the low buckets; absent key prunes to " +
    "(almost) nothing; both stay lossless") {
    // partkey <= 24 of span 0..199 over 16 units → units 0..1 only
    val (sLow, dfLow) = ZoneMap.zonemapScan(spark, dir,
      "l_partkey", "l_orderkey", 0L, 24L, point = 777L)
    assert(sLow.forall(_ <= 1), s"range lever failed: $sLow")
    assert(rows(dfLow) == rows(plain.filter(
      col("l_partkey") <= 24 && col("l_orderkey") === 777)))
    // a key that was never written: only Bloom false positives can
    // survive, and the residual filter still yields zero rows
    val (sAbsent, dfAbsent) = ZoneMap.zonemapScan(spark, dir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, point = 99999999L)
    assert(sAbsent.size <= 2, s"absent-key pruning too weak: $sAbsent")
    assert(dfAbsent.count() == 0)
  }

  test("the manifest is bounded by the layout: one stats row per " +
    "file unit") {
    val stats = spark.read.parquet(s"$dir/zonemap")
    assert(stats.count() <= 16)
    // min/max really describe the files: unit ranges are disjoint
    val ranges = stats.select("zf", "mn", "mx")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, mxA), (_, mnB, _)) => assert(mxA < mnB)
      case _ =>
    }
  }
}
