package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinStatsSpec extends SparkSpec {
  import spark.implicits._

  test("exactJoinSize equals the materialized join's row count") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 9L).toDF("kb")
    val exact = JoinStats.exactJoinSize(a, "k", b, "kb")
      .as[Long].head()
    val real = a.join(b, col("k") === col("kb")).count()
    assert(exact == real && exact == 4L) // 2*1 + 1*2 + 0 + 0
    // disjoint keys → 0, not null
    assert(JoinStats.exactJoinSize(a, "k",
      Seq(7L).toDF("kb"), "kb").as[Long].head() == 0L)
  }

  test("inner-product estimate never underestimates, and is exact " +
    "for a single-key side") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val report = JoinStats.estimateReport("self", li, "l_partkey",
      li, "l_partkey")
      .as[(String, Long, Long, Boolean)].head()
    assert(report._4, s"CMS inner product underestimated: $report")
    assert(report._3 >= report._2)
    // one distinct key: every row of each sketch row-pair meets in one
    // cell, so the product collapses to na*nb = the exact join size
    val single = Seq.fill(7)(42L).toDF("k")
    val singleB = Seq.fill(3)(42L).toDF("k")
    val r = JoinStats.estimateReport("one", single, "k", singleB, "k")
      .as[(String, Long, Long, Boolean)].head()
    assert(r._2 == 21L && r._3 == 21L)
  }

  test("sketch size is bounded by geometry, not data") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val cells = JoinStats.cmsCells(li, "l_orderkey", depth = 5,
      width = 256)
    assert(cells.count() <= 5L * 256L)
  }
}
