package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("top-k equals the window formulation on fixture data") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("l_extendedprice").as("score"))
    val topk = F.udaf(new TopKAggregator(5), Encoders.product[Scored])
    val viaUdaf = li.groupBy("g").agg(topk(col("id"), col("score")).as("top"))
      .select(col("g"), F.explode(col("top")).as("item"))
      .select(col("g"), col("item.id"), col("item.score"))
      .as[(String, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(F.desc("score"), F.asc("id"))
    val viaWindow = li
      .withColumn("rn", F.row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .as[(String, Long, Double)].collect().toSet
    assert(viaUdaf == viaWindow)
  }

  test("merge keeps the k-bound and ordering invariants") {
    val agg = new TopKAggregator(3)
    val a = Seq(Scored(1, 9.0), Scored(2, 7.0), Scored(3, 5.0))
    val b = Seq(Scored(4, 8.0), Scored(5, 6.0))
    val m = agg.merge(a, b)
    assert(m.map(_.id) == Seq(1L, 4L, 2L))
    assert(m.size == 3)
    // reduce ignores items below the current k-th score
    assert(agg.reduce(m, Scored(9, 1.0)) == m)
    // ties break by id ascending
    val t = agg.merge(Seq(Scored(7, 8.0)), Seq(Scored(6, 8.0)))
    assert(t.map(_.id) == Seq(6L, 7L))
  }
}
