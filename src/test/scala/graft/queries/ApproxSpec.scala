package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q43's output embeds its own accuracy contract: the HLL++ estimate is
  * engine-specific, so the query emits exact distinct counts plus
  * boolean ≤5%-relative-error checks, and the DuckDB oracle pins the
  * booleans to literal TRUE. This spec exercises the same bound at a
  * non-trivial scale (sf0.1 — the bench SF, ~240k distinct partkeys
  * across groups), so a sketch regression fails here AND in the
  * driver's hash compare.
  */
class ApproxSpec extends SparkSpec {

  test("approx_percentile within 1% of exact percentile at sf0.1") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap"),
        expr("percentile(l_extendedprice, 0.5)").as("ex"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ap, ex) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(ap - ex) / ex < 0.01, s"group ${r.get(0)}: $ap vs $ex")
    }
  }

  test("q43: approx_count_distinct within 5% of exact at sf0.1") {
    val rows = SparkEntry.queries("q43_approx_distinct")(
      spark, "/root/testdata/sf0.1").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_tol"),
        s"group ${r.get(0)}: partkey sketch out of 5% tolerance " +
          s"(exact=${r.getAs[Long]("exact_parts")})")
      assert(r.getAs[Boolean]("orders_within_tol"),
        s"group ${r.get(0)}: orderkey sketch out of 5% tolerance " +
          s"(exact=${r.getAs[Long]("exact_orders")})")
    }
  }
}
