package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q43 has no DuckDB oracle by design (HLL++ estimates are
  * engine-specific), so its accuracy contract is pinned here instead:
  * the sketch must land within 5% relative error of the exact distinct
  * counts it rides along with, at a non-trivial scale (sf0.1 — the
  * bench SF, ~240k distinct partkeys across groups).
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
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr < 0.05,
        s"group ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }
}
