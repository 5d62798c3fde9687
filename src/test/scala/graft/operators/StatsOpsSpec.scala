package graft.operators

import graft.SparkSpec

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("matrixStats: exact sample moments on a hand-checked frame, " +
    "lattice scaling, null rows dropped, pair order kept") {
    // y = 2x exactly; b is y on a cent lattice; one null row drops
    val df = Seq(
      (Some(1.0), Some(2.0), Some(0.02)),
      (Some(2.0), Some(4.0), Some(0.04)),
      (Some(3.0), Some(6.0), Some(0.06)),
      (None: Option[Double], Some(9.0), Some(0.09)))
      .toDF("a", "y", "b")
    val out = StatsOps.matrixStats(df,
      Seq(("a", 1L), ("y", 1L), ("b", 100L)))
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "y"), ("a", "b"), ("y", "b")))
    val ay = out(0)
    assert(ay.getLong(2) == 3L)               // n after the null drop
    assert(ay.getDouble(3) == 2.0)            // mean_a
    assert(ay.getDouble(4) == 4.0)            // mean_y
    assert(ay.getDouble(5) == 1.0)            // var_a = 6/(3*2)
    assert(ay.getDouble(6) == 4.0)            // var_y
    assert(ay.getDouble(7) == 2.0)            // cov(a,y) = 12/6
    assert(math.abs(ay.getDouble(8) - 1.0) < 1e-12)
    val ab = out(1)
    assert(ab.getDouble(7) == 0.02)           // cov rescales by 1·100
    assert(math.abs(ab.getDouble(8) - 1.0) < 1e-12)
  }

  test("matrixStats agrees with the classical formulas on fixture " +
    "lineitem columns") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount")
    val out = StatsOps.matrixStats(li, Seq(("l_quantity", 1L),
      ("l_extendedprice", 100L), ("l_discount", 100L)))
      .collect()
    assert(out.length == 3)
    val stats = li.selectExpr(
      "count(*) as n", "avg(l_quantity) as mq",
      "var_samp(l_quantity) as vq",
      "covar_samp(l_quantity, l_extendedprice) as cqp",
      "corr(l_quantity, l_extendedprice) as rqp").collect().head
    val qp = out(0)
    assert(qp.getLong(2) == stats.getLong(0))
    assert(math.abs(qp.getDouble(3) - stats.getDouble(1)) < 1e-9)
    assert(math.abs(qp.getDouble(5) - stats.getDouble(2)) < 1e-6)
    assert(math.abs(qp.getDouble(7) - stats.getDouble(3)) < 1e-4)
    assert(math.abs(qp.getDouble(8) - stats.getDouble(4)) < 1e-9)
  }

  test("matrixStats fails LOUDLY when a value breaks the 2^31 " +
    "lattice bound — never silently drops rows") {
    val df = Seq((1.0, 2.0), (3.0e9, 4.0)).toDF("a", "b")
    val e = intercept[Exception] {
      StatsOps.matrixStats(df, Seq(("a", 1L), ("b", 1L))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("lattice bound")), e.toString)
  }

  test("matrixStats on an empty (or all-null-filtered) source " +
    "returns ES's empty result, not a lattice-bound error") {
    val empty = Seq.empty[(Double, Double)].toDF("a", "b")
    assert(StatsOps.matrixStats(empty,
      Seq(("a", 1L), ("b", 1L))).collect().isEmpty)
    // all rows null-filtered is the same empty aggregate
    val nulls = Seq((Option.empty[Double], Some(1.0)),
      (Some(2.0), Option.empty[Double])).toDF("a", "b")
    assert(StatsOps.matrixStats(nulls,
      Seq(("a", 1L), ("b", 1L))).collect().isEmpty)
  }

  test("matrixStats rejects degenerate requests") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      StatsOps.matrixStats(df, Seq(("a", 1L)))
    }
    intercept[IllegalArgumentException] {
      StatsOps.matrixStats(df, Seq(("a", 1L), ("a", 1L)))
    }
  }
}
