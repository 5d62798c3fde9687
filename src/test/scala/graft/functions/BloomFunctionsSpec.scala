package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomFunctionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("probe has no false negatives, build side stays one tiny binary") {
    Seq(1L, 5L, 9L).toDF("k").createOrReplaceTempView("bf_small")
    Seq(1L, 2L, 5L, 7L, 9L, 12L).toDF("k").createOrReplaceTempView("bf_big")
    val hits = spark.sql(
      """SELECT k FROM bf_big
        |WHERE graft_bloom_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(k)) FROM bf_small),
        |  xxhash64(k))""".stripMargin)
      .as[Long].collect().toSet
    // no false negatives: every member of the build side must probe true
    assert(Set(1L, 5L, 9L).subsetOf(hits), hits)
  }

  test("2-arg graft_bloom_agg sizes the filter from expectedItems") {
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("bf_sized")
    // a tiny expectedItems still yields a working (no-false-negative)
    // filter — the second argument reaches BloomFilterAggregate
    val hits = spark.sql(
      """SELECT k FROM bf_sized
        |WHERE graft_bloom_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(k), 10) FROM bf_sized),
        |  xxhash64(k))""".stripMargin).count()
    assert(hits == 3L)
  }

  test("undersized expectedItems silently degrades the fp rate — why " +
    "q118 pins sizing explicitly") {
    // 20k distinct build keys; probe 20k DISJOINT keys, so every hit
    // is a false positive. Deterministic: xxhash64 over fixed keys,
    // zero RNG.
    spark.range(0L, 20000L).toDF("k").createOrReplaceTempView("bf_members")
    spark.range(100000L, 120000L).toDF("k")
      .createOrReplaceTempView("bf_nonmembers")
    def fpRate(expectedItems: Long): Double =
      spark.sql(
        s"""SELECT avg(CAST(graft_bloom_might_contain(
           |  (SELECT graft_bloom_agg(xxhash64(k), $expectedItems)
           |   FROM bf_members),
           |  xxhash64(k)) AS DOUBLE)) AS fp
           |FROM bf_nonmembers""".stripMargin)
        .as[Double].head()
    val sized = fpRate(20000L)     // 8 bits/item at true cardinality
    val undersized = fpRate(200L)  // 100x over capacity: ~all bits set
    assert(sized < 0.05, s"right-sized filter fp=$sized")
    assert(undersized > 0.5,
      s"expected near-saturated fp when 100x over capacity, got $undersized")
  }

  test("wrong arity raises a clear error naming the signature") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_bloom_agg(xxhash64(1), 10, 99)").collect()
    }
    assert(e1.getMessage.contains("graft_bloom_agg"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_bloom_might_contain(NULL)").collect()
    }
    assert(e2.getMessage.contains("graft_bloom_might_contain"), e2.getMessage)
  }
}
