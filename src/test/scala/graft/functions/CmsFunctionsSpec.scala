package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CmsFunctionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  // 100 'a', 10 'b', 1 'c' — skewed enough that over-estimates on the
  // tail are observable if the sketch is undersized
  private def items = (Seq.fill(100)("a") ++ Seq.fill(10)("b") ++ Seq("c"))
    .toDF("k")

  test("estimate never under-counts and is exact when the sketch is wide") {
    items.createOrReplaceTempView("cms_in")
    val out = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(xxhash64(k), 0.001d, 0.99d, 42)
        |            AS s FROM cms_in)
        |SELECT k, count(*) AS exact_n,
        |  graft_cms_estimate((SELECT s FROM sk), xxhash64(k)) AS est_n
        |FROM cms_in GROUP BY k""".stripMargin)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // one-sided error: est >= exact always; eps 0.001 over N=111 means
    // the +eps*N slack rounds to zero -> exact
    assert(out("a") == ((100L, 100L)), out)
    assert(out("b") == ((10L, 10L)), out)
    assert(out("c") == ((1L, 1L)), out)
  }

  test("merging per-group sketches equals one sketch over the union") {
    items.withColumn("g", (monotonically_increasing_id() % 3).cast("int"))
      .createOrReplaceTempView("cms_g")
    val merged = spark.sql(
      """WITH per AS (SELECT g,
        |    count_min_sketch(xxhash64(k), 0.001d, 0.99d, 42) AS s
        |  FROM cms_g GROUP BY g),
        | u AS (SELECT graft_cms_merge_agg(s) AS s FROM per)
        |SELECT k, graft_cms_estimate((SELECT s FROM u), xxhash64(k)) AS est
        |FROM (SELECT DISTINCT k FROM cms_g)""".stripMargin)
      .as[(String, Long)].collect().toMap
    // CMS counters are linear: the union of per-group sketches IS the
    // sketch of the whole stream
    assert(merged == Map("a" -> 100L, "b" -> 10L, "c" -> 1L), merged)
  }

  test("merging sketches with different dimensions fails loudly") {
    items.createOrReplaceTempView("cms_mix")
    val e = intercept[Exception] {
      spark.sql(
        """WITH a AS (SELECT count_min_sketch(xxhash64(k), 0.001d, 0.99d, 42)
          |           AS s FROM cms_mix),
          | b AS (SELECT count_min_sketch(xxhash64(k), 0.01d, 0.9d, 7)
          |       AS s FROM cms_mix),
          | both AS (SELECT s FROM a UNION ALL SELECT s FROM b)
          |SELECT graft_cms_merge_agg(s) FROM both""".stripMargin).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).map(_.getMessage).filter(_ != null)
        .exists(m => m.contains("cannot be merged") ||
          m.contains("graft_cms_merge_agg")), e.getMessage)
  }

  test("a per-row sketch column is rejected at analysis, not mis-run") {
    items.createOrReplaceTempView("cms_col")
    val e = intercept[Exception] {
      spark.sql(
        """WITH per AS (
          |  SELECT k, count_min_sketch(xxhash64(k), 0.001d, 0.99d, 42) AS s
          |  FROM cms_col GROUP BY k)
          |SELECT graft_cms_estimate(s, xxhash64(k)) FROM per""".stripMargin)
        .collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("constant or scalar subquery") ||
        e.getMessage.contains("DATATYPE_MISMATCH")), e.getMessage)
  }

  test("null item estimates to null; empty input merges to null") {
    items.createOrReplaceTempView("cms_n")
    val r = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(xxhash64(k), 0.001d, 0.99d, 42)
        |            AS s FROM cms_n)
        |SELECT graft_cms_estimate((SELECT s FROM sk), CAST(NULL AS BIGINT))
        |  AS e""".stripMargin).collect().head
    assert(r.isNullAt(0))
    val empty = spark.sql(
      """SELECT graft_cms_merge_agg(s) AS m FROM (
        |  SELECT CAST(NULL AS BINARY) AS s WHERE 1 = 0)""".stripMargin)
      .collect().head
    assert(empty.isNullAt(0))
  }
}
