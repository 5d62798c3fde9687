package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact multi-field statistics — Elasticsearch's `matrix_stats`
  * aggregation (the covariance / correlation matrix over a set of
  * numeric fields) with this engine's determinism contract.
  *
  * The reference delegates aggregations to Elasticsearch
  * (`api/controllers/elastic_controller.go:196-229`); ES computes
  * matrix_stats with streaming floating-point accumulators whose
  * results depend on document order — unacceptable here, where every
  * operator must hash bit-identically against the DuckDB oracle and
  * be invariant to partitioning. So the moments accumulate EXACTLY:
  * each field quantizes to a long on its declared lattice
  * (`scale` — prices are cents, quantities integers; the fixture
  * columns are exact multiples, so quantization is lossless), and
  * the sums Σx, Σx², Σxy run in DECIMAL(38,0) (128-bit exact — the
  * oracle mirrors with HUGEINT). The derived statistics then come
  * from ONE fixed-order double pipeline over those exact integers
  * (divisions, `sqrt` — all IEEE-correctly-rounded), so mean,
  * variance, covariance and correlation are bit-stable across
  * engines, partitionings and shuffle orders.
  *
  * Magnitude proof for the fixture tier (an in-plan `assert_true`
  * guard enforces the general case — violations fail the job loudly
  * rather than dropping rows): |x| < 2³¹ keeps every per-row product
  * x·y < 2⁶²
  * (long-exact) and every 128-bit sum term n·Σxy < 10³⁸ for
  * n ≤ 10¹². ES's per-field skewness/kurtosis extras need Σx³/Σx⁴
  * terms like s₁⁴ that overflow 128 bits for cent-scaled prices
  * (s₁ ~ 10¹³ → s₁⁴ ~ 10⁵²) — they are deliberately OMITTED rather
  * than computed in order-dependent floats; a future exact path
  * needs anchored centering plus a 256-bit accumulator.
  *
  * Scale shape: one partial+final aggregation pass over the scanned
  * columns (column-pruned, predicate-pushed) producing a single
  * row; the pair matrix unpivots driver-side from that row — no
  * second scan, no shuffle beyond the one reduce.
  */
object StatsOps {

  /** The covariance/correlation matrix over `fields` (name → lattice
    * scale: the column's values times `scale` must be integral, e.g.
    * 100 for 2-decimal money). Rows with a null in ANY field drop
    * (ES's rule: matrix_stats skips documents missing a field unless
    * told otherwise). Output: one row per unordered field pair
    * (request order): (field_a, field_b, n_docs, mean_a, mean_b,
    * var_a, var_b, covariance, correlation) — sample (n−1)
    * covariance/variance, ES's convention. */
  def matrixStats(df: DataFrame, fields: Seq[(String, Long)])
      : DataFrame = {
    require(fields.size >= 2, "matrix_stats needs at least two fields")
    require(fields.map(_._1).distinct.size == fields.size,
      "duplicate fields")
    fields.foreach { case (f, sc) =>
      require(sc >= 1, s"scale must be >= 1 for $f")
    }
    val dec = "decimal(38,0)"
    val names = fields.map(_._1)
    val quantized = fields.foldLeft(
      df.filter(names.map(col(_).isNotNull).reduce(_ && _))) {
      case (acc, (f, sc)) =>
        acc.withColumn(s"x_$f",
          round(col(f) * lit(sc.toDouble)).cast("long"))
    }
    val pairs = for {
      i <- fields.indices; j <- fields.indices if i < j
    } yield (names(i), names(j))
    val aggs =
      names.flatMap { f =>
        Seq(sum(col(s"x_$f").cast(dec)).as(s"s1_$f"),
          sum((col(s"x_$f") * col(s"x_$f")).cast(dec)).as(s"s2_$f"),
          max(abs(col(s"x_$f"))).as(s"mx_$f"))
      } ++ pairs.map { case (a, b) =>
        sum((col(s"x_$a") * col(s"x_$b")).cast(dec)).as(s"s11_${a}_$b")
      }
    // the 2^31 lattice bound the long-product proof needs is
    // ENFORCED, not silently filtered: a row outside it fails the
    // whole aggregation loudly (dropping data from a statistics
    // panel would be a correctness lie; widening needs a 256-bit
    // accumulator, not a quieter bug). The guard WEAVES into the
    // `n` every statistic reads — a standalone asserted column
    // would be pruned away as unused — as `+ coalesce(assert, 0)`:
    // assert_true is null on success, so n is unchanged, and a
    // violation raises before any output row materializes.
    // null-safe: over an EMPTY (or all-null-filtered) source the max
    // aggregates to null, and a bare `null < bound` is null — which
    // assert_true RAISES, turning "no rows" into a misleading
    // lattice-bound error. An empty panel must instead flow through
    // and produce ES's empty-stats shape (n = 0 rows downstream).
    val guardZero = names.map { f =>
      coalesce(
        assert_true(
          col(s"mx_$f").isNull ||
            col(s"mx_$f") < lit(Int.MaxValue.toLong),
          lit(s"matrix_stats: |$f x scale| exceeds the 2^31 " +
            "lattice bound - pick a coarser scale")).cast(dec),
        lit(0).cast(dec))
    }.reduce(_ + _)
    val row = quantized
      .agg(count(lit(1)).cast(dec).as("n"), aggs: _*)
      .withColumn("n", col("n") + guardZero)
    val scaleOf = fields.toMap
    // exact 128-bit central terms, then ONE fixed-order double
    // pipeline per statistic
    def a2(f: String): Column =
      col("n") * col(s"s2_$f") - col(s"s1_$f") * col(s"s1_$f")
    def meanCol(f: String): Column =
      (col(s"s1_$f").cast("double") / col("n").cast("double")) /
        lit(scaleOf(f).toDouble)
    def varCol(f: String): Column = {
      val den = (col("n") * (col("n") - lit(1))).cast("double")
      (a2(f).cast("double") / den) /
        lit((scaleOf(f) * scaleOf(f)).toDouble)
    }
    // one pair row per (a, b): the tiny pair frame cross-joins the
    // single aggregated row (broadcast, ONE aggregation execution —
    // a union of per-pair selects would re-run the scan per pair)
    // and each statistic dispatches on the pair key
    val spark = df.sparkSession
    val pairFrame = spark.createDataFrame(
      pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) })
      .toDF("ord", "field_a", "field_b")
    def byPair(f: (String, String) => Column): Column =
      pairs.foldLeft(lit(null).cast("double")) { case (acc, (a, b)) =>
        when(col("field_a") === lit(a) && col("field_b") === lit(b),
          f(a, b)).otherwise(acc)
      }
    val den = (col("n") * (col("n") - lit(1))).cast("double")
    def cab(a: String, b: String): Column =
      col("n") * col(s"s11_${a}_$b") - col(s"s1_$a") * col(s"s1_$b")
    pairFrame.crossJoin(broadcast(row))
      // ES's empty-result shape: matrix_stats over zero qualifying
      // documents answers with no field pairs at all (`fields: []`),
      // not a panel of NaNs — the n = 0 row drops here, AFTER the
      // null-safe guard above let the empty aggregate through
      .filter(col("n") > lit(0))
      .select(col("field_a"), col("field_b"),
        col("n").cast("long").as("n_docs"),
        byPair((a, _) => meanCol(a)).as("mean_a"),
        byPair((_, b) => meanCol(b)).as("mean_b"),
        byPair((a, _) => varCol(a)).as("var_a"),
        byPair((_, b) => varCol(b)).as("var_b"),
        byPair((a, b) => (cab(a, b).cast("double") / den) /
          lit((scaleOf(a) * scaleOf(b)).toDouble)).as("covariance"),
        byPair((a, b) => cab(a, b).cast("double") /
          (sqrt(a2(a).cast("double")) * sqrt(a2(b).cast("double"))))
          .as("correlation"),
        col("ord"))
      .orderBy("ord").drop("ord")
  }
}
