package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-size estimation from count-min sketches — the AMS/CMS inner
  * product (Alon-Matias-Szegedy; Cormode-Muthukrishnan §4.2): for
  * count sketches A and B of two key columns,
  * `est = min_d Σ_c A[d][c]·B[d][c]` overestimates the equi-join
  * cardinality `Σ_k a(k)·b(k)` (never under — every true collision
  * lands in the same cell) and is within `eps·N_a·N_b` with
  * probability ≥ 1−δ. This is the statistic an optimizer wants BEFORE
  * committing to a join strategy: a skew-blown join size argues for
  * salting (SkewJoin) or a different plan, and the sketches cost one
  * map-side-combined pass per side, mergeable across batches (CMS
  * linearity — the q125 ingest posture).
  *
  * The sketch here is the SPARSE relational form of a CMS: a
  * `(d, c, n)` frame with at most depth·width rows — bounded by the
  * sketch GEOMETRY, not the data — built with the repo's portable
  * integer hash family ([[TextOps.permHashExpr]]), so the estimate is
  * exact integer arithmetic and the DuckDB oracle reproduces it
  * BITWISE (stronger than q125's one-sided contract pins, which Spark's
  * opaque `CountMinSketch` hashing forces there).
  *
  * Reference basis: the reference delegates planning to MySQL/Postgres
  * (`/root/reference/api/controllers/query_controller.go:98`); this is
  * the engine-native statistics tier (SURVEY §2.5).
  */
object JoinStats {

  /** Sparse CMS of a long key column: (d, c, n) with d < depth,
    * c < width. One explode (×depth) + a partial-aggregated rollup to
    * ≤ depth·width cells.
    */
  def cmsCells(df: DataFrame, keyCol: String, depth: Int = 5,
               width: Int = 256): DataFrame = {
    val v = s"pmod($keyCol, ${TextOps.PermP}L)"
    df.select(col(keyCol))
      .withColumn("d", explode(expr(s"sequence(0, ${depth - 1})")))
      .withColumn("c",
        expr(s"${TextOps.permHashExpr(v, "d")} % ${width}L"))
      .groupBy("d", "c")
      .agg(count(lit(1)).as("n"))
  }

  /** CMS inner-product join-size estimate: join the two sparse
    * sketches on (d, c) — absent cells are zero and contribute
    * nothing — sum per row, take the min row. Returns a 1-row frame
    * `(est_size)`.
    */
  def innerProductEstimate(cellsA: DataFrame,
                           cellsB: DataFrame): DataFrame =
    cellsA.select(col("d"), col("c"), col("n").as("na"))
      .join(cellsB.select(col("d"), col("c"), col("n").as("nb")),
        Seq("d", "c"))
      .groupBy("d")
      .agg(sum(col("na") * col("nb")).as("s"))
      .agg(min("s").as("est_size"))

  /** Exact equi-join cardinality `Σ_k a(k)·b(k)` — the audited truth:
    * two grouped counts joined on the key, never the join itself.
    */
  def exactJoinSize(a: DataFrame, keyA: String, b: DataFrame,
                    keyB: String): DataFrame = {
    val ca = a.groupBy(col(keyA).as("k")).agg(count(lit(1)).as("na"))
    val cb = b.groupBy(col(keyB).as("k")).agg(count(lit(1)).as("nb"))
    ca.join(cb, "k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L))
        .as("exact_size"))
  }

  /** The audit row for one (a ⋈ b) pair: exact size, sketch estimate,
    * and the never-underestimates flag the CMS construction
    * guarantees.
    */
  def estimateReport(name: String, a: DataFrame, keyA: String,
                     b: DataFrame, keyB: String, depth: Int = 5,
                     width: Int = 256): DataFrame =
    exactJoinSize(a, keyA, b, keyB)
      .crossJoin(innerProductEstimate(
        cmsCells(a, keyA, depth, width), cmsCells(b, keyB, depth, width)))
      .select(lit(name).as("join_name"), col("exact_size"),
        col("est_size"),
        (col("est_size") >= col("exact_size")).as("overestimates"))
}
