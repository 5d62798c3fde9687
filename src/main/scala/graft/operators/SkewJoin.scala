package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew
  * handling isn't enough (SCALE.md). A hot key (one customer with 10⁸
  * orders, one null-bucket) sends its entire partition to one task; a
  * shuffle-based join then runs at the speed of that straggler.
  *
  * Salting splits each hot left-side key across `salts` sub-partitions
  * deterministically (content hash of the whole row, not rand() — the
  * join stays reproducible), and replicates the right side once per
  * salt. Correctness is unchanged: every (left row, right row) pair
  * with equal keys meets in exactly one (key, salt) bucket.
  * Cost: right side × salts — use on (big skewed) ⋈ (small-ish) shapes;
  * for big⋈big, salt only the hot keys (split + union).
  */
object SkewJoin {

  /** Deterministic salt in [0, salts) from the hash of all columns. */
  private def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts))

  /** Inner equi-join `left(leftKey) = right(rightKey)` with the left
    * side salted and the right side replicated `salts` times.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 salts: Int = 8): DataFrame = {
    val l = left.withColumn("_salt", saltCol(left, salts))
    val r = right
      .withColumn("_salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
    l.join(r, l(leftKey) === r(rightKey) && l("_salt") === r("_salt"))
      .drop("_salt")
  }
}
