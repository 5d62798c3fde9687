package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

/** SQL-surface names for Spark's runtime-filter Bloom expressions.
  *
  * Spark ships a Tungsten-native Bloom filter pair —
  * `BloomFilterAggregate` (builds the filter as a binary sketch, with
  * partial/final merge so the build is one map-side-combined pass) and
  * `BloomFilterMightContain` (codegen'd membership probe) — but only
  * wires them through the optimizer's automatic
  * `InjectRuntimeFilter` rule, never the function registry. Registering
  * them here (graft-prefixed names, so a future upstream registration
  * cannot collide) lets a query state the 100 TB semi-join pruning
  * pattern EXPLICITLY:
  *
  *   build a Bloom over the small side's join keys (a scalar subquery
  *   → one tiny binary), probe it in a `WHERE` on the big side BEFORE
  *   the shuffle, then exact-verify with the real join. No false
  *   negatives ⇒ the result is exactly the semi join; the probe prunes
  *   the shuffle to ~|matches| + fp·|big|.
  *
  * Both inputs are `xxhash64(key)` longs — the same hashing the
  * injected runtime filter uses. The aggregate's single-arg form takes
  * its sizing from `spark.sql.optimizer.runtime.bloomFilter.*` (1M
  * expected items / 8M bits by default); the 2-arg form overrides the
  * expected item count.
  *
  * Reference basis: the reference engine delegates all SELECT execution
  * to external stores (`/root/reference/api/controllers/query_controller.go:98`)
  * and has no sketch tier; this is part of the beyond-parity scale
  * surface (SURVEY §2.5).
  */
object BloomFunctions {

  val aggRegistration
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    (children: Seq[Expression]) =>
      children match {
        case Seq(c) => new BloomFilterAggregate(c)
        // the aggregate type-checks expectedItems as BIGINT; widen so a
        // plain integer literal works at the SQL surface
        case Seq(c, n) => new BloomFilterAggregate(c, Cast(n, LongType))
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(xxhash64(key)[, expectedItems])")
      })

  val probeRegistration
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "graft_bloom_might_contain"),
    (children: Seq[Expression]) =>
      children match {
        case Seq(filter, key) => BloomFilterMightContain(filter, key)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_might_contain(bloom, xxhash64(key))")
      })
}
