package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch query surface over Spark's bundled
  * `org.apache.spark.util.sketch.CountMinSketch`.
  *
  * Spark ships the BUILD side at the SQL surface — the built-in
  * `count_min_sketch(item, eps, confidence, seed)` aggregate folds a
  * column into a serialized sketch with map-side partial merge — but
  * neither a PROBE (estimate a key's count from the binary) nor a
  * sketch-level UNION (merge pre-built sketches, the way
  * `hll_union_agg` merges HLLs). Both halves are what make the sketch
  * useful at 100 TB:
  *
  *  - [[CmsEstimate]] (`graft_cms_estimate(cms, xxhash64(key))`):
  *    point-frequency probe. The sketch side must be a per-query
  *    constant (literal or scalar subquery); it is deserialized ONCE
  *    per task and the probe is codegen'd against the cached object —
  *    the `BloomFilterMightContain` posture, not a per-row parse.
  *  - [[CmsMergeAggregate]] (`graft_cms_merge_agg(cms)`): unions
  *    already-built sketches. CMS counters are linear (cell-wise sums),
  *    so merging per-partition / per-day sketches is EXACTLY the sketch
  *    of the union — ingest can sketch each batch once and the fleet
  *    rolls up in bytes-per-sketch, never re-reading the corpus
  *    (the q119 HLL-rollup posture, for frequencies instead of
  *    cardinalities).
  *
  * Items are `xxhash64(key)` longs on both build and probe sides, so
  * one hashing convention covers strings and composites; estimates
  * carry the standard CMS one-sided error — `est >= true` always,
  * `est <= true + eps·N` with probability ≥ confidence per probe.
  *
  * Reference basis: the reference has no sketch tier (it delegates all
  * SELECT execution — `/root/reference/api/controllers/query_controller.go:98`);
  * beyond-parity scale surface alongside [[BloomFunctions]].
  */
object CmsFunctions {

  val estimateRegistration
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cms_estimate"),
    new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
    (children: Seq[Expression]) =>
      children match {
        case Seq(sk, item) => CmsEstimate(sk, item)
        case _ => throw new IllegalArgumentException(
          "graft_cms_estimate(cms, xxhash64(key))")
      })

  val mergeRegistration
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cms_merge_agg"),
    new ExpressionInfo(classOf[CmsMergeAggregate].getName,
      "graft_cms_merge_agg"),
    (children: Seq[Expression]) =>
      children match {
        case Seq(sk) => CmsMergeAggregate(sk)
        case _ => throw new IllegalArgumentException(
          "graft_cms_merge_agg(cms)")
      })
}

/** `graft_cms_estimate(cms, xxhash64(key)) -> BIGINT` — see
  * [[CmsFunctions]]. The sketch operand is evaluated input-free (it
  * must be a constant or scalar subquery, which Spark materializes
  * before the consuming stage runs), deserialized lazily once, and
  * shared across rows; codegen references the cached object directly so
  * the probe stays inside whole-stage codegen.
  */
case class CmsEstimate(sketchExpr: Expression, itemExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = sketchExpr
  override def right: Expression = itemExpr
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketchExpr.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: sketch must be BINARY (a count_min_sketch result)")
    else if (itemExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: item must be BIGINT — hash the key with xxhash64")
    else sketchExpr match {
      // the once-per-task deserialization contract requires a
      // per-query constant; a per-row sketch column would mis-evaluate
      // (same analysis-time gate as BloomFilterMightContain)
      case e if e.foldable => TypeCheckResult.TypeCheckSuccess
      // PlanExpression covers both the analysis-time SubqueryExpression
      // and the planned execution ScalarSubquery (the check re-runs
      // after physical planning rewrites the operand)
      case _: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the sketch must be a constant or scalar " +
          "subquery, not a per-row column (aggregate it first, or join " +
          "the sketch in as a scalar subquery)")
    }

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = sketchExpr.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any =
    if (sketch == null) null
    else {
      val item = itemExpr.eval(input)
      if (item == null) null
      else sketch.estimateCount(java.lang.Long.valueOf(
        item.asInstanceOf[Long]))
    }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    if (sketch == null) {
      ExprCode.forNullValue(dataType)
    } else {
      // The deserialized sketch rides the codegen references array; the
      // generated probe never touches the binary operand's bytes.
      val ref = ctx.addReferenceObj("cmsSketch", sketch,
        classOf[CountMinSketch].getName)
      nullSafeCodeGen(ctx, ev, (_, item) =>
        s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($item));")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(sketchExpr = newLeft, itemExpr = newRight)
}

/** `graft_cms_merge_agg(cms) -> BINARY` — unions serialized
  * count-min sketches built with identical `(eps, confidence, seed)`;
  * see [[CmsFunctions]]. Buffer is the live `CountMinSketch` (null
  * until the first input — the dimensions come from the first sketch
  * merged, so the aggregate works for any build parameters without
  * repeating them); partial-exchange serialization is the sketch's own
  * portable format. Incompatible dimensions fail loudly.
  */
case class CmsMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY count_min_sketch column")

  override def createAggregationBuffer(): CountMinSketch = null

  private def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  private def union(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
    if (a == null) b
    else if (b == null) a
    else
      try { a.mergeInPlace(b); a }
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"$prettyName: sketches built with different " +
            s"(eps, confidence, seed) cannot be merged", e)
      }

  override def update(buf: CountMinSketch,
      input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else union(buf, read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: CountMinSketch,
      other: CountMinSketch): CountMinSketch = union(buf, other)

  override def eval(buf: CountMinSketch): Any =
    if (buf == null) null else serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val out = new ByteArrayOutputStream()
      buf.writeTo(out)
      out.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
