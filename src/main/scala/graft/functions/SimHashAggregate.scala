package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native SimHash sketch aggregate: `simhash_agg(tokHash, tf)` folds a
  * group's (token hash, term frequency) stream directly into the 64-bit
  * signature — the TypedImperativeAggregate tier (SURVEY §4.3: custom
  * imperative aggregates for native sketches).
  *
  * vs the k-column formulation (k separate `sum()` aggregates then an
  * array rebuild): one buffer of k longs instead of k agg expressions,
  * so codegen compiles a trivial call instead of a 64-expression
  * method, and update is a tight JVM loop over precomputed (a_j, b_j).
  * Buffer merges are elementwise adds — map-side partial aggregation
  * works as for any imperative aggregate.
  *
  * Arithmetic is EXACTLY [[graft.operators.TextOps.permHashExpr]]:
  * bit_j = sign of Σ tf·(2·((v·a_j + b_j mod p) mod 2) − 1), so
  * signatures are bit-identical to the expression formulation and to
  * the DuckDB oracle.
  */
case class SimHashAggregate(
    vExpr: Expression, tfExpr: Expression, nBits: Int = 64,
    emitBands: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L
  private lazy val as: Array[Long] =
    Array.tabulate(nBits)(j => (2654435761L * (j + 1)) % P)
  private lazy val bs: Array[Long] =
    Array.tabulate(nBits)(j => (2246822519L * (j + 1)) % P)

  override def children: Seq[Expression] = Seq(vExpr, tfExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "simhash_agg requires (bigint, bigint)")

  override def dataType: DataType =
    if (emitBands) ArrayType(LongType, containsNull = false)
    else ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val vAny = vExpr.eval(input)
    val tfAny = tfExpr.eval(input)
    if (vAny != null && tfAny != null) {
      val v = vAny.asInstanceOf[Long]
      val tf = tfAny.asInstanceOf[Long]
      var j = 0
      while (j < nBits) {
        buf(j) += tf * (2L * (((v * as(j) + bs(j)) % P) % 2L) - 1L)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nBits) { a(j) += b(j); j += 1 }
    a
  }

  /** `emitBands=false`: the raw 64-bit signature as 0/1 ints.
    * `emitBands=true` (`simhash_bands_agg`): the signature pre-packed
    * into nBits/16 longs, each folding 16 consecutive bits MSB-first —
    * bit-identical to
    * `aggregate(slice(bits, b*16+1, 16), 0L, (acc, x) -> acc*2 + x)`,
    * but computed in the aggregate's eval instead of an interpreted
    * higher-order function over the emitted array.
    */
  override def eval(buf: Array[Long]): Any =
    if (emitBands) {
      val nBands = nBits / 16
      val bands = new Array[Long](nBands)
      var b = 0
      while (b < nBands) {
        var acc = 0L
        var i = 0
        while (i < 16) {
          acc = acc * 2 + (if (buf(b * 16 + i) >= 0L) 1L else 0L)
          i += 1
        }
        bands(b) = acc
        b += 1
      }
      new GenericArrayData(bands)
    } else new GenericArrayData(buf.map(s => if (s >= 0L) 1 else 0))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nBits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nBits)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAggregate =
    copy(vExpr = newChildren(0), tfExpr = newChildren(1))

  override def prettyName: String = "simhash_agg"
}

object SimHashAggregate {
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAggregate].getName, "simhash_agg"),
    (children: Seq[Expression]) =>
      SimHashAggregate(children(0), children(1)))

  /** `simhash_bands_agg(v, tf)`: same sketch, emitted as 4 packed
    * 16-bit band longs (the LSH join keys AND the full signature).
    */
  val bandsRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_bands_agg"),
    new ExpressionInfo(classOf[SimHashAggregate].getName, "simhash_bands_agg"),
    (children: Seq[Expression]) =>
      SimHashAggregate(children(0), children(1), emitBands = true))
}
