package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash sketch aggregate: `minhash_agg(shingleHash)` folds a
  * group's shingle-hash stream into the k-minimum signature — the
  * TypedImperativeAggregate twin of [[SimHashAggregate]], replacing k
  * separate `min()` aggregate expressions with one k-long buffer and a
  * tight update loop. Same hash family as
  * [[graft.operators.TextOps.permHashExpr]]; same map-side partial
  * merge semantics (elementwise min) as any imperative aggregate.
  */
case class MinHashAggregate(
    vExpr: Expression, k: Int = 64,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L
  private lazy val as: Array[Long] =
    Array.tabulate(k)(j => (2654435761L * (j + 1)) % P)
  private lazy val bs: Array[Long] =
    Array.tabulate(k)(j => (2246822519L * (j + 1)) % P)

  override def children: Seq[Expression] = Seq(vExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (vExpr.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("minhash_agg requires bigint")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val vAny = vExpr.eval(input)
    if (vAny != null) {
      val v = vAny.asInstanceOf[Long]
      var j = 0
      while (j < k) {
        val h = (v * as(j) + bs(j)) % P
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAggregate =
    copy(vExpr = newChildren(0))

  override def prettyName: String = "minhash_agg"
}

object MinHashAggregate {
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_agg"),
    new ExpressionInfo(classOf[MinHashAggregate].getName, "minhash_agg"),
    (children: Seq[Expression]) => MinHashAggregate(children.head))
}
