package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two `array<double>` columns.
  *
  * The tier-(b) custom-operator case from the build contract: Spark's
  * built-in way to express this — `aggregate(zip_with(a, b, (x,y) ->
  * x*y), 0d, (acc,x) -> acc+x)` — is semantically right but executes
  * interpreted (higher-order lambdas never enter whole-stage codegen;
  * measured ~3µs/element), and the expanded `a[0]*b[0] + ...` form
  * needs the dimension at plan-build time. This expression generates a
  * tight primitive loop inside codegen, dimension-agnostic.
  *
  * Float semantics: accumulates left-to-right in element order —
  * IDENTICAL to a sequential fold, so results are bit-for-bit equal to
  * the expanded form, to DuckDB's `list_reduce`, and invariant to
  * partitioning. Null elements are treated as 0 contribution; a null
  * array yields null (standard BinaryExpression null propagation).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two array<double> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft-native functions.
  *
  * Two paths, same registry entries:
  *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the `SparkSessionExtensions` injection point);
  *  - runtime: [[GraftFunctions.register]] on an existing session (used
  *    by the operators so `expr("array_dot(...)")` always resolves).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  val arrayDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
    (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1)))

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(arrayDot, CharPolyHash.registration, SimHashAggregate.registration,
      SimHashAggregate.bandsRegistration, MinHashAggregate.registration,
      BloomFunctions.aggRegistration, BloomFunctions.probeRegistration,
      CmsFunctions.estimateRegistration, CmsFunctions.mergeRegistration)

  /** Idempotent runtime registration on a session. Also raises the
    * object-hash-aggregation fallback threshold when still at Spark's
    * default 128 ([[graft.engine.Tuning]]): the sketch aggregates here
    * group by high-cardinality keys, and the default silently turns
    * them into sort-based aggregation.
    */
  def register(spark: SparkSession): Unit = {
    graft.engine.Tuning.ensure(spark)
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
