package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `char_poly_hash(s)`: the portable polynomial string hash
  * `h = (h*31 + codepoint(c)) mod 1000003`, left fold over characters —
  * the codegen'd twin of [[graft.operators.TextOps.charHashExpr]]
  * (which expresses the same fold as an interpreted higher-order
  * `aggregate` over `split(s, '')`). Same value, ~10× cheaper: the HOF
  * form allocates a per-character string array and pays interpreted
  * lambda dispatch per character.
  *
  * Matches the DuckDB oracle fold over `string_split(s,'') → ascii(c)`
  * for BMP input (both iterate code points; the fixtures are ASCII).
  */
case class CharPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_poly_hash requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "char_poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000003L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31 + $cp) % 1000003L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

object CharPolyHash {
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_poly_hash"),
    new ExpressionInfo(classOf[CharPolyHash].getName, "char_poly_hash"),
    (children: Seq[Expression]) => CharPolyHash(children.head))
}
