package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.norm.PyText

/** Native Catalyst expression for the F2 accent-strip lookup key
  * (main.py:406–411): NFKD → drop combining marks → collapse whitespace →
  * lower. The codegen'd twin of `Normalize.stripAccentsUdf` (SURVEY §7.3's
  * optional refinement): no UDF closure serialization, free null handling,
  * and the call stays inside the whole-stage-codegen pipeline instead of
  * breaking it into an eval boundary.
  *
  * The kernel itself ([[PyText.stripAccentsKey]]) is shared with the UDF
  * path, so both produce identical bytes; `FunctionSpec` asserts it. */
case class StripAccentsKey(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = child.dataType
  override def prettyName: String = "strip_accents_key"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PyText.stripAccentsKey(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.norm.PyText.stripAccentsKey($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsKey =
    copy(child = newChild)
}
