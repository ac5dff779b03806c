package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Number of leading zero bits of a long's 64-bit pattern (0 → 64) —
  * the rank primitive of HyperLogLog register updates. A JVM intrinsic
  * in codegen; the oracle replays it as 64 − length(bin(x)) on the
  * unsigned value.
  */
case class LeadingZeros64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "leading_zeros64"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.lang.Long.numberOfLeadingZeros($c);")

  override protected def withNewChildInternal(c: Expression): LeadingZeros64 =
    copy(child = c)
}

object LeadingZeros64 {
  def apply(c: Column): Column =
    GraftBridge.column(LeadingZeros64(GraftBridge.expression(c)))
}
