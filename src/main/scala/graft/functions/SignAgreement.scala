package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign co-movement of two day-aligned integer change series in one
  * codegen'd pass: given two arrays of unscaled long changes indexed by
  * day slot (null = no observation that day), returns
  * `struct(n, agree)` — `n` the number of slots where BOTH series have a
  * value (the common trading days) and `agree` how many of those share a
  * sign (`Long.signum` equality, zeros agreeing with zeros).
  *
  * This is exactly the `JOIN ON date … SUM(sign(a)=sign(b))` weight of
  * the DTW pair-graph sparsification, but as a tight primitive loop per
  * pair over the |pairs|-row vector digest instead of a
  * |days|×|pairs|² row explosion through a shuffle and a string-keyed
  * hash aggregation (measured 19.8 s → sub-second on the sf0.1 weight
  * stage). Pure integer counting — bit-identical under any evaluation
  * order, so the oracle keeps its join+SUM formulation.
  */
case class SignAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = SignAgreement.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val len = math.min(x.numElements(), y.numElements())
    var n = 0L; var agree = 0L
    var i = 0
    while (i < len) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        n += 1L
        if (java.lang.Long.signum(x.getLong(i)) ==
            java.lang.Long.signum(y.getLong(i))) agree += 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, agree))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $len = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $n = 0L; long $agree = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $n += 1L;
         |    if (java.lang.Long.signum($a.getLong($i)) ==
         |        java.lang.Long.signum($b.getLong($i))) $agree += 1L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$n, $agree});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignAgreement =
    copy(left = newLeft, right = newRight)
}

object SignAgreement {
  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("agree", LongType, nullable = false)))

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      SignAgreement(GraftBridge.expression(a), GraftBridge.expression(b)))
}
