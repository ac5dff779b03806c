package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit HILBERT index of two 16-bit bucket ranks — the locality
  * alternative to [[MortonCode16]]: consecutive Hilbert codes are ALWAYS
  * grid neighbors (one step in exactly one dimension), where the Z-curve
  * jumps across the grid at every power-of-two boundary. Sorting by the
  * Hilbert index therefore gives range partitions strictly tighter
  * worst-case min/max envelopes — the layout Delta/Iceberg expose as
  * "Hilbert clustering" next to Z-order.
  *
  * The transform is the standard xy→d fold (16 levels of quadrant
  * accumulation + rotation; Hamilton's algorithm as published on the
  * space-filling-curve literature), branch-light integer ops that stay
  * inside whole-stage codegen. Inputs are masked to their low 16 bits.
  */
case class HilbertCode16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_code16"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & 0xFFFFL
    var y = b.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertCode16 =
    copy(left = l, right = r)
}

object HilbertCode16 {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(HilbertCode16(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
