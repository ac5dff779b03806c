package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit Morton (Z-order) code of two 16-bit bucket ranks: bits of the
  * two inputs interleaved (a₁₅ b₁₅ a₁₄ b₁₄ …), so sorting by the code
  * clusters rows that are close in BOTH dimensions. This is the sort key
  * behind multi-dimensional data-skipping layouts: range-partitioning a
  * table by Morton code gives every file a tight min/max envelope on
  * both columns at once, where a single-column sort only narrows one
  * (operators.ZOrder measures exactly that).
  *
  * Inputs are masked to their low 16 bits; the spread uses the standard
  * shift-or-mask ladder (4 ops per dimension, branch-free, stays inside
  * whole-stage codegen).
  */
case class MortonCode16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "morton_code16"

  @inline private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    (spread(a.asInstanceOf[Long]) << 1) | spread(b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $x = $a & 0xFFFFL;
         |$x = ($x | ($x << 8)) & 0x00FF00FFL;
         |$x = ($x | ($x << 4)) & 0x0F0F0F0FL;
         |$x = ($x | ($x << 2)) & 0x33333333L;
         |$x = ($x | ($x << 1)) & 0x55555555L;
         |long $y = $b & 0xFFFFL;
         |$y = ($y | ($y << 8)) & 0x00FF00FFL;
         |$y = ($y | ($y << 4)) & 0x0F0F0F0FL;
         |$y = ($y | ($y << 2)) & 0x33333333L;
         |$y = ($y | ($y << 1)) & 0x55555555L;
         |${ev.value} = ($x << 1) | $y;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MortonCode16 =
    copy(left = l, right = r)
}

object MortonCode16 {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(MortonCode16(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
