package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The five Pearson moments of two day-aligned integer change series in
  * one codegen'd pass: given two arrays of UNSCALED (×10^s) long changes
  * indexed by day slot (null = no observation that day), returns
  * `struct(n, sx, sy, sxy, sxx, syy, xl, yl)` over the slots where BOTH
  * series have a value (`xl`/`yl` are the values at the LAST common
  * slot — 0 when n = 0, guarded by n downstream) — exactly the inner-join-on-date moment aggregation of
  * the correlation-matrix query, but as a tight primitive loop per pair
  * instead of a |days|×|pairs|² row explosion through a shuffle and a
  * string-keyed hash aggregation (measured ~5× on `fx_change_corr`).
  *
  * All accumulation is exact 64-bit integer arithmetic, so the result is
  * bit-identical to any other evaluation order — the DuckDB oracle keeps
  * its join+SUM formulation and still hash-matches. Accumulation uses
  * `Math.addExact`/`multiplyExact` (intrinsified, effectively free): a
  * silent Java wrap on a pathological series would diverge from both
  * ANSI Spark arithmetic and DuckDB (which raise), turning an overflow
  * into wrong answers instead of one loud error.
  */
case class PairMoments(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = PairMoments.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pair_moments"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val len = math.min(x.numElements(), y.numElements())
    var n = 0L; var sx = 0L; var sy = 0L
    var sxy = 0L; var sxx = 0L; var syy = 0L
    var xl = 0L; var yl = 0L
    var i = 0
    while (i < len) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xi = x.getLong(i); val yi = y.getLong(i)
        n += 1L
        sx = Math.addExact(sx, xi); sy = Math.addExact(sy, yi)
        sxy = Math.addExact(sxy, Math.multiplyExact(xi, yi))
        sxx = Math.addExact(sxx, Math.multiplyExact(xi, xi))
        syy = Math.addExact(syy, Math.multiplyExact(yi, yi))
        xl = xi; yl = yi
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, sx, sy, sxy, sxx, syy, xl, yl))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val n = ctx.freshName("n")
      val sx = ctx.freshName("sx"); val sy = ctx.freshName("sy")
      val sxy = ctx.freshName("sxy")
      val sxx = ctx.freshName("sxx"); val syy = ctx.freshName("syy")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val xl = ctx.freshName("xl"); val yl = ctx.freshName("yl")
      s"""
         |int $len = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $n = 0L; long $sx = 0L; long $sy = 0L;
         |long $sxy = 0L; long $sxx = 0L; long $syy = 0L;
         |long $xl = 0L; long $yl = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $xi = $a.getLong($i); long $yi = $b.getLong($i);
         |    $n += 1L;
         |    $sx = java.lang.Math.addExact($sx, $xi);
         |    $sy = java.lang.Math.addExact($sy, $yi);
         |    $sxy = java.lang.Math.addExact($sxy, java.lang.Math.multiplyExact($xi, $yi));
         |    $sxx = java.lang.Math.addExact($sxx, java.lang.Math.multiplyExact($xi, $xi));
         |    $syy = java.lang.Math.addExact($syy, java.lang.Math.multiplyExact($yi, $yi));
         |    $xl = $xi; $yl = $yi;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$n, $sx, $sy, $sxy, $sxx, $syy, $xl, $yl});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PairMoments =
    copy(left = newLeft, right = newRight)
}

object PairMoments {
  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", LongType, nullable = false),
    StructField("sy", LongType, nullable = false),
    StructField("sxy", LongType, nullable = false),
    StructField("sxx", LongType, nullable = false),
    StructField("syy", LongType, nullable = false),
    StructField("xl", LongType, nullable = false),
    StructField("yl", LongType, nullable = false)))

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      PairMoments(GraftBridge.expression(a), GraftBridge.expression(b)))
}
