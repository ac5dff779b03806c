package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The ten lag-1 regression moments of two day-aligned integer change
  * series in one codegen'd pass: over every slot t ≥ 1 where y[t],
  * y[t−1] AND x[t−1] are all observed (u = y_t, v = y_{t−1},
  * w = x_{t−1} — the triple-common index set a lag-1 Granger regression
  * y_t ~ y_{t−1} [+ x_{t−1}] needs), returns
  * `struct(n, su, sv, sw, suu, svv, sww, suv, suw, svw)`.
  *
  * Three pairwise [[PairMoments]] calls can NOT compose this: each
  * would aggregate over its own pairwise-common slot set, not the
  * triple-common one. All accumulation is exact 64-bit integer
  * arithmetic (`addExact`/`multiplyExact` — a silent wrap would diverge
  * from DuckDB, which raises), so the oracle's definitional
  * join-on-date formulation hash-matches bit for bit.
  */
case class LagMoments(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LagMoments.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lag_moments"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val y = a.asInstanceOf[ArrayData]
    val x = b.asInstanceOf[ArrayData]
    val len = math.min(y.numElements(), x.numElements())
    var n = 0L; var su = 0L; var sv = 0L; var sw = 0L
    var suu = 0L; var svv = 0L; var sww = 0L
    var suv = 0L; var suw = 0L; var svw = 0L
    var t = 1
    while (t < len) {
      if (!y.isNullAt(t) && !y.isNullAt(t - 1) && !x.isNullAt(t - 1)) {
        val u = y.getLong(t); val v = y.getLong(t - 1); val w = x.getLong(t - 1)
        n += 1L
        su = Math.addExact(su, u); sv = Math.addExact(sv, v)
        sw = Math.addExact(sw, w)
        suu = Math.addExact(suu, Math.multiplyExact(u, u))
        svv = Math.addExact(svv, Math.multiplyExact(v, v))
        sww = Math.addExact(sww, Math.multiplyExact(w, w))
        suv = Math.addExact(suv, Math.multiplyExact(u, v))
        suw = Math.addExact(suw, Math.multiplyExact(u, w))
        svw = Math.addExact(svw, Math.multiplyExact(v, w))
      }
      t += 1
    }
    new GenericInternalRow(
      Array[Any](n, su, sv, sw, suu, svv, sww, suv, suw, svw))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = ctx.freshName("t"); val len = ctx.freshName("len")
      val n = ctx.freshName("n")
      val su = ctx.freshName("su"); val sv = ctx.freshName("sv")
      val sw = ctx.freshName("sw")
      val suu = ctx.freshName("suu"); val svv = ctx.freshName("svv")
      val sww = ctx.freshName("sww")
      val suv = ctx.freshName("suv"); val suw = ctx.freshName("suw")
      val svw = ctx.freshName("svw")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      val w = ctx.freshName("w")
      s"""
         |int $len = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $n = 0L; long $su = 0L; long $sv = 0L; long $sw = 0L;
         |long $suu = 0L; long $svv = 0L; long $sww = 0L;
         |long $suv = 0L; long $suw = 0L; long $svw = 0L;
         |for (int $t = 1; $t < $len; $t++) {
         |  if (!$a.isNullAt($t) && !$a.isNullAt($t - 1) && !$b.isNullAt($t - 1)) {
         |    long $u = $a.getLong($t);
         |    long $v = $a.getLong($t - 1);
         |    long $w = $b.getLong($t - 1);
         |    $n += 1L;
         |    $su = java.lang.Math.addExact($su, $u);
         |    $sv = java.lang.Math.addExact($sv, $v);
         |    $sw = java.lang.Math.addExact($sw, $w);
         |    $suu = java.lang.Math.addExact($suu, java.lang.Math.multiplyExact($u, $u));
         |    $svv = java.lang.Math.addExact($svv, java.lang.Math.multiplyExact($v, $v));
         |    $sww = java.lang.Math.addExact($sww, java.lang.Math.multiplyExact($w, $w));
         |    $suv = java.lang.Math.addExact($suv, java.lang.Math.multiplyExact($u, $v));
         |    $suw = java.lang.Math.addExact($suw, java.lang.Math.multiplyExact($u, $w));
         |    $svw = java.lang.Math.addExact($svw, java.lang.Math.multiplyExact($v, $w));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$n, $su, $sv, $sw, $suu, $svv, $sww, $suv, $suw, $svw});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LagMoments =
    copy(left = newLeft, right = newRight)
}

object LagMoments {
  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("su", LongType, nullable = false),
    StructField("sv", LongType, nullable = false),
    StructField("sw", LongType, nullable = false),
    StructField("suu", LongType, nullable = false),
    StructField("svv", LongType, nullable = false),
    StructField("sww", LongType, nullable = false),
    StructField("suv", LongType, nullable = false),
    StructField("suw", LongType, nullable = false),
    StructField("svw", LongType, nullable = false)))

  /** Column-API entry point: `y` the caused series, `x` the causing. */
  def apply(y: Column, x: Column): Column =
    GraftBridge.column(
      LagMoments(GraftBridge.expression(y), GraftBridge.expression(x)))
}
