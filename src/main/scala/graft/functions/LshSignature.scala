package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature over an `Array[Float]` embedding in ONE
  * codegen'd pass: bit j of the result is the sign of the dot product with
  * plane j (SURVEY §7.3: the custom-Expression surface).
  *
  * Replaces the HOF formulation (`nPlanes` separate
  * `aggregate(zip_with(...))` folds per row) which is CodegenFallback —
  * interpreted lambda dispatch per element AND it de-codegens its whole
  * stage (the round-1 interpreted-projection trap). Here the embedding is
  * read once into a primitive double[] and the plane loop is a tight
  * generated-code kernel.
  *
  * Value-compatible with the HOF version on the embeddings data (no null
  * elements, fixed dim): each dot is the same left-to-right double fold,
  * and the same degenerate cases produce an all-zero contribution — a
  * vector whose length differs from the plane dimension (zip_with would
  * pad nulls, nulling the fold, and `when(null > 0)` falls to 0), or a
  * null array element (nulls the fold from that index on).
  */
case class LshSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_signature"

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    LshImpl.compute(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshImpl.compute($c, $ps);")
  }

  override protected def withNewChildInternal(c: Expression): LshSignature =
    copy(child = c)
}

object LshSignature {
  def apply(c: Column, planes: Seq[Seq[Double]]): Column =
    GraftBridge.column(LshSignature(GraftBridge.expression(c), planes))
}

/** Static helper shared by eval and generated code. */
object LshImpl {

  /** Bit j = (sum_i emb[i] * planes[j][i]) > 0, left-to-right double
    * accumulation. Length mismatch or a null element → 0L (the HOF
    * null-fold degenerate case).
    */
  def compute(arr: ArrayData, planes: Array[Array[Double]]): Long = {
    val dim = if (planes.length > 0) planes(0).length else 0
    val n = arr.numElements()
    if (n != dim) return 0L
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0L
      v(i) = arr.getFloat(i).toDouble
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0
      var k = 0
      while (k < dim) { dot += v(k) * p(k); k += 1 }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
