package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 1-BIT EMBEDDING QUANTIZATION in one codegen'd pass: bit i of the
  * result is set when component i of the `Array[Float]` embedding is
  * strictly positive (i < min(dim, 64)). The sign pattern is the
  * cheapest retrieval signature there is — 8 bytes per vector whatever
  * the original dim, Hamming-comparable with two machine instructions
  * (xor + popcount) — and sits below int8 and PQ on the engine's
  * quantization ladder. Deterministic: a sign test has no arithmetic to
  * disagree on across engines; null elements contribute a 0 bit (the
  * HOF null-fold degenerate case, as in LshSignature).
  */
case class SignBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_bits"

  override protected def nullSafeEval(input: Any): Any =
    SignBitsImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBitsImpl.compute($c);")

  override protected def withNewChildInternal(c: Expression): SignBits =
    copy(child = c)
}

object SignBits {
  def apply(c: Column): Column =
    GraftBridge.column(SignBits(GraftBridge.expression(c)))
}

/** Static helper shared by eval and generated code. */
object SignBitsImpl {
  def compute(a: ArrayData): Long = {
    val n = math.min(a.numElements(), 64)
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && a.getFloat(i) > 0f) s |= (1L << i)
      i += 1
    }
    s
  }
}
