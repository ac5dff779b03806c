package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of the canonical text in one codegen'd pass: bit j of
  * the signature is the sign of the occurrence-weighted sum of hash-bit j
  * over all tokens.
  *
  * Replaces the dataflow formulation (explode tokens → groupBy(doc,tok)
  * count → 64 conditional sums → groupBy(doc)) which shuffled every token
  * of the corpus through TWO aggregations. Per-occurrence ±1 accumulation
  * is arithmetically identical to count-weighted accumulation, so the
  * signature value is unchanged — but computing it is now a pure map
  * (no exchange), which is what lets simhash dedup run as a narrow scan
  * at 100 TB.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashImpl.compute($c);")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  def apply(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}

/** Static helper shared by eval and generated code. */
object SimHashImpl {

  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Sign-of-weighted-bit-sums simhash; token hash = xxhash64(token),
    * matching the dataflow version bit-for-bit.
    */
  def compute(text: UTF8String): Long = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val len = text.numBytes()
    val sums = new Array[Int](64)

    var tokStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || text.getByte(i) == ' '.toByte) {
        val h = XXH64.hashUnsafeBytes(base, offset + tokStart, i - tokStart, Seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
        tokStart = i + 1
      }
      i += 1
    }

    var sig = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
