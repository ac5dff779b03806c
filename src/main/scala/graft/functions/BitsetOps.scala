package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static bitset kernels callable from generated code (standalone
  * object → static forwarders, the [[IntersectKernels]] pattern).
  *
  * The PPJoin family's verification representation is VOCABULARY-
  * ADAPTIVE: rank-encoded token sets draw from a dense integer
  * universe [1, vocab], so when vocab is small (the degenerate-
  * vocabulary regime where prefix filtering is weakest and candidate
  * volume largest) each set packs into ⌈vocab/64⌉ longs and exact
  * |A ∩ B| is a popcount-of-AND sweep — ~6 words on a trigram fixture
  * vs a ~400-step two-pointer merge, with bit-identical counts. Large
  * vocabularies keep the sorted-array + suffix-filter path; the switch
  * is a 1-row max-rank aggregate on the digest.
  */
object BitsetKernels {

  /** Pack a sorted duplicate-free rank array (1-based ranks) into a
    * `words`-long bitmap; bit (r−1) set ⟺ rank r present.
    */
  def pack(ranks: ArrayData, words: Int): ArrayData = {
    val w = new Array[Long](words)
    var i = 0
    val n = ranks.numElements()
    while (i < n) {
      val r = ranks.getLong(i) - 1L
      w((r >>> 6).toInt) |= (1L << (r & 63L))
      i += 1
    }
    new GenericArrayData(w)
  }

  /** Exact |A ∩ B| of two packed bitmaps: Σ popcount(a_i & b_i). */
  def andCount(a: ArrayData, b: ArrayData): Long = {
    var i = 0; var n = 0L
    val w = math.min(a.numElements(), b.numElements())
    while (i < w) {
      n += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    n
  }
}

/** rank-array → packed bitmap (right child is the word count, a
  * literal at plan time). Ranks must be 1-based and ≤ 64·words.
  */
case class BitsetOfRanks(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_of_ranks"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitsetKernels.pack(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitsetKernels.pack($a, (int)$b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitsetOfRanks =
    copy(left = newLeft, right = newRight)
}

object BitsetOfRanks {
  def apply(ranks: Column, words: Column): Column =
    GraftBridge.column(BitsetOfRanks(GraftBridge.expression(ranks),
      GraftBridge.expression(words)))
}

/** popcount-of-AND exact intersection count of two packed bitmaps. */
case class BitsetAndCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_and_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitsetKernels.andCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitsetKernels.andCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitsetAndCount =
    copy(left = newLeft, right = newRight)
}

object BitsetAndCount {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(BitsetAndCount(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}
