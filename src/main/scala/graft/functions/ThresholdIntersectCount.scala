package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Static intersect kernels shared by interpreted eval and generated
  * code (a standalone object compiles to static forwarders, so Janino
  * calls them directly — the pattern Spark's own codegen uses for
  * `ArrayExpressionUtils` etc.).
  */
object IntersectKernels {

  /** Lower bound on the Hamming (symmetric-difference) size of two
    * SORTED duplicate-free ranges, by depth-limited binary partition —
    * the suffix-filtering bound of Xiao et al. 2008 §4 ("Efficient
    * Similarity Joins for Near Duplicate Detection", public method),
    * reformulated on value pivots: elements < pivot can only match
    * elements < pivot, so H(x, y) = H(x<p, y<p) + H(x≥p, y≥p) and each
    * side is bounded below by its length difference. Cost O(2^d log n)
    * vs the two-pointer's O(n).
    */
  def hammingLB(x: ArrayData, lx: Int, hx: Int,
      y: ArrayData, ly: Int, hy: Int, depth: Int): Int = {
    val cx = hx - lx; val cy = hy - ly
    if (cx == 0 || cy == 0 || depth == 0) return math.abs(cx - cy)
    val mid = ly + cy / 2
    val p = y.getLong(mid)
    // first index in [lx, hx) with x(i) >= p
    var lo = lx; var hi = hx
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (x.getLong(m) < p) lo = m + 1 else hi = m
    }
    hammingLB(x, lx, lo, y, ly, mid, depth - 1) +
      hammingLB(x, lo, hx, y, mid, hy, depth - 1)
  }

  /** |A ∩ B| for sorted duplicate-free long arrays, EXACT whenever the
    * result can reach `minOv`; any return value < minOv only promises
    * "the true intersection is also < minOv" (the caller filters on
    * n ≥ minOv, so pruned pairs are dropped either way and surviving
    * rows are bit-identical to the full count). Two prune layers before
    * and inside the O(n) merge:
    *  1. the suffix-filter Hamming bound at depth 3 (8 leaves, each one
    *     binary search) — overlap ≤ (|x|+|y|−H)/2;
    *  2. in-loop early exit when even matching every remaining element
    *     cannot reach minOv.
    */
  def thresholdCount(x: ArrayData, y: ArrayData, minOv: Long): Long = {
    val nx = x.numElements(); val ny = y.numElements()
    if (minOv > 0 && math.min(nx, ny) < minOv) return math.min(nx, ny).toLong
    if (minOv > 0) {
      val h = hammingLB(x, 0, nx, y, 0, ny, 3)
      val ub = (nx.toLong + ny.toLong - h) / 2L
      if (ub < minOv) return ub
    }
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      if (minOv > 0 && n + math.min(nx - i, ny - j) < minOv) return n
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }
}

/** Threshold-aware [[SortedIntersectCount]]: exact |A ∩ B| for every
  * pair whose intersection can reach `minOverlap`, with the Xiao 2008
  * suffix-filter bound and an early-exit merge pruning pairs that
  * cannot (their return value is some number < minOverlap, NOT the
  * exact count — callers must filter on n ≥ minOverlap, which PPJoin's
  * verification stage does by construction). Inputs sorted ascending,
  * duplicate-free; behavior on unsorted input is undefined.
  */
case class ThresholdIntersectCount(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "threshold_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    IntersectKernels.thresholdCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      s"${ev.value} = graft.functions.IntersectKernels." +
        s"thresholdCount($a, $b, (long)$c);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ThresholdIntersectCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ThresholdIntersectCount {
  def apply(a: Column, b: Column, minOverlap: Column): Column =
    GraftBridge.column(ThresholdIntersectCount(GraftBridge.expression(a),
      GraftBridge.expression(b), GraftBridge.expression(minOverlap)))
}
