package graft.text

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-graph-per-row TextRank kernel: takes one document's chunk
  * list (sorted struct(idx, ws) — ws the sorted distinct word array)
  * and runs edge construction + the damped PageRank iterations LOCALLY,
  * returning array<struct(node, pr)>.
  *
  * Why an expression and not keyed joins: each document's graph is tiny
  * (a handful of 8-word chunks), so corpus-wide per-iteration shuffle
  * joins pay ~3 exchanges × iters in pure job overhead for graphs that
  * fit in registers. Collecting each doc's chunks ONCE and iterating
  * in-row is the per-group sibling of [[graft.operators.PageRank]]'s
  * broadcast digest — O(doc) work on the doc's executor, perfectly
  * data-parallel, no driver state, exactly two corpus shuffles
  * end-to-end. The arithmetic replays the join formulation bit for bit:
  * edge weights are exact |ws_i ∩ ws_j| integers (banded |i−j| ≤
  * window), wout an exact long sum, ratio the one w/wout double
  * division, contributions fold per dst in ascending-src order (the
  * sort_array(collect_list) order), and the damping line is
  * 0.15/n + 0.85·m in that operation order — hash-identical to the
  * oracle's list_reduce replay.
  *
  * CodegenFallback: the per-row cost is the algorithm itself (dozens of
  * flops), not expression dispatch — codegen would buy nothing.
  */
case class TextRankLocal(child: Expression, window: Int, iters: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("node", IntegerType, nullable = false),
    StructField("pr", DoubleType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "textrank_local"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val idxs = new Array[Int](n)
    val ws = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      idxs(i) = row.getInt(0)
      ws(i) = row.getArray(1)
      i += 1
    }
    // banded edges on idx distance; undirected discovery, directed use
    val srcs = Array.newBuilder[Int]; val dsts = Array.newBuilder[Int]
    val wgts = Array.newBuilder[Long]
    val wout = new Array[Long](n)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && math.abs(idxs(j) - idxs(i)) <= window) {
        val w = sortedStrIntersect(ws(i), ws(j))
        if (w > 0) {
          srcs += i; dsts += j; wgts += w
          srcs += j; dsts += i; wgts += w
          wout(i) += w; wout(j) += w
        }
        j += 1
      }
      i += 1
    }
    val es = srcs.result(); val ed = dsts.result(); val ew = wgts.result()
    // CSR adjacency grouped by src with the per-edge ratio precomputed
    // (ratio is iteration-invariant, exactly as the join formulation
    // stages it once before the loop). Only the ACROSS-src order of a
    // dst's incoming adds is semantic (the sort_array fold per dst is
    // by ascending src) — CSR iteration by src value preserves it.
    val deg = new Array[Int](n)
    var e = 0
    while (e < es.length) { deg(es(e)) += 1; e += 1 }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = off.clone()
    val adjDst = new Array[Int](es.length)
    val adjRatio = new Array[Double](es.length)
    e = 0
    while (e < es.length) {
      val s = es(e)
      adjDst(fill(s)) = ed(e)
      adjRatio(fill(s)) = ew(e).toDouble / wout(s).toDouble
      fill(s) += 1
      e += 1
    }
    val nD = n.toDouble
    var pr = Array.fill(n)(1.0 / nD)
    var it = 0
    while (it < iters) {
      val m = new Array[Double](n)
      var src = 0
      while (src < n) {
        val p = pr(src)
        var a = off(src)
        while (a < off(src + 1)) { m(adjDst(a)) += p * adjRatio(a); a += 1 }
        src += 1
      }
      val next = new Array[Double](n)
      var k = 0
      while (k < n) { next(k) = 0.15 / nD + 0.85 * m(k); k += 1 }
      pr = next
      it += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = InternalRow(idxs(i), pr(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** |A ∩ B| of two sorted duplicate-free string arrays (binary
    * UTF8String order — the array_sort / array_intersect contract).
    */
  private def sortedStrIntersect(a: ArrayData, b: ArrayData): Long = {
    var i = 0; var j = 0; var n = 0L
    while (i < a.numElements() && j < b.numElements()) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildInternal(
      newChild: Expression): TextRankLocal = copy(child = newChild)
}

object TextRankLocal {
  def apply(chunks: Column, window: Int, iters: Int): Column =
    GraftBridge.column(TextRankLocal(GraftBridge.expression(chunks),
      window, iters))
}
