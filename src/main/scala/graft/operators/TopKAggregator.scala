package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the Dataset-API custom-aggregate surface): per-group
  * top-k values as a descending array. The buffer is a bounded sorted
  * vector, so partial aggregation ships at most k doubles per group per
  * task — the classic distributed top-k shape (merge is an O(k) merge of
  * two sorted runs, associative and commutative).
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] = insert(buf, v)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    val out = Vector.newBuilder[Double]
    var i = 0; var j = 0
    while ((i < a.length || j < b.length) && i + j < k) {
      if (j >= b.length || (i < a.length && a(i) >= b(j))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    out.result()
  }

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] = bufferEncoder

  private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
    if (buf.length >= k && v <= buf.last) buf
    else {
      val pos = buf.indexWhere(_ < v) match { case -1 => buf.length; case p => p }
      (buf.take(pos) :+ v) ++ buf.drop(pos).take(k - pos - 1)
    }
  }
}
