package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-signature MinHash in one codegen'd pass over the document
  * (SURVEY §2.11 / the near-dup scale path): word-3-shingle the canonical
  * text, xxhash64 each shingle, derive `nHashes` seeded re-hashes, and
  * keep the per-seed minimum — all inside a single per-row expression.
  *
  * This replaces the dataflow formulation (posexplode tokens → lead()
  * window → hash columns → groupBy(min)) which shuffled EVERY TOKEN of the
  * corpus twice (window + aggregation). Here signature computation is a
  * pure map: no exchange at all before LSH banding, which at 100 TB is the
  * difference between one narrow scan and two full-corpus shuffles.
  *
  * Value-compatible with the dataflow version (same xxhash64 family,
  * seed 42): because the input is the canonical text (single spaces), a
  * word shingle's bytes are exactly a slice of the input — hashing slices
  * avoids materializing shingle strings. Documents with fewer than 3
  * tokens degrade to one whole-text shingle, matching the old
  * `concat_ws` null-skipping behavior.
  */
case class MinHashSignature(child: Expression, nHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[UTF8String], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashImpl.compute($c, $nHashes);")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  def apply(c: Column, nHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), nHashes))
}

/** Static helper shared by eval and generated code. */
object MinHashImpl {

  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Min-over-shingles of xxhash64(xxhash64(shingle), j) for each seed j,
    * replicating xxhash64(shingleStr) → xxhash64(hb, lit(j)) exactly
    * (string hash, then long+int chained hash).
    */
  def compute(text: UTF8String, nHashes: Int): ArrayData = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val len = text.numBytes()
    val mins = Array.fill(nHashes)(Long.MaxValue)

    // token start offsets (canonical text: single 0x20 separators)
    var nTokens = 1
    var i = 0
    while (i < len) {
      if (text.getByte(i) == ' '.toByte) nTokens += 1
      i += 1
    }
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (text.getByte(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1 // sentinel: slice end = starts(k) - 1

    val nShingles = if (nTokens >= 3) nTokens - 2 else 1
    var s = 0
    while (s < nShingles) {
      val from = starts(s)
      val until = math.min(starts(math.min(s + 3, nTokens)) - 1, len)
      val hb = XXH64.hashUnsafeBytes(base, offset + from, until - from, Seed)
      val hSeed = XXH64.hashLong(hb, Seed)
      var j = 0
      while (j < nHashes) {
        val h = XXH64.hashInt(j, hSeed)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}
