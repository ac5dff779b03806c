package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog register table (Flajolet et al. 2007) — the industry-
  * standard distinct sketch next to the repo's KMV: 2^p registers, each
  * holding the maximum "rank" (leading-zero run + 1) seen among the
  * hashes routed to it. The REGISTER TABLE is the artifact here, not
  * the estimate: registers are exact integers (value-replayable, no
  * estimator bias argument in the gate), mergeable by per-register max
  * (union of sketches = sketch of union — the same property that makes
  * KMV partials fold), and idempotent under duplicates and re-delivery
  * BY VALUE, so the incremental path needs no batch markers at all.
  *
  * Layout: register = top p bits of the unsigned xxhash64 (seed 42,
  * Spark's hashLong — the oracle replays it in HUGEINT); rank = leading
  * zeros of the remaining 64−p bits + 1, computed uniformly as
  * clz64(low bits) − p + 1 (the top p bits of the masked value are zero
  * by construction, so the all-zero case lands on the 64−p+1 cap with
  * no branch). One narrow map + one map-side-combinable groupBy to a
  * ≤ 2^p-row digest — the cheapest possible distinct profile at 100 TB.
  */
object Hll {

  val DefaultP: Int = 8

  /** (register, rho) digest of `keyCol`: one row per non-empty
    * register. No pre-distinct — the per-register max absorbs
    * duplicates, so the corpus is scanned once and combined map-side.
    */
  def registers(df: DataFrame, keyCol: String,
      p: Int = DefaultP): DataFrame = {
    val mask = (1L << (64 - p)) - 1L
    val h = xxhash64(col(keyCol))
    df.select(
        shiftrightunsigned(h, 64 - p).cast("int").as("register"),
        (graft.functions.LeadingZeros64(h.bitwiseAND(lit(mask)))
          - lit(p) + lit(1)).as("rho"))
      .groupBy(col("register")).agg(max(col("rho")).as("rho"))
  }

  /** Per-group register digest — the "distinct users per segment"
    * dashboard sketch: one row per (group, non-empty register), still
    * one scan + one map-side-combinable groupBy, state ≤ |groups|·2^p.
    * Group sketches merge by per-(group, register) max, and a GLOBAL
    * sketch is just the same fold ACROSS groups — the union property
    * that lets a daily digest roll up to weekly/monthly for free.
    */
  def registersPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      p: Int = DefaultP): DataFrame = {
    val mask = (1L << (64 - p)) - 1L
    val h = xxhash64(col(keyCol))
    df.select(col(groupCol).as("grp"),
        shiftrightunsigned(h, 64 - p).cast("int").as("register"),
        (graft.functions.LeadingZeros64(h.bitwiseAND(lit(mask)))
          - lit(p) + lit(1)).as("rho"))
      .groupBy(col("grp"), col("register")).agg(max(col("rho")).as("rho"))
  }

  /** The raw HLL estimate from a register digest (for specs/clients;
    * the gate checks the registers themselves). Σ2^(−M_j) is computed
    * as an EXACT integer sum of 2^(64−M_j) in DECIMAL(38,0) scaled back
    * once — no data-ordered double accumulation.
    */
  def estimate(regs: DataFrame, p: Int = DefaultP): Double = {
    val m = 1 << p
    val rows = regs.select(col("register"), col("rho")).collect()
    val nonEmpty = rows.length
    val zeros = m - nonEmpty
    val sumInv = rows.map { r =>
      BigInt(1) << (64 - r.getInt(1))
    }.sum + (BigInt(1) << 64) * zeros
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * math.pow(2.0, 64) / sumInv.toDouble
  }
}
