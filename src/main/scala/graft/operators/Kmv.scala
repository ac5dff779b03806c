package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the mergeable O(k)
  * cardinality estimator (Bar-Yossef et al. 2002, public algorithm):
  * keep the k smallest hash values of the key population; the k-th
  * smallest, as a fraction u of the hash space, estimates the distinct
  * count as (k−1)/u.
  *
  * Unlike `approx_count_distinct` (HLL++, whose sketch layout and
  * rounding are engine-private), every step here is DETERMINISTIC and
  * engine-portable: Spark's `xxhash64` is replayed bit-exactly in the
  * DuckDB oracle ([[graft.oracle.XxhOracleSql.kmvDistinct]]), the k-min
  * set is a total order on unsigned hashes, and the one estimator
  * division runs on identical double operands. The gate can hash-match
  * an APPROXIMATE algorithm because the algorithm itself is exact about
  * which approximation it makes.
  *
  * Scale shape: hash is a narrow map; distinct-of-hashes shuffles once
  * on the hash (map-side combined); the k-min set is a
  * TakeOrderedAndProject (per-partition heaps of k, then a k-row driver
  * merge — never a global sort). Memory is O(k) everywhere. Fewer than
  * k distinct keys → the sketch holds the whole population and the
  * exact count is returned.
  */
object Kmv {

  private val Flip = Long.MinValue // XOR maps unsigned order onto signed

  private val TwoPow64 = 1.8446744073709552E19

  /** The shared estimator tree over an aggregate row carrying `m` (kept
    * count) and `ukx` (flipped k-th hash): the signed k-th hash and the
    * (k−1)·2⁶⁴/u_k estimate with the exact-below-k fallback. ONE
    * definition — the global sketch, the grouped sketch, and the set
    * algebra must never drift from each other (or from the three oracle
    * builders in XxhOracleSql, which mirror this tree verbatim).
    */
  private def estimator(k: Int): (Column, Column) = {
    val ukSigned = col("ukx").bitwiseXOR(lit(Flip))
    val uD = when(ukSigned < 0, ukSigned.cast("double") + lit(TwoPow64))
      .otherwise(ukSigned.cast("double"))
    val est = when(col("m") < k, col("m").cast("double"))
      .otherwise(lit(k - 1.0) * lit(TwoPow64) / uD)
    (ukSigned, est)
  }

  def distinctEstimate(df: DataFrame, keyCol: String, k: Int): DataFrame =
    estimateFromHashes(
      df.select(xxhash64(col(keyCol)).as("h")).distinct(), k)

  /** One batch's partial sketch: its k smallest distinct key hashes —
    * ≤ k rows, the unit of sketch merge. Appending partials and folding
    * them through [[estimateFromHashes]] maintains the sketch
    * incrementally at O(k) per batch.
    */
  def partialSketch(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.select(xxhash64(col(keyCol)).as("h")).distinct()
      .orderBy(col("h").bitwiseXOR(lit(Flip)).asc).limit(k)

  /** GROUPED KMV: one sketch per group — "distinct X per segment" at
    * O(k) state per group, the grouped sibling of [[distinctEstimate]].
    * The per-group k-min runs as a rank-filtered window, which Spark
    * plans as a WindowGroupLimit (per-partition top-k heaps before the
    * shuffle — the group's full hash set is never sorted); the estimator
    * then runs once per group on exact operands, so the whole report
    * hash-matches like the global sketch. Exact below k per group.
    */
  def distinctEstimatePerGroup(df: DataFrame, groupCol: String,
      keyCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(col(groupCol), xxhash64(col(keyCol)).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("h").bitwiseXOR(lit(Flip)).asc)
    val topk = hashed.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
    val a = topk.groupBy(col(groupCol)).agg(count(lit(1)).as("m"),
      max(col("h").bitwiseXOR(lit(Flip))).as("ukx"))
    val (_, est) = estimator(k)
    a.select(col(groupCol),
      lit(k.toLong).as("k"),
      col("m").as("n_kept"),
      est.as("estimate"))
  }

  /** KMV SET ALGEBRA (Beyer et al. 2007, public algorithm): union,
    * intersection, and Jaccard estimates for two key populations from
    * their O(k) sketches alone — the "how much do these two segments
    * overlap" question answered without ever joining the raw
    * populations. L = the k smallest hashes of S_A ∪ S_B is itself the
    * union's KMV sketch (mergeability), so (k−1)/u_k estimates |A∪B|;
    * the fraction ρ of L present in BOTH input sketches estimates the
    * Jaccard index, and ρ · |A∪B|-estimate the intersection.
    *
    * Deterministic end to end like [[distinctEstimate]]: the sketches
    * are exact k-min sets of the replayable hash, membership is set
    * membership, and the estimator arithmetic runs on identical double
    * operands — so the DuckDB oracle hash-matches the whole report.
    * Exactness degrades gracefully: when the union has fewer than k
    * distinct hashes both sketches are complete and every output is the
    * exact count.
    *
    * Scale shape: each population reduces to its ≤ k-row sketch first
    * (per-partition heaps, no global sort); everything after is
    * broadcast joins of k-row relations.
    */
  def setAlgebra(a: DataFrame, b: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val ka = partialSketch(a, keyCol, k)
    val kb = partialSketch(b, keyCol, k)
    val unionK = ka.union(kb).select(col("h")).distinct()
      .orderBy(col("h").bitwiseXOR(lit(Flip)).asc).limit(k)
    val flagged = unionK
      .join(broadcast(ka.select(col("h"), lit(1).as("ina"))), Seq("h"), "left")
      .join(broadcast(kb.select(col("h"), lit(1).as("inb"))), Seq("h"), "left")
    val agg = flagged.agg(
      count(lit(1)).as("m"),
      max(col("h").bitwiseXOR(lit(Flip))).as("ukx"),
      sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L))
        .as("n_both"))
    val (_, unionEst) = estimator(k)
    val rho = col("n_both").cast("double") / col("m").cast("double")
    agg.select(
      lit(k.toLong).as("k"),
      col("m").as("n_union_kept"),
      col("n_both"),
      unionEst.as("union_est"),
      rho.as("jaccard_est"),
      (rho * unionEst).as("intersect_est"))
  }

  /** The k-min fold + estimator over an already-hashed relation (column
    * `h`, signed xxhash64 values, duplicates allowed — they collapse).
    * Separated from the hashing so MERGED sketches can reuse it: the
    * k-min of a union of per-batch k-min sets IS the k-min of the union
    * (the mergeability that makes the sketch distributable), so an
    * incrementally-maintained sketch folds through this same code path
    * and must equal the one-shot sketch exactly.
    */
  def estimateFromHashes(hashed0: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = hashed0.select(col("h")).distinct()
    val topk = hashed
      .orderBy(col("h").bitwiseXOR(lit(Flip)).asc)
      .limit(k)
    val a = topk.agg(count(lit(1)).as("m"),
      max(col("h").bitwiseXOR(lit(Flip))).as("ukx"))
    val (ukSigned, est) = estimator(k)
    a.select(
      lit(k.toLong).as("k"),
      col("m").as("n_kept"),
      ukSigned.as("kth_hash"),
      est.as("estimate"))
  }
}
