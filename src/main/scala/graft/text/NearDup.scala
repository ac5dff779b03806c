package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Near-duplicate detection for a training-data pipeline, three ways:
  *
  *  - MinHash + LSH banding: shingle → 32 minhashes → 8 bands → bucket
  *    self-join. The only shuffle is on band buckets, so candidate
  *    generation is ~linear in corpus size; O(n²) never appears.
  *  - SimHash: 64-bit weighted-token signature; near-dups have small
  *    Hamming distance; 16-bit chunk buckets index candidates.
  *  - n-gram Jaccard: exact character-trigram set overlap inside small
  *    deterministic buckets (oracle-checkable).
  *
  * All hashing is xxhash64 column expressions — codegen'd, no UDFs, and
  * deterministic across runs/partitionings.
  */
object NearDup {

  private val norm = TextFunctions.normText(col("text"))

  /** Per-doc minhash signatures as a DATAFLOW, not nested array lambdas:
    * explode tokens (the split/normalize chain runs once per doc), form
    * word 3-shingles with lead() windows, hash each shingle under
    * `nHashes` seeds as codegen'd columns, and min-aggregate. Minhash is
    * duplicate-insensitive, so no distinct step is needed. Array-lambda
    * formulations (transform/element_at over a derived array) re-evaluate
    * the producing expression per element inside interpreted projections
    * — measured >100× slower — and HOFs also block whole-stage codegen;
    * this shape is all codegen + one partial-agg shuffle, and scales to
    * any corpus (map-side combine collapses shingle rows to one row per
    * doc before the exchange).
    */
  def minhashSignatures(docsRaw: DataFrame, nHashes: Int = 32): DataFrame = {
    val toks = docsRaw.select(col("doc_id"),
      posexplode(split(norm, " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sh = toks
      .select(col("doc_id"), col("pos"),
        lead("tok", 1).over(w).as("t1"), lead("tok", 2).over(w).as("t2"),
        col("tok"))
      // short docs (<3 tokens) keep their pos=0 partial shingle:
      // concat_ws skips the null leads, degrading to the whole text
      .where(col("t2").isNotNull || col("pos") === 0)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
    // one string hash per shingle; the nHashes "permutations" re-hash the
    // 8-byte base under distinct seeds — far cheaper than hashing the
    // shingle string 32×, and overflow-free under ANSI mode (a wrapping
    // multiply-add family would throw ARITHMETIC_OVERFLOW there).
    val withBase = sh.select(col("doc_id"), xxhash64(col("sh")).as("hb"))
    val hashCols = (0 until nHashes).map(j =>
      xxhash64(col("hb"), lit(j)).as(s"h$j"))
    withBase.select(col("doc_id") +: hashCols: _*)
      .groupBy("doc_id")
      .agg(min(col("h0")).as("m0"),
        (1 until nHashes).map(j => min(col(s"h$j")).as(s"m$j")): _*)
      .select(col("doc_id"),
        array((0 until nHashes).map(j => col(s"m$j")): _*).as("mh"))
  }

  /** Band keys: hash 4 consecutive minhashes per band (8 bands). */
  def bandKeys(mh: Column, nBands: Int = 8, rowsPerBand: Int = 4): Column =
    array((0 until nBands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand)
        .map(r => element_at(mh, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** Estimated Jaccard from minhash agreement (fraction of equal slots). */
  def minhashAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(a)

  /** MinHash-LSH near-dup report: per document, the candidate (band-bucket
    * collision) count and the best-estimated-Jaccard neighbor. Every doc
    * emits a row (left join), so the result is rows-stable even on a
    * dup-free corpus.
    */
  def minhashLsh(s: SparkSession, dir: String,
      maxBucket: Int = 50): DataFrame = {
    // Cached because reused three times (banding + both sides of the
    // agreement join) and because the cache boundary keeps band-key
    // element_at lookups from inlining the signature expression. 32 longs
    // per doc — trivial at any corpus scale; spills to disk if not.
    val docs = minhashSignatures(Tables.documents(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Pair on bare ids — the 32-hash payload must not ride the band
    // shuffle, and a (band,key) bucket larger than `maxBucket` marks an
    // uninformative signature (stop-shingle), so it is dropped rather
    // than allowed to go quadratic. This keeps candidate generation
    // ~linear in corpus size whatever the corpus looks like.
    val banded = docs.select(col("doc_id"),
      posexplode(bandKeys(col("mh"))).as(Seq("band", "key")))
    val okBuckets = banded.groupBy("band", "key")
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      .select(col("band"), col("key"))
    val pruned = banded.join(okBuckets, Seq("band", "key"))
    val pairs = pruned
      .join(pruned.select(col("band"), col("key"), col("doc_id").as("nb_id")),
        Seq("band", "key"))
      .where(col("doc_id") =!= col("nb_id"))
      .select(col("doc_id"), col("nb_id")).distinct()
    val cand = pairs
      .join(docs, Seq("doc_id"))
      .join(docs.select(col("doc_id").as("nb_id"), col("mh").as("nb_mh")),
        Seq("nb_id"))
      .select(col("doc_id"), col("nb_id"),
        minhashAgreement(col("mh"), col("nb_mh")).as("est_jaccard"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("est_jaccard").desc, col("nb_id").asc)
    val best = cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .drop("rn")
    val nCand = cand.groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(nCand, Seq("doc_id"), "left_outer")
      .join(best, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_candidates"))
  }

  /** 64-bit SimHash over canonical tokens: bit j is the sign of the
    * token-count-weighted sum of hash-bit j.
    */
  def simhashDf(s: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(norm, " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$j")
    }
    tokens.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup report: candidates share one of four 16-bit chunks
    * (any pair within Hamming distance 3 must collide on ≥1 chunk);
    * nearest by Hamming distance via bit_count(xor).
    */
  def simhashReport(s: SparkSession, dir: String): DataFrame = {
    val sh = simhashDf(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ckey")))
    val right = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("nb_id"), col("simhash").as("nb_simhash"))
    val cand = chunked.join(right, Seq("chunk", "ckey"))
      .where(col("doc_id") =!= col("nb_id"))
      .select(col("doc_id"), col("nb_id"),
        bit_count(col("simhash").bitwiseXOR(col("nb_simhash"))).as("hamming"))
      .distinct()
    val w = Window.partitionBy("doc_id").orderBy(col("hamming").asc, col("nb_id").asc)
    val best = cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("nb_id").as("nn_id"), col("hamming").as("nn_hamming"))
    sh.join(best, Seq("doc_id"), "left_outer")
  }

  /** Character trigram set of the canonical text. */
  def charTrigrams(c: Column): Column =
    array_distinct(
      when(length(c) < 3, array(c))
        .otherwise(transform(sequence(lit(0), length(c) - 3),
          i => c.substr(i + 1, lit(3)))))

  /** Exact n-gram Jaccard inside deterministic (lang, source) buckets —
    * small enough to pair exhaustively, expressible in vanilla SQL, so
    * the oracle checks the full similarity arithmetic.
    */
  def ngramJaccardPairs(s: SparkSession, dir: String,
      threshold: Double = 0.15): DataFrame = {
    // Two-stage with a persist barrier: the canonical text must be a
    // materialized attribute before the trigram lambda slices it —
    // inlined, the normalize regex would re-run per trigram element
    // (~300× per doc). The relation is also reused as both join sides.
    // Trigrams are xxhash64'd to longs and kept SORTED so the codegen'd
    // two-pointer SortedIntersectCount can merge them. Jaccard COUNTS are
    // preserved (a 64-bit collision inside one doc's ~300-trigram set is
    // ~1e-15); the oracle intersects the string sets directly and agrees.
    //
    // TWO cache boundaries, each load-bearing:
    //  1. nt — the trigram lambda slices an attribute, not an inlined
    //     normalize regex (which would re-run per element);
    //  2. g  — the trigram HOF is CodegenFallback, and ONE non-codegen
    //     expression de-codegens its whole stage; materializing the
    //     arrays keeps the join+intersect stage in whole-stage codegen.
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), norm.as("nt"))
      .persist(mem)
      .select(col("doc_id"), col("lang"), col("source"),
        array_sort(transform(charTrigrams(col("nt")), t => xxhash64(t))).as("g"))
      .persist(mem)
    val r = d.select(col("lang"), col("source"),
      col("doc_id").as("nb_id"), col("g").as("nb_g"))
    d.join(r, Seq("lang", "source"))
      .where(col("doc_id") < col("nb_id"))
      .select(col("lang"), col("source"), col("doc_id"), col("nb_id"),
        graft.functions.SortedIntersectCount(col("g"), col("nb_g"))
          .cast("double").as("__i"),
        size(col("g")).as("__a"), size(col("nb_g")).as("__b"))
      .select(col("lang"), col("source"), col("doc_id"), col("nb_id"),
        (col("__i") / (col("__a") + col("__b") - col("__i"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
