package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    pairsFromRanked(rankedDocsCached(s, dir), tNum, tDen)

  /** The rank artifacts staged ONCE per dir to scratch parquet — the
    * Jaccard and containment gates, their maintained-index twins, and
    * every Bench pass all derive from one corpus normalize → trigram
    * pass: the (g, r) df-rank map (the incremental twins' FROZEN
    * universe) and the (doc_id, ranks, n) encoded digest (the one-shot
    * joins' operand) are written together, so neither consumer repeats
    * the expensive half; same staging shape as NearDup.cappedTrigrams.
    */
  private val rankedPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def stagedArtifacts(s: SparkSession, dir: String): (String, String) =
    rankedPaths.computeIfAbsent(dir, _ => {
      val root = graft.util.Scratch.dir("graft_ppjoin")
      val db = root.resolve("db").toString
      val rk = root.resolve("ranks").toString
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val nt = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("nt"))
        .persist(mem)
      try {
        val tok = nt.select(col("doc_id"),
          explode(NearDup.charTrigrams(col("nt"))).as("g"))
        tok.groupBy(col("g"))
          .agg(count(lit(1)).as("df"))
          .select(col("g"), row_number().over(
            Window.orderBy(col("df").asc, col("g").asc)).cast("long").as("r"))
          .coalesce(1).write.parquet(rk)
        tok.join(broadcast(s.read.parquet(rk)), "g")
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("r"))).as("ranks"))
          .withColumn("n", size(col("ranks")))
          .write.parquet(db)
      } finally { nt.unpersist(); () }
      (db, rk)
    })

  private def rankedDocsCached(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(stagedArtifacts(s, dir)._1)

  /** The shared rank-encoded stage: (doc_id, ranks, n) with `ranks` the
    * ascending df-rank array (head = rarest-first prefix, whole array =
    * the sorted intersect operand).
    */
  private def rankedDocs(docsRaw: DataFrame): DataFrame = {
    // the normalized text MUST materialize before the trigram lambda
    // slices it — inlined, the normalize regex re-runs PER ELEMENT of
    // the transform (35 s of the 41 s profile at sf0.1); the same
    // boundary NearDup.cappedTrigrams stages for the same reason
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val nt = docsRaw
      .select(col("doc_id"), TextFunctions.normText(col("text")).as("nt"))
      .persist(mem)
    try {
      val tok = nt.select(col("doc_id"),
        explode(NearDup.charTrigrams(col("nt"))).as("g"))
      // global df-rank per trigram: (df asc, trigram asc) is a total
      // order, so ranks are deterministic; vocab is alphabet-bounded
      val rank = tok.groupBy(col("g"))
        .agg(count(lit(1)).as("df"))
        .select(col("g"), row_number().over(
          Window.orderBy(col("df").asc, col("g").asc)).cast("long").as("r"))
      // eager localCheckpoint: materialized before nt unpersists
      tok.join(broadcast(rank), "g")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("r"))).as("ranks"))
        .withColumn("n", size(col("ranks")))
        .localCheckpoint()
    } finally { nt.unpersist(); () }
  }

  /** Prefix rows (doc_id, n, pos, tok): the first
    * n − ⌈num·n/den⌉ + 1 (rarest) tokens of each doc, 1-based
    * positions. (num, den) = (t's numerator, denominator) gives the
    * standard probing prefix; (2·tNum, tNum+tDen) gives the SHORTER
    * index prefix valid for the size-ordered smaller side.
    */
  private def prefixRows(docs: DataFrame, num: Int, den: Int): DataFrame = {
    val p = col("n") - floor((col("n") * num + den - 1) / den).cast("int") +
      lit(1)
    docs.select(col("doc_id"), col("n"),
        posexplode(slice(col("ranks"), lit(1), p)))
      .select(col("doc_id"), col("n"), (col("pos") + 1).as("pos"),
        col("col").as("tok"))
  }

  /** The join core over any (doc_id, text) relation.
    *
    * Plan notes from profiling at sf0.1 (5000 docs, the DEGENERATE
    * 400-trigram fixture vocabulary where every "rare" prefix token
    * still has df ≈ 400, so the filter chain keeps 3.4M candidates for
    * 256 true pairs — the adversarial worst case for every
    * prefix-filter method): the candidate join's INPUTS are small
    * (prefix rows ≈ (1−t)·corpus token rows), so the sort-merge the
    * planner picks costs nothing on the sort side and the 100M-row
    * join OUTPUT streams straight through the codegen'd filter chain —
    * no hint needed; the expensive stage was verification, fixed in
    * [[verified]].
    */
  def pairsFrom(docsRaw: DataFrame, tNum: Int, tDen: Int): DataFrame =
    pairsFromRanked(rankedDocs(docsRaw), tNum, tDen)

  private def pairsFromRanked(docs: DataFrame, tNum: Int,
      tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > tNum, "threshold must be in (0, 1)")
    jaccardVerified(docs, jaccardCandidates(docs, docs, tNum, tDen),
      tNum, tDen)
  }

  /** The prefix-filter candidate join between a PROBE digest and an
    * INDEX digest (both rank-encoded against the same rank universe).
    * One-shot self-join passes the same digest twice; the incremental
    * path probes a batch against the maintained members. Role filters
    * are pair-local (the probe doc takes the `a` role only when it is
    * the size-ordered LARGER side), so splitting the corpus across
    * calls never loses a pair as long as each pair's two role splits
    * are covered by some call — the incremental batch logic does both
    * directions.
    *
    * Size-ordered index prefix (Xiao et al. 2008): pairs generate with
    * the SMALLER doc as the index side b, whose prefix only needs
    * n − ⌈2t/(1+t)·n⌉ + 1 tokens (for the first shared token of a
    * J ≥ t pair with nb ≤ na, the overlap bound α ≥ ⌈2t/(1+t)·nb⌉
    * already confines it there) — at t = 4/5 that is ~n/9 vs the
    * probing prefix's ~n/5, which is most of the candidate join volume.
    */
  private def jaccardCandidates(probe: DataFrame, index: DataFrame,
      tNum: Int, tDen: Int): DataFrame =
    jaccardCandidatesFromRows(
      prefixRows(probe, tNum, tDen).select(col("doc_id").as("ida"),
        col("n").as("na"), col("pos").as("pa"), col("tok")),
      prefixRows(index, 2 * tNum, tNum + tDen).select(
        col("doc_id").as("idb"), col("n").as("nb"),
        col("pos").as("pb"), col("tok")),
      tNum, tDen)

  /** The candidate join + filter chain over prebuilt prefix-row
    * relations — `a` the probing (size-ordered larger) side with
    * columns (ida, na, pa, tok), `b` the index side with
    * (idb, nb, pb, tok). Split out so the maintained-index path can
    * feed `a`/`b` from the bucket-partitioned postings table instead of
    * re-exploding digests.
    */
  private def jaccardCandidatesFromRows(a: DataFrame, b: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    // minimum required overlap α = ⌈t·(na+nb)/(1+t)⌉
    val alpha = floor(((col("na") + col("nb")) * tNum + (tNum + tDen) - 1)
      / (tNum + tDen)).cast("int")
    a.join(b, Seq("tok"))
      .where((col("nb") < col("na")
          || (col("nb") === col("na") && col("idb") < col("ida")))
        && col("na") * tNum <= col("nb") * tDen
        && lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
          >= alpha)
      .select(least(col("ida"), col("idb")).as("ida"),
        greatest(col("ida"), col("idb")).as("idb"))
  }

  /** Exact verification + threshold + jaccard emission over any
    * candidate set — the shared tail of the one-shot join and the
    * maintained-index batch probe.
    */
  private def jaccardVerified(docs: DataFrame, cands: DataFrame,
      tNum: Int, tDen: Int): DataFrame =
    verified(docs, cands, "nb_id", (na, nb) =>
        floor((((na + nb) * tNum) + lit(tNum + tDen - 1)) / (tNum + tDen))
          .cast("long"))
      .where(col("n_common") * (tNum + tDen)
        >= (col("n_a") + col("n_b")) * tNum)
      .distinct() // survivor-sized; collapses candidate multiplicity
      .withColumn("jaccard", col("n_common").cast("double")
        / (col("n_a") + col("n_b") - col("n_common")))

  /** Exact verification of deduped candidate pairs. The array payload,
    * not the intersect, is the cost: one rank array is ~1 KB, and a
    * candidate set thousands of times larger than the true-pair set
    * (the degenerate-vocab regime) would drag GBs of arrays through
    * two exchanges if the joins shuffled. When the per-doc digest fits
    * an executor (row count under `broadcastDocLimit` — the same
    * decision a size-stats-aware planner would make, made explicitly
    * because the digest sits behind a stats-erasing localCheckpoint),
    * the arrays attach MAP-SIDE from a broadcast and only skinny pair
    * rows ever move; past the limit it degrades to the evenly-keyed
    * partitioned doc_id joins, which is the correct 100 TB plan —
    * bandwidth proportional to candidates, no skew, no driver state.
    */
  private val broadcastDocLimit = 200000L

  /** `alphaOf(n_a, n_b)` is the caller's minimum required overlap; the
    * threshold-aware intersect prunes candidates that cannot reach it
    * (suffix-filter Hamming bound + early-exit merge — ppjoin+, Xiao
    * 2008 §4) and is EXACT for every candidate that can, so the
    * caller's `n_common ≥ α`-shaped filter sees bit-identical values
    * on all surviving rows.
    *
    * Candidate MULTIPLICITY is accepted, not pre-deduped, in the
    * broadcast regime: with the suffix filter the per-candidate verify
    * cost is ~0.1 µs, so re-verifying a pair once per shared prefix
    * token (duplication ≈ 2× on the degenerate fixture) is far cheaper
    * than the |candidates|-row exchange a pre-`distinct` costs (17.6 s
    * vs 3.6 s at sf0.1) — the whole chain stays pipelined map-side with
    * NO candidate shuffle at all; the kernel is deterministic, so
    * duplicate candidates yield byte-identical rows and the caller's
    * post-filter `distinct` (survivor-sized, tiny) collapses them.
    * Past `broadcastDocLimit` the arrays move through partitioned
    * joins, bandwidth ∝ candidate rows — there the pre-dedup pays and
    * is kept.
    */
  /** Vocabulary cap for the packed-bitmap representation: ≤ 2 KB per
    * doc, so a broadcastDocLimit-sized digest of bitmaps stays well
    * inside one executor. Dense fixtures sit far below it.
    */
  private val bitmapVocabLimit = 16384L

  private def verified(docs: DataFrame, cands: DataFrame, rightName: String,
      alphaOf: (Column, Column) => Column): DataFrame = {
    // ranks are a dense 1-based universe [1, vocab]; max rank of the
    // sorted array (its last element) IS the vocabulary size — one
    // 1-row agg on the digest decides BOTH the join side and the
    // representation (fused: a single eager action on the digest).
    // max() is NULL on an empty digest — then every branch is
    // equivalent (no rows survive), so take the cheap dense one.
    // functions.count spelled out: `count` is shadowed by the verify
    // kernel val below
    val stats = docs.agg(
      org.apache.spark.sql.functions.count(lit(1)),
      max(element_at(col("ranks"), -1))).head
    val small = stats.getLong(0) <= broadcastDocLimit
    val vocab = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val dense = vocab <= bitmapVocabLimit
    val words = ((vocab + 63L) / 64L).toInt
    def side(d: DataFrame) = if (small) broadcast(d) else d
    val c = if (small) cands else cands.distinct()
    val payload = if (dense)
      graft.functions.BitsetOfRanks(col("ranks"), lit(words))
    else col("ranks")
    val ga = docs.select(col("doc_id").as("ida"), payload.as("ra"),
      col("n").cast("long").as("n_a"))
    val gb = docs.select(col("doc_id").as("idb"), payload.as("rb"),
      col("n").cast("long").as("n_b"))
    val count = if (dense)
      graft.functions.BitsetAndCount(col("ra"), col("rb"))
    else graft.functions.ThresholdIntersectCount(col("ra"), col("rb"),
      alphaOf(col("n_a"), col("n_b")))
    c.join(side(ga), "ida").join(side(gb), "idb")
      .select(col("ida").as("doc_id"), col("idb").as(rightName),
        count.as("n_common"), col("n_a"), col("n_b"))
  }

  /** DIRECTIONAL containment join — every ordered pair (x, y), x ≠ y,
    * with |x ∩ y| / |x| ≥ tNum/tDen: "x is (nearly) a sub-document of
    * y", the quote / near-superset detector Jaccard cannot express (a
    * short doc fully inside a long one has low Jaccard but containment
    * 1). Same public filter family as [[pairsFrom]], adapted to the
    * asymmetric measure: only the CONTAINED side is prefix-pruned (the
    * container must hold almost all of x, so it must hold one of x's
    * first n_x − ⌈t·n_x⌉ + 1 rarest tokens — y gets no prefix, every
    * token of y is indexed); length filter is one-sided
    * (|y| ≥ t·|x| since |x∩y| ≤ |y|); the positional bound is
    * 1 + min(n_x−i, n_y−j) ≥ α with α = ⌈t·n_x⌉. On real (Zipfian)
    * corpora the probe side's prefix tokens are globally rare, which is
    * what bounds the candidate fan-out at scale.
    */
  def containment(s: SparkSession, dir: String,
      tNum: Int = 9, tDen: Int = 10): DataFrame =
    containmentFromRanked(rankedDocsCached(s, dir), tNum, tDen)

  def containmentFrom(docsRaw: DataFrame, tNum: Int, tDen: Int): DataFrame =
    containmentFromRanked(rankedDocs(docsRaw), tNum, tDen)

  private def containmentFromRanked(docs: DataFrame, tNum: Int,
      tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > tNum, "threshold must be in (0, 1)")
    containmentVerified(docs,
      containmentCandidates(docs, docs, tNum, tDen), tNum, tDen)
  }

  /** Prefix-filter candidates for the DIRECTIONAL join between a
    * CONTAINED-side probe digest and a CONTAINER-side index digest.
    * Roles here are the measure's own direction (x ⊆ y), not size
    * order, so the incremental path must probe each batch in both
    * directions — see [[appendContainmentIndexBatch]].
    */
  private def containmentCandidates(probe: DataFrame, index: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    val a = prefixRows(probe, tNum, tDen)
      .select(col("doc_id").as("ida"), col("n").as("na"),
        col("pos").as("pa"), col("tok"))
    // the container side indexes (almost) all tokens — asymmetry is
    // the point; the only sound pre-cut is the smallest-PROBE bound:
    // a first shared token at container position j needs
    // j ≤ n_b − α + 1 with α ≥ ⌈t·min(n_a)⌉, so later positions can
    // never generate a candidate (1-row digest agg, computed once —
    // per probe side, which keeps the cut sound call-locally; NULL on
    // an empty probe digest means no candidates at all)
    val naMinRow = probe.agg(min(col("n"))).head
    if (naMinRow.isNullAt(0))
      return index.sparkSession.createDataFrame(
        index.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ida",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("idb",
            org.apache.spark.sql.types.LongType))))
    val naMin = naMinRow.getInt(0)
    val alphaMin = (naMin * tNum + tDen - 1) / tDen
    val b = index.select(col("doc_id").as("idb"), col("n").as("nb"),
        posexplode(slice(col("ranks"), lit(1),
          greatest(col("n") - lit(alphaMin) + 1, lit(0)))))
      .select(col("idb"), col("nb"), (col("pos") + 1).as("pb"),
        col("col").as("tok"))
    val alpha = floor((col("na") * tNum + tDen - 1) / tDen).cast("int")
    a.join(b, Seq("tok"))
      .where(col("ida") =!= col("idb")
        && col("nb") * tDen >= col("na") * tNum
        && lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
          >= alpha)
      .select(col("ida"), col("idb"))
  }

  /** Exact verification + threshold + containment emission — the shared
    * tail of the one-shot join and the maintained-index batch probe.
    */
  private def containmentVerified(docs: DataFrame, cands: DataFrame,
      tNum: Int, tDen: Int): DataFrame =
    verified(docs, cands, "container_id", (na, _) =>
        floor(((na * tNum) + lit(tDen - 1)) / tDen).cast("long"))
      .where(col("n_common") * tDen >= col("n_a") * tNum)
      .distinct() // survivor-sized; collapses candidate multiplicity
      .withColumn("containment",
        col("n_common").cast("double") / col("n_a"))

  // ─────────────────── incremental similarity-join index ───────────────────

  /** FROZEN rank universe per dir — the trainedCentroids discipline: the
    * global df-rank map is a persisted training artifact (alphabet-
    * bounded: one row per distinct trigram) and batch ingestion encodes
    * against it, never retrains. It is the SAME staged artifact the
    * one-shot digest is encoded against ([[stagedArtifacts]] writes
    * both from one corpus pass), so the one-shot and incremental
    * encodings are bit-identical by construction. (In production an
    * unseen trigram maps to no rank and drops from the set — here
    * training saw the corpus, the same closed-world premise every
    * frozen-artifact twin makes.)
    */
  private[graft] def trainedRanks(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(stagedArtifacts(s, dir)._2)

  /** Rank-encode a batch against the frozen universe — O(batch), one
    * broadcast of the vocab-bounded rank table.
    */
  private[graft] def encodeAgainst(docsRaw: DataFrame, rank: DataFrame,
      eager: Boolean = true): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // a foreachBatch micro-batch arrives as ONE scan partition (one feed
    // file per trigger): rebalance before the normalize/trigram stage so
    // the per-row regex work parallelizes (no-op for well-split inputs)
    val ntRaw = (if (eager) Tables.spread(docsRaw) else docsRaw)
      .select(col("doc_id"), TextFunctions.normText(col("text")).as("nt"))
    val nt = if (eager) ntRaw.persist(mem) else ntRaw
    def enc = nt.select(col("doc_id"),
        explode(NearDup.charTrigrams(col("nt"))).as("g"))
      .join(broadcast(rank), "g")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("r"))).as("ranks"))
      .withColumn("n", size(col("ranks")))
    if (!eager) enc // plan-inspection path (specs) — no materialization
    else try enc.localCheckpoint() finally { nt.unpersist(); () }
  }

  /** Batch half of INCREMENTAL LOSSLESS-SIMILARITY-JOIN maintenance —
    * the streaming twin of [[pairs]]: each arriving batch of documents
    * is rank-encoded against the frozen universe, its prefix tokens
    * probe the members indexed so far IN BOTH ROLES (batch as the
    * size-ordered larger side against everything present including the
    * batch; existing members as the larger side against the batch), and
    * the verified surviving pairs + memberships are appended. Every
    * J ≥ t pair is candidate-generable exactly in the batch where its
    * LATER member arrives (the prefix/length/positional filters are
    * pair-local given the frozen ranks), so the union of per-batch
    * emissions IS the one-shot lossless pair set, whatever the
    * batching.
    *
    * THE INDEX LAYOUT IS THE SCALE STORY: admitted members' probing-
    * prefix rows are maintained as a POSTINGS table partitioned by
    * token bucket (`bucket = tok % 64` — the inverted-index layout a
    * warehouse similarity join keeps), so a batch's probe reads ONLY
    * the partitions its own prefix tokens hash into — partition
    * pruning makes per-batch admission O(batch-prefix ×
    * touched-buckets), never a corpus re-explode, and the index-side
    * shorter prefix is a `pos` filter on the same rows (the index
    * prefix is a PREFIX of the probing prefix). The touched-bucket
    * sets are driver-side digests bounded by the 64 buckets — the
    * k-means-centroid collect discipline. Postings append is PLAIN
    * partitioned append (not [[graft.util.BatchAppend]]): posting rows
    * are VALUE-IDEMPOTENT — a crash-window duplicate only duplicates
    * candidate generation, which the verify tail's distinct collapses —
    * the same immunity argument the KMV/Bloom partials use; the pairs
    * and members tables stay BatchAppend-atomic, and batchId markers
    * make re-delivery a no-op.
    */
  def appendJaccardIndexBatch(s: SparkSession, indexDir: String,
      batch: DataFrame, dir: String, tNum: Int = 4, tDen: Int = 5,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    val ba = encodeAgainst(batch.select(col("doc_id"), col("text")),
      trainedRanks(s, dir))
    val membersPath = new org.apache.hadoop.fs.Path(s"$indexDir/members")
    val fs = membersPath.getFileSystem(s.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(membersPath)) s.read.parquet(membersPath.toString)
      else s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], ba.schema)
    val all = existing.unionByName(ba)

    // batch probing-prefix rows, staged once (probe side, index side
    // via the pos filter, postings append, and the bucket digests all
    // derive from it)
    val pIdx = col("n") - floor((col("n") * (2 * tNum) + (tNum + tDen) - 1)
      / (tNum + tDen)).cast("int") + lit(1)
    val baPost = prefixRows(ba, tNum, tDen)
      .withColumn("bucket",
        pmod(col("tok"), lit(PostingsBuckets.toLong)).cast("int"))
      .localCheckpoint()
    val baProbe = baPost.select(col("doc_id").as("ida"), col("n").as("na"),
      col("pos").as("pa"), col("tok"))
    val baIndex = baPost.where(col("pos") <= pIdx)
      .select(col("doc_id").as("idb"), col("n").as("nb"),
        col("pos").as("pb"), col("tok"))

    val postPath = new org.apache.hadoop.fs.Path(s"$indexDir/postings")
    val cands = if (!fs.exists(postPath)) {
      // first batch: nothing admitted yet — batch vs batch only
      jaccardCandidatesFromRows(baProbe, baIndex, tNum, tDen)
    } else {
      // touched-bucket digests: bounded by the bucket count, collected
      // driver-side to drive partition pruning on the postings read —
      // ONE fused agg job for both digests instead of two
      val bucketsRow = baPost.agg(
        collect_set(col("bucket")),
        collect_set(when(col("pos") <= pIdx, col("bucket")))).head
      val probeBuckets = bucketsRow.getSeq[Int](0).toArray
      val idxBuckets = bucketsRow.getSeq[Int](1).toArray
      def posts(buckets: Array[Int]) =
        postingsPruned(s, indexDir, buckets)
      // batch as probe: index side = admitted postings (pruned to the
      // batch-probe buckets, cut to the shorter index prefix) + batch
      val bExisting = posts(probeBuckets).where(col("pos") <= pIdx)
        .select(col("doc_id").as("idb"), col("n").as("nb"),
          col("pos").as("pb"), col("tok"))
      // admitted members as probe: only postings in the batch-index
      // buckets can match the batch's index side
      val aExisting = posts(idxBuckets)
        .select(col("doc_id").as("ida"), col("n").as("na"),
          col("pos").as("pa"), col("tok"))
      jaccardCandidatesFromRows(baProbe, bExisting.unionAll(baIndex),
          tNum, tDen)
        .unionAll(jaccardCandidatesFromRows(aExisting, baIndex, tNum, tDen))
    }
    val newPairs = jaccardVerified(all, cands, tNum, tDen)
    graft.util.BatchAppend.append(newPairs, s"$indexDir/pairs", batchId)
    graft.util.BatchAppend.append(ba, s"$indexDir/members", batchId)
    // cluster by bucket before the partitioned write: one file per
    // touched bucket per batch instead of (tasks × buckets) shards —
    // the file-count hygiene a maintained inverted index needs
    baPost.select(col("doc_id"), col("n"), col("pos"), col("tok"),
        col("bucket"))
      .repartition(PostingsBuckets, col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(postPath.toString)
    marker.foreach { case (fs2, p) =>
      fs2.mkdirs(p.getParent); fs2.create(p, true).close() }
  }

  /** Token-bucket count of the maintained postings layout — small
    * enough that the touched-bucket digest is a trivial driver-side
    * collect, large enough that a batch prunes most of the index.
    */
  private val PostingsBuckets = 64

  /** The bucket-pruned postings read — the filter is on the PARTITION
    * column, so it resolves to directory pruning at planning time (the
    * plan's FileSourceScan carries it as a PartitionFilter, pinned in
    * NewOpPlanSpec): a batch physically never opens the buckets its
    * prefix tokens do not hash into.
    */
  private[graft] def postingsPruned(s: SparkSession, indexDir: String,
      buckets: Array[Int]): DataFrame = {
    val posts = s.read.parquet(s"$indexDir/postings")
    if (buckets.isEmpty) posts.where(lit(false))
    else posts.where(col("bucket").isin(buckets.map(Integer.valueOf): _*))
  }

  /** Report half: the union of the per-batch verified emissions — no
    * fold needed beyond a survivor-sized distinct (each pair was
    * emitted in exactly one batch; the distinct only guards replayed
    * partial writes). Must equal the one-shot [[pairs]] bit for bit.
    */
  def jaccardPairsFromIndex(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/pairs").distinct()

  /** Batch half of INCREMENTAL CONTAINMENT-JOIN maintenance — the
    * directional sibling of [[appendJaccardIndexBatch]]. Containment
    * roles are the measure's own direction (contained x probes,
    * container y is indexed), not size order, so each batch probes in
    * both directions: the batch as the contained side against
    * everything present (covering batch⊆batch, batch⊆existing), and the
    * existing members as the contained side against the batch
    * (existing⊆batch). Every ordered pair (x, y) with C(x→y) ≥ t is
    * generated exactly in the batch where its LATER member arrives, so
    * the union of per-batch verified emissions IS the one-shot
    * directional join, whatever the batching. Same frozen rank
    * universe, members table, batchId idempotence, and crash-safe LSM
    * appends as the Jaccard twin.
    */
  def appendContainmentIndexBatch(s: SparkSession, indexDir: String,
      batch: DataFrame, dir: String, tNum: Int = 9, tDen: Int = 10,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    val ba = encodeAgainst(batch.select(col("doc_id"), col("text")),
      trainedRanks(s, dir))
    val membersPath = new org.apache.hadoop.fs.Path(s"$indexDir/members")
    val fs = membersPath.getFileSystem(s.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(membersPath)) s.read.parquet(membersPath.toString)
      else s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], ba.schema)
    val all = existing.unionByName(ba)
    val cands = containmentCandidates(ba, all, tNum, tDen)
      .unionAll(containmentCandidates(existing, ba, tNum, tDen))
    val newPairs = containmentVerified(all, cands, tNum, tDen)
    graft.util.BatchAppend.append(newPairs, s"$indexDir/pairs", batchId)
    graft.util.BatchAppend.append(ba, s"$indexDir/members", batchId)
    marker.foreach { case (fs2, p) =>
      fs2.mkdirs(p.getParent); fs2.create(p, true).close() }
  }

  /** Report half of the containment twin — must equal the one-shot
    * [[containment]] bit for bit (the distinct only guards replayed
    * partial writes; each ordered pair was emitted in exactly one
    * batch).
    */
  def containmentFromIndex(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/pairs").distinct()
}
