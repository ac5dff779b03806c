package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path.
  *
  * Determinism discipline: a dot product is a PER-ROW left fold over the
  * array (fixed element order), so double accumulation is bit-reproducible
  * — unlike a cross-row float SUM, whose partial-aggregation order Spark
  * does not fix. Rankings tie-break on the candidate id after rounding, so
  * near-equal cosines can never reorder results between engines or runs.
  */
object Similarity {

  /** LSH geometry defaults, shared by the engine (lshNearestInBucket) and
    * the oracle-side plane inlining (SparkEntry.LshSigSqlExpr) so the two
    * can never silently desync.
    */
  val DefaultNPlanes: Int = 12
  val DefaultDim: Int = 64

  /** Sequential-fold dot product of two float-array columns, accumulated
    * in double. Matches an engine's elementwise loop bit-for-bit.
    */
  def dotDouble(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosineFrom(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot / sqrt(normSqA * normSqB)

  /** Cosine via the native codegen'd Catalyst expression
    * (graft.functions.CosineSimilarity) — bit-identical arithmetic to the
    * HOF fold (same left-to-right double accumulation), but it stays
    * inside whole-stage codegen instead of interpreted lambda dispatch.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  /** Portable HOF formulation (kept as the cross-engine baseline). */
  def cosineHof(a: Column, b: Column): Column =
    cosineFrom(dotDouble(a, b), dotDouble(a, a), dotDouble(b, b))

  /** Brute-force cosine top-k: the first `nQueries` vectors probe the full
    * set. Query side broadcasts; candidate side streams — one pass over
    * the embeddings per batch of queries, then a per-query top-k window
    * (WindowGroupLimit keeps it a bounded heap, not a full sort).
    * Cosines are rounded to 6 dp BEFORE ranking so the (score, id) order
    * is total and portable.
    */
  def bruteForceTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** HARD-TRIPLET MINING for contrastive/metric training (the FaceNet
    * recipe, Schroff et al. 2015 — public method): per anchor, the
    * hardest POSITIVE (most-similar same-label vector, i.e. the pair
    * the model must pull together) and the hardest NEGATIVE
    * (most-similar different-label vector — the near-but-wrong example
    * in-batch negatives miss), with margin = pos_sim − neg_sim; rows
    * with margin ≤ 0 are exactly the active triplets a trainer feeds
    * first. Brute exact scoring is the recall anchor (the sim_topk
    * discipline — anchors broadcast, ONE corpus scan); at serving scale
    * the candidate stage swaps to the IVF/PQ paths gated elsewhere,
    * same contract. Cosines round to 6 dp before ranking, argmaxes run
    * under (sim DESC, vec_id ASC) — deterministic both engines.
    */
  def tripletMining(s: SparkSession, dir: String,
      nQueries: Int = 20): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val anchors = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val scored = emb.join(broadcast(anchors), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    def top1(part: DataFrame, idc: String, simc: String) = part
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("qid"), col("vec_id").as(idc), col("cos_sim").as(simc))
    val pos = top1(scored.where(col("label") === col("qlabel")),
      "pos_id", "pos_sim")
    val neg = top1(scored.where(col("label") =!= col("qlabel")),
      "neg_id", "neg_sim")
    pos.join(neg, "qid")
      .select(col("qid"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"),
        (col("pos_sim") - col("neg_sim")).as("margin"))
  }

  /** DIVERSIFIED top-k by MAXIMAL MARGINAL RELEVANCE (Carbonell &
    * Goldstein 1998) — the rerank every retrieval stack runs when the
    * raw top-k is redundant (near-duplicate passages crowding a RAG
    * context window): greedily pick the candidate maximizing
    * λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s), so each pick is relevant
    * AND far from everything already picked. λ = 1/2 is binary-exact.
    *
    * Determinism: candidate and pairwise cosines are rounded to 6 dp
    * up front; each greedy step is then ±/× of identical IEEE operands
    * and an argmax under the (mmr DESC, vec_id ASC) total order — the
    * oracle unrolls the same k steps as CTE rounds. The empty-set
    * diversity term is 0 by convention, so the first pick is the
    * relevance argmax.
    *
    * Shape at 100 TB: candidate generation is the scale path (brute
    * here; the ANN serving rankings produce the same contract) and cuts
    * to `legK` rows FIRST; the ≤legK² pairwise-cosine digest and the k
    * greedy rounds (one anti-join + one max-agg + one 1-row TakeOrdered
    * each, localCheckpointed) never touch the corpus — MMR cost is
    * O(k·legK) regardless of corpus size.
    */
  def mmrTopK(s: SparkSession, dir: String, legK: Int = 50, k: Int = 10,
      qid: Long = 0L): DataFrame = {
    val cands = bruteForceTopK(s, dir, nQueries = 1, k = legK)
      .where(col("qid") === qid)
      .select(col("vec_id"), col("cos_sim").as("rel"))
      .localCheckpoint(true)
    mmrSelect(cands, candidatePairSims(s, dir, cands), k)
  }

  /** Pairwise rounded cosines among a bounded candidate set — the
    * diversity relation both MMR consumers share.
    */
  def candidatePairSims(s: SparkSession, dir: String,
      cands: DataFrame): DataFrame = {
    val cv = cands.join(Tables.embeddings(s, dir), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"))
    cv.as("x")
      .join(broadcast(cv.as("y")), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(cosine(col("x.embedding"), col("y.embedding")), 6).as("sim"))
      .localCheckpoint(true)
  }

  /** The greedy MMR core over ANY (vec_id, rel) candidate relation and
    * (a, b, sim) pair relation — relevance may be a cosine, an RRF
    * fusion score, or any calibrated rank signal; the selection
    * semantics and determinism devices are identical.
    */
  def mmrSelect(cands: DataFrame, pairs: DataFrame, k: Int): DataFrame = {
    val s = cands.sparkSession
    var sel = s.range(0)
      .select(col("id").as("vec_id"), col("id").as("step"),
        col("id").cast("double").as("mmr"))
    for (i <- 1 to k) {
      val simToSel = pairs
        .join(sel.select(col("vec_id").as("b")), Seq("b"))
        .groupBy(col("a")).agg(max(col("sim")).as("msim"))
        .select(col("a").as("vec_id"), col("msim"))
      val pick = cands
        .join(sel.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .join(simToSel, Seq("vec_id"), "left_outer")
        .select(col("vec_id"),
          (lit(0.5) * col("rel")
            - lit(0.5) * coalesce(col("msim"), lit(0.0))).as("mmr"))
        .orderBy(col("mmr").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), lit(i.toLong).as("step"), col("mmr"))
      sel = sel.unionByName(pick).localCheckpoint(true)
    }
    sel.select(col("step"), col("vec_id"), col("mmr"))
  }

  /** BINARY (1-bit) RETRIEVAL — the bottom rung of the quantization
    * ladder (below int8 and PQ): each vector collapses to its 64-bit
    * sign pattern (the codegen'd [[graft.functions.SignBits]]) and
    * search ranks by Hamming distance, xor + popcount per candidate.
    * At 100 TB this is the first-stage filter that scans 8 bytes per
    * vector from a column the ANN index ships alongside the ids — the
    * modern binary-embedding serving trick; exact rerank rides on the
    * survivors ([[binaryRecall]] measures what survives). Ranking is
    * total via the (hamming asc, vec_id asc) tiebreak and every value
    * is an integer — nothing for engines to disagree on.
    */
  def binaryTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val sig = Tables.embeddings(s, dir).select(col("vec_id"),
      graft.functions.SignBits(col("embedding")).as("sig"))
    val queries = sig.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("sig").as("qsig"))
    val w = Window.partitionBy("qid")
      .orderBy(col("hamming").asc, col("vec_id").asc)
    sig.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("bit_count(qsig ^ sig)").cast("long").as("hamming"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("hamming"),
        col("rank").cast("long").as("rank"))
  }

  /** TWO-STAGE retrieval — the production binary-serving composition:
    * stage 1 scans 8-byte sign signatures and keeps the `candK`
    * Hamming-nearest candidates ([[binaryTopK]]); stage 2 reranks ONLY
    * the survivors by exact cosine. This is the modern
    * binary-embedding serving shape verbatim (coarse integer filter
    * over the whole corpus, exact float math over a bounded candidate
    * set) — [[binaryRecall]] measures stage 1's ceiling; this gate pins
    * the composed pipeline's output. Rank orders are the established
    * total orders (hamming/vec_id, rounded-cosine/vec_id).
    *
    * At 100 TB stage 1 reads 8 bytes/vector from the signature column
    * and stage 2 touches candK·dim floats per query — the corpus-width
    * float scan never happens.
    */
  def twoStageTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      candK: Int = 50, k: Int = 10): DataFrame = {
    val cand = binaryTopK(s, dir, nQueries, candK)
      .select(col("qid"), col("vec_id"))
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    cand.join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Recall@k of the sign-bit ranking against the exact-cosine brute
    * top-k — the honesty gate for the 1-bit signature, like its PQ and
    * matryoshka siblings.
    */
  def binaryRecall(s: SparkSession, dir: String, nQueries: Int = 5,
      topK: Int = 10): DataFrame = {
    val approx = binaryTopK(s, dir, nQueries, topK)
      .select(col("qid"), col("vec_id"))
    val brute = bruteForceTopK(s, dir, nQueries, topK)
      .select(col("qid"), col("vec_id"))
    val hits = approx.join(brute, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    brute.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
        (coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_true").cast("double")).as("recall"))
  }

  /** Deterministic pseudo-random hyperplanes (no RNG at runtime): a fixed
    * 64-bit LCG stream, one plane per signature bit.
    */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Signature column: bit j = sign of <embedding, plane_j>, via the
    * single-pass codegen'd expression (graft.functions.LshSignature). The
    * HOF formulation below is the portable baseline it must match
    * bit-for-bit (asserted in OperatorsSpec).
    */
  def lshSignature(emb: Column, ps: Seq[Seq[Double]]): Column =
    graft.functions.LshSignature(emb, ps)

  /** Portable HOF signature (interpreted; equivalence baseline only — it
    * runs nPlanes CodegenFallback folds per row and de-codegens its
    * stage, the round-1 interpreted-projection trap).
    */
  def lshSignatureHof(emb: Column, ps: Seq[Seq[Double]]): Column =
    ps.zipWithIndex.map { case (p, j) =>
      when(dotDouble(emb, typedlit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) approximate search: vectors are indexed by cell
    * (here the `label` column stands in for trained k-means cells — see
    * the centroid aggregation in SparkEntry, which IS the training step);
    * a query probes the `nprobe` nearest cell centroids and reranks
    * exactly within those cells only. The scan is |cells probed| / |cells|
    * of the corpus — the standard recall/cost dial — and the probe
    * selection is a broadcast of (cells × dim) centroids, so the plan is
    * one broadcast join + per-query top-k window regardless of corpus
    * size.
    */
  def ivfTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, nprobe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    ivfSearch(queries, emb, k, nprobe, excludeSelf = true)
  }

  /** Centroids with DECIMAL-exact means, rounded to 6 dp and stored as
    * float: cross-row double SUM order is engine/partitioning-dependent,
    * but decimal addition is associative-exact, so the trained centroid
    * (and therefore probe selection and the whole IVF answer) is
    * bit-reproducible — which is what lets the external oracle check
    * IVF queries end-to-end instead of a rows-only smoke test.
    */
  private[graft] def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(col("v").cast("double").cast("decimal(30,15)")).as("sv"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        round(col("sv").cast("double") / col("n"), 6).cast("float").as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))

  /** IVF probe + in-cell rerank for an ARBITRARY query relation
    * (qid, qe) against a label-indexed corpus (vec_id, embedding,
    * label) — shared by same-modality search ([[ivfTopK]], which
    * excludes the self-match) and cross-modal retrieval
    * (Multimodal.crossModalIvfTopK, where query ids live in a different
    * id space so nothing is excluded). The plan shape is the scale
    * path: a broadcast of (cells × dim) centroids for probe selection,
    * then a rerank that scans only |probed cells| / |cells| of the
    * corpus.
    */
  /** Probe selection: rank cells per query by centroid similarity,
    * rounded to 6 dp BEFORE ranking (with the label tiebreak) so probe
    * choice is total and portable across engines. One broadcast of the
    * (cells × dim) centroid table, whatever the corpus size.
    */
  private[graft] def ivfProbes(queries: DataFrame, cent: DataFrame,
      nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy("qid").orderBy(col("c_sim").desc, col("label").asc)
    queries.join(broadcast(cent))
      .select(col("qid"), col("qe"), col("label"),
        round(cosine(col("qe"), col("centroid")), 6).as("c_sim"))
      .withColumn("pr", row_number().over(probeW)).where(col("pr") <= nprobe)
      .select(col("qid"), col("qe"), col("label"))
  }

  private[graft] def ivfSearch(queries: DataFrame, emb: DataFrame,
      k: Int, nprobe: Int, excludeSelf: Boolean): DataFrame = {
    val probes = ivfProbes(queries, labelCentroids(emb), nprobe)
    // exact rerank within probed cells only
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    val cand = probes.join(emb.select(col("label"), col("vec_id"),
      col("embedding")), Seq("label"))
    (if (excludeSelf) cand.where(col("vec_id") =!= col("qid")) else cand)
      .select(col("qid"), col("label"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** One spherical-k-means step: assign every vector to its max-cosine
    * cell (6-dp rounding + cell-asc tiebreak make the argmax total and
    * portable across engines), via a broadcast of the (cells × dim)
    * centroid table — the corpus streams, nothing shuffles.
    */
  private def assignCells(emb: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cell").asc)
    emb.join(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cell"),
        round(cosine(col("embedding"), col("centroid")), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** Spherical k-means training (REAL trained IVF cells, replacing the
    * `label` stand-in): deterministic seeding (the k lowest-id vectors),
    * then `iters` Lloyd steps of assign (broadcast centroids, max-cosine,
    * tiebreak on cell) + update (per-dimension DECIMAL-exact mean,
    * rounded to 6 dp, stored as float). Every step is bit-reproducible —
    * decimal addition is associative-exact, so partial-aggregation order
    * cannot perturb a centroid — which is what lets the DuckDB oracle
    * replay the whole training loop and hash-match the result.
    *
    * The trained centroids are collected to the driver and re-emitted as
    * a local relation: a centroid table is (cells × dim) BY DEFINITION —
    * bounded however big the corpus — and truncating the iterative
    * lineage here is the standard Spark shape for iterative ML (MLlib
    * keeps centers on the driver between iterations too). Per iteration
    * the corpus is scanned once; nothing but (cell, pos) partial sums
    * ever shuffles.
    */
  def kmeansCentroids(s: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    var cent = emb.where(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("centroid"))
    for (_ <- 1 to iters) {
      cent = assignCells(emb, cent)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v").cast("double").cast("decimal(30,15)")).as("sv"),
          count(lit(1)).as("n"))
        .select(col("cell"), col("pos"),
          round(col("sv").cast("double") / col("n"), 6).cast("float").as("c"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("centroid"))
      // truncate lineage between iterations: k × dim floats, bounded
      val local = cent.as[(Int, Array[Float])].collect().toSeq
      cent = s.createDataset(local).toDF("cell", "centroid")
    }
    cent
  }

  /** Scratch-parquet memo of the TRAINED centroids, keyed by
    * (dir, k, iters). This is the production IVF shape: training is a
    * separate job whose output is a persisted artifact; searches READ
    * the artifact, they never retrain. At 100 TB the index build is
    * hours and the search is milliseconds — fusing them into one query
    * (as ivfKmeansTopK originally did) only made sense as an end-to-end
    * reproducibility demo. The artifact is k × dim floats — trivially
    * small whatever the corpus size.
    */
  private val centroidPaths =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), String]()

  def trainedCentroids(s: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val path = centroidPaths.computeIfAbsent((dir, k, iters), _ => {
      val p = graft.util.Scratch.dir("graft_ivf_cells").resolve("cells").toString
      kmeansCentroids(s, dir, k, iters)
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Trained cells as oracle-hashable scalar rows (cell, pos, component);
    * the gate cannot sort/hash array columns. Deliberately TRAINS (calls
    * kmeansCentroids directly, not the artifact memo): this is the gate
    * query for the training job itself, so its benched time must include
    * the Lloyd iterations — only searches read [[trainedCentroids]].
    */
  def kmeansCellsScalar(s: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame =
    kmeansCentroids(s, dir, k, iters)
      .select(col("cell").cast("long").as("cell"),
        posexplode(col("centroid")).as(Seq("pos", "c")))
      .select(col("cell"), (col("pos") + 1).cast("long").as("pos"),
        col("c").cast("double").as("c"))

  /** IVF search over the TRAINED cells: index assignment with the final
    * centroids, probe the nprobe best cells per query, exact rerank
    * within probed cells only — the same recall/cost dial as ivfTopK but
    * with cells the engine trained itself. The centroids come from the
    * persisted training artifact ([[trainedCentroids]]), not an inline
    * retrain — search never pays the training scan.
    */
  /** Probe + in-cell rerank against an ALREADY-ASSIGNED (cell, vec_id,
    * embedding) index — shared by the train-then-search gate
    * ([[ivfKmeansTopK]], which assigns on the fly) and the maintained
    * streaming index ([[ivfTopKFromIndex]], which reads appended
    * assignments). Probe side is (queries × nprobe) rows — bounded by
    * the serving batch, so it broadcasts and the corpus never shuffles
    * for rerank.
    */
  private def ivfSearchAssigned(queries: DataFrame, cent: DataFrame,
      assigned: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy("qid").orderBy(col("c_sim").desc, col("cell").asc)
    val probes = queries.join(broadcast(cent))
      .select(col("qid"), col("qe"), col("cell"),
        round(cosine(col("qe"), col("centroid")), 6).as("c_sim"))
      .withColumn("pr", row_number().over(probeW)).where(col("pr") <= nprobe)
      .select(col("qid"), col("qe"), col("cell"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    broadcast(probes).join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("cell").cast("long").as("cell"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  def ivfKmeansTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, nprobe: Int = 2, cells: Int = 8, iters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cent = trainedCentroids(s, dir, cells, iters)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    ivfSearchAssigned(queries, cent, assignCells(emb, cent), k, nprobe)
  }

  /** Batch half of INCREMENTAL ANN-INDEX maintenance — the streaming
    * vector-DB ingestion shape: each arriving batch of vectors is
    * assigned to the FIXED trained centroids (the persisted
    * [[trainedCentroids]] artifact — ingestion never retrains) and
    * appended to the (cell, vec_id, embedding) index. Assignment is a
    * pure per-vector function of the frozen centroids, so the
    * batch-appended index equals the one-shot assignment of the whole
    * corpus regardless of batching; batchId markers make re-delivered
    * micro-batches no-ops. O(batch) per batch, one broadcast of the
    * (cells × dim) centroid table.
    */
  def appendIvfIndexBatch(s: SparkSession, indexDir: String,
      batch: DataFrame, dir: String, cells: Int = 8, iters: Int = 2,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      assignCells(batch.select(col("vec_id"), col("embedding")),
          trainedCentroids(s, dir, cells, iters))
        .withColumn("seq", lit(batchId.getOrElse(0L))),
      s"$indexDir/cells", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** One-shot IVF search over an explicit corpus subset against the
    * frozen trained centroids — the comparator the delete gate (and
    * its spec) checks the maintained index against.
    */
  private[graft] def ivfSearchAssignedForTest(s: SparkSession, dir: String,
      corpus: DataFrame, nQueries: Int = 5, k: Int = 5, nprobe: Int = 2,
      cells: Int = 8, iters: Int = 2): DataFrame = {
    val cent = trainedCentroids(s, dir, cells, iters)
    val queries = Tables.embeddings(s, dir).where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    ivfSearchAssigned(queries, cent, assignCells(corpus, cent), k, nprobe)
  }

  /** DELETE half of incremental ANN-index maintenance: appends
    * TOMBSTONES (vec_id, seq) for the deleted ids — O(batch) on the
    * ingest path, no index rewrite (the LSM discipline, the changelog
    * shape of MergeOps.deleteWhere applied to the vector store).
    * Readers resolve last-writer-wins on the batch sequence: a
    * tombstone kills every index entry of its id with `entry.seq <=
    * tombstone.seq` (delete wins a same-batch tie), so a LATER re-add
    * of the id lives — upsert = delete + append. Its own batchId
    * marker namespace keeps re-delivered delete batches no-ops.
    */
  def deleteFromIvfIndexBatch(s: SparkSession, indexDir: String,
      ids: DataFrame, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/_applied_del/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    ids.select(col("vec_id")).distinct()
      .withColumn("seq", lit(batchId.getOrElse(0L)))
      .write.mode("append").parquet(s"$indexDir/tombstones")
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** The LIVE view of a maintained index: entries minus tombstoned
    * versions. One equi-join on vec_id against the max-seq tombstone
    * digest (map-side-combinable aggregate; broadcasts while the
    * delete set is small, shuffles on the id key when it isn't — never
    * a corpus rescan); an index with no tombstones reads back as-is.
    * Entries written before the seq column existed default to seq 0.
    */
  def liveIvfIndex(s: SparkSession, indexDir: String): DataFrame = {
    val cellsPath = new org.apache.hadoop.fs.Path(s"$indexDir/cells")
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = cellsPath.getFileSystem(s.sessionState.newHadoopConf())
    val entries0 = s.read.parquet(cellsPath.toString)
    val entries =
      if (entries0.columns.contains("seq")) entries0
      else entries0.withColumn("seq", lit(0L))
    if (!fs.exists(tombPath)) entries.drop("seq")
    else {
      val tomb = s.read.parquet(tombPath.toString)
        .groupBy(col("vec_id")).agg(max(col("seq")).as("__del_seq"))
      entries.join(tomb, Seq("vec_id"), "left_outer")
        .where(col("__del_seq").isNull || col("seq") > col("__del_seq"))
        .drop("__del_seq", "seq")
    }
  }

  /** Search half: the same probe + rerank as [[ivfKmeansTopK]], but
    * against the maintained index — must return the identical top-k
    * (the gate reuses the sim_ivf_kmeans_topk oracle verbatim).
    */
  def ivfTopKFromIndex(s: SparkSession, indexDir: String, dir: String,
      nQueries: Int = 5, k: Int = 5, nprobe: Int = 2, cells: Int = 8,
      iters: Int = 2): DataFrame = {
    val queries = Tables.embeddings(s, dir)
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    ivfSearchAssigned(queries, trainedCentroids(s, dir, cells, iters),
      liveIvfIndex(s, indexDir), k, nprobe)
  }

  /** Embedding-cosine near-dup view: each vector flagged against its best
    * LSH-bucket neighbor at a duplicate threshold.
    */
  def embeddingNearDup(s: SparkSession, dir: String,
      threshold: Double = 0.95): DataFrame =
    lshNearestInBucket(s, dir)
      .withColumn("is_dup", coalesce(col("nn_cos") >= threshold, lit(false)))

  /** LSH-bucketed approximate nearest neighbor: vectors sharing a
    * signature bucket are candidates; exact cosine reranks within the
    * bucket; emit each vector's best in-bucket neighbor. At scale this is
    * a self-equi-join on the bucket key (shuffle on signature) instead of
    * the O(n²) cross join — the standard ANN trade: recall bounded by
    * bucket collisions, cost bounded by bucket sizes. Buckets larger than
    * `maxBucket` are dropped whole (mirrored in the oracle SQL): an
    * oversized signature bucket means the planes don't separate that
    * region (e.g. a degenerate all-similar corpus), and pairing inside it
    * would be quadratic, not informative.
    */
  def lshNearestInBucket(s: SparkSession, dir: String,
      nPlanes: Int = DefaultNPlanes, maxBucket: Int = 50): DataFrame = {
    val ps = planes(nPlanes, DefaultDim)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        lshSignature(col("embedding"), ps).as("bucket"))
    val okBuckets = emb.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      .select(col("bucket"))
    val pruned = emb.join(okBuckets, Seq("bucket"))
    val right = pruned.select(col("vec_id").as("nb_id"),
      col("embedding").as("nb_emb"), col("bucket"))
    val pairs = pruned.join(right, Seq("bucket"))
      .where(col("vec_id") =!= col("nb_id"))
      .select(col("vec_id"), col("nb_id"),
        round(cosine(col("embedding"), col("nb_emb")), 6).as("cos_sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("nb_id").asc)
    val best = pairs.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("vec_id"), col("nb_id").as("nn_id"), col("cos_sim").as("nn_cos"))
    // left join keeps lone-bucket vectors (rows>0 invariant for the gate)
    emb.select(col("vec_id"), col("bucket"))
      .join(best, Seq("vec_id"), "left_outer")
  }

  /** Maximum-inner-product search (MIPS) through the norm-augmentation
    * reduction (Bachrach et al., RecSys'14): retrieval scores like
    * user·item are inner products, NOT cosines — a long vector can beat
    * a well-aligned short one — so cosine machinery can't be pointed at
    * them directly. Augment each database vector with one extra
    * coordinate sqrt(M² − ‖x‖²) (M = max corpus norm): every augmented
    * vector then has IDENTICAL norm M, a query probes as [q, 0] (its dot
    * with x̂ is exactly q·x), and cosine order on the augmented space IS
    * inner-product order on the original — the existing random-
    * hyperplane LSH becomes a MIPS index unchanged, on dim+1 planes.
    *
    * Shape: one 1-row max aggregate (broadcast via crossJoin) for M²;
    * signatures via the codegen'd LshSignature over the augmented float
    * array; buckets capped like [[lshNearestInBucket]] (a degenerate
    * bucket is dropped, not exploded quadratically); queries join their
    * bucket only, exact dot rerank inside, WindowGroupLimit top-k. The
    * corpus shuffles once on the bucket key however large it is.
    *
    * Determinism: ‖x‖² and the rerank dot are sequential per-row folds;
    * the augmented coordinate goes through an explicit FLOAT cast so
    * both engines quantize it identically; dots round to 6 dp before
    * ranking with the (ip desc, id asc) tiebreak.
    */
  /** Signature width for the MIPS index: coarser than the near-dup LSH
    * (6 planes → 64 buckets) because a RETRIEVAL probe wants recall from
    * its single bucket, where the near-dup pass wants tight buckets and
    * pair-count control. At corpus scale this dial (and multi-probe over
    * neighboring signatures) trades scan fraction for recall.
    */
  val MipsNPlanes: Int = 6

  def mipsTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, nPlanes: Int = MipsNPlanes,
      maxBucket: Int = 200): DataFrame =
    mipsTopKFrom(Tables.embeddings(s, dir), nQueries, k, nPlanes, maxBucket)

  /** [[mipsTopK]] over an explicit (vec_id, embedding) frame. `dim` is
    * declared, not probed — the plane set must be fixed at plan time.
    */
  def mipsTopKFrom(emb: DataFrame, nQueries: Int = 5,
      k: Int = 5, nPlanes: Int = MipsNPlanes,
      maxBucket: Int = 200, dim: Int = DefaultDim): DataFrame = {
    val ps = planes(nPlanes, dim + 1)
    val n = emb.withColumn("nsq", dotDouble(col("embedding"), col("embedding")))
    val m2 = n.agg(max(col("nsq")).as("m2"))
    val aug = n.crossJoin(broadcast(m2))
      .select(col("vec_id"), col("embedding"),
        lshSignature(
          concat(col("embedding"),
            array(sqrt(col("m2") - col("nsq")).cast("float"))), ps)
          .as("bucket"))
    val okBuckets = aug.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      .select(col("bucket"))
    val cand = aug.join(okBuckets, Seq("bucket"))
      .select(col("bucket"), col("vec_id"), col("embedding"))
    val q = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        lshSignature(
          concat(col("embedding"), array(lit(0.0f))), ps).as("bucket"))
    val pairs = cand.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dotDouble(col("qe"), col("embedding")), 6).as("ip"))
    val w = Window.partitionBy("qid").orderBy(col("ip").desc, col("vec_id").asc)
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Symmetric per-vector int8 quantization: scale = 127/max|v|, code_i =
    * floor(v_i·scale + 0.5) ∈ [-127, 127] — the standard 4× memory
    * reduction for corpus-scale vector search (the float corpus never
    * needs to be resident; only int8 codes + one scale per vector ride
    * the scan). floor(x + 0.5) rather than round(): half-up on doubles is
    * engine-portable that way, so the oracle replays the codes exactly.
    * Zero vectors quantize to all-zero codes (scale 0).
    *
    * Adds `q8` (codes) and `nq` (integer self-dot) to the frame.
    */
  def withInt8Codes(emb: DataFrame,
      embCol: String = "embedding"): DataFrame =
    emb
      .withColumn("__ma",
        array_max(transform(col(embCol), x => abs(x))).cast("double"))
      .withColumn("__scale",
        when(col("__ma") > 0, lit(127.0) / col("__ma")).otherwise(lit(0.0)))
      .withColumn("q8", transform(col(embCol),
        x => floor(x.cast("double") * col("__scale") + lit(0.5)).cast("int")))
      // integer self-dot: the quantized norm the rerank denominator needs;
      // exact in long (64 dims × 127² ≪ 2^63)
      .withColumn("nq", aggregate(col("q8"), lit(0L),
        (acc, x) => acc + x.cast("long") * x.cast("long")))
      .drop("__ma", "__scale")

  /** Top-k by QUANTIZED cosine: the int8-code dot product over the exact
    * integer norms. All ranking arithmetic is integer-derived (long dot,
    * long norms, one final double division), so the result is
    * bit-reproducible and the oracle replays it value-exactly — no float
    * accumulation order anywhere. Same plan shape as bruteForceTopK:
    * queries broadcast, corpus streams, WindowGroupLimit heap.
    */
  def quantizedTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val q8 = withInt8Codes(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("q8"), col("nq"))
    val queries = q8.select(col("vec_id").as("qid"), col("q8").as("qq8"),
      col("nq").as("qnq")).where(col("qid") < nQueries)
    val scored = q8.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        aggregate(zip_with(col("q8"), col("qq8"),
            (a, b) => a.cast("long") * b.cast("long")),
          lit(0L), (acc, x) => acc + x).as("__dot"),
        col("nq"), col("qnq"))
      .select(col("qid"), col("vec_id"),
        when(col("nq") * col("qnq") > 0,
          round(col("__dot").cast("double")
            / sqrt((col("nq") * col("qnq")).cast("double")), 6))
          .otherwise(lit(0.0)).as("q_cos"))
    val w = Window.partitionBy("qid")
      .orderBy(col("q_cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    * SEMANTIC deduplication by k-means clustering. The corpus is
    * clustered with the persisted trained centroids ([[trainedCentroids]]
    * — the search side never retrains); then WITHIN each cluster a vector
    * is a semantic duplicate when some lower-id cluster-mate sits at
    * cosine >= `threshold`. Keepers are the id-minimal representatives of
    * each within-cluster near-dup neighborhood — exactly the paper's
    * "keep one exemplar per ε-ball, only ever compared inside a cluster".
    *
    * Scale shape: this is the clustered answer to the O(n²) problem —
    * pairwise cosine happens ONLY inside a cell (a self-equi-join on the
    * cell key, shuffle bounded by cell population), and cell population
    * is a DIAL, not a function of corpus size: k grows with the corpus
    * (k ≈ N / targetCellSize — the paper runs 50k clusters for LAION-440M)
    * so per-cell work stays constant while cells parallelize across the
    * cluster. Nothing driver-side but the (k × dim) centroid artifact.
    *
    * Determinism: cell assignment and pair cosines round to 6 dp with
    * the cell-asc / id-asc tiebreaks (same discipline as the IVF path),
    * and the per-vector reduction is MAX over rounded doubles —
    * order-free — so the DuckDB oracle replays training + assignment +
    * flagging value-exactly.
    */
  def semanticDedup(s: SparkSession, dir: String, cells: Int = 8,
      iters: Int = 2, threshold: Double = 0.45): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cent = trainedCentroids(s, dir, cells, iters)
    val assigned = assignCells(emb, cent)
    val mates = assigned.select(col("cell"), col("vec_id").as("lo_id"),
      col("embedding").as("lo_emb"))
    val best = assigned.join(mates, Seq("cell"))
      .where(col("lo_id") < col("vec_id"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("lo_emb")), 6).as("cos_sim"))
      .groupBy(col("vec_id"))
      .agg(max(col("cos_sim")).as("max_lower_cos"))
    assigned.select(col("vec_id"), col("cell"))
      .join(best, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("max_lower_cos"),
        coalesce(col("max_lower_cos") >= threshold, lit(false))
          .as("is_semantic_dup"))
  }

  /** Batch half of INCREMENTAL SemDeDup maintenance — the streaming
    * twin of [[semanticDedup]]: each arriving batch is assigned to the
    * FIXED trained centroids, and each affected doc's "best lower-id
    * in-cell cosine" gets a per-batch PARTIAL MAX appended (new docs
    * score against everything present including the batch; existing
    * docs score against their new lower-id cellmates). MAX is
    * mergeable and every lower-id pair contributes exactly in the
    * batch where its later member arrives, so the report-time fold
    * equals the one-shot flags whatever the batching. O(batch · cell)
    * per batch, ≤ |touched docs| appended rows; batchId markers +
    * [[graft.util.BatchAppend]] give the family's idempotence and
    * crash-safety contracts.
    */
  def appendSemanticIndexBatch(s: SparkSession, indexDir: String,
      batch: DataFrame, dir: String, cells: Int = 8, iters: Int = 2,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    val ba = assignCells(batch.select(col("vec_id"), col("embedding")),
      trainedCentroids(s, dir, cells, iters)).localCheckpoint()
    val membersPath = new org.apache.hadoop.fs.Path(s"$indexDir/members")
    val fs = membersPath.getFileSystem(s.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(membersPath)) s.read.parquet(membersPath.toString)
      else s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], ba.schema)
    def bestOf(hi: DataFrame, lo: DataFrame): DataFrame =
      hi.select(col("cell"), col("vec_id"), col("embedding").as("e_hi"))
        .join(lo.select(col("cell"), col("vec_id").as("lo_id"),
          col("embedding").as("lo_emb")), Seq("cell"))
        .where(col("lo_id") < col("vec_id"))
        .select(col("vec_id"),
          round(cosine(col("e_hi"), col("lo_emb")), 6).as("cs"))
        .groupBy(col("vec_id")).agg(max(col("cs")).as("max_lower_cos"))
    // (existing lo, new hi) and (new lo, new hi) land via the first
    // side; (new lo, existing hi) via the second — each pair exactly once
    val best = bestOf(ba, existing.unionByName(ba))
      .unionAll(bestOf(existing, ba))
    graft.util.BatchAppend.append(best, s"$indexDir/best", batchId)
    graft.util.BatchAppend.append(ba, s"$indexDir/members", batchId)
    marker.foreach { case (fs2, p) =>
      fs2.mkdirs(p.getParent); fs2.create(p, true).close() }
  }

  /** Report half: fold the maintained per-batch partial maxes and emit
    * the same flags — must equal the one-shot [[semanticDedup]] bit for
    * bit (MAX folds exactly; cosines are 6-dp-rounded pre-compare).
    */
  def semanticDedupFromIndex(s: SparkSession, indexDir: String,
      threshold: Double = 0.45): DataFrame = {
    val members = s.read.parquet(s"$indexDir/members")
    val best = s.read.parquet(s"$indexDir/best")
      .groupBy(col("vec_id")).agg(max(col("max_lower_cos")).as("max_lower_cos"))
    members.select(col("vec_id"), col("cell"))
      .join(best, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("max_lower_cos"),
        coalesce(col("max_lower_cos") >= threshold, lit(false))
          .as("is_semantic_dup"))
  }

  // ---------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid — TPAMI 2011, public
  // method): the memory-compression layer under billion-scale ANN.
  // ---------------------------------------------------------------------

  /** Squared L2 distance via three sequential-fold dot products —
    * ‖a−b‖² = a·a − 2·a·b + b·b, the exact expression tree the DuckDB
    * replay mirrors with list_dot_product (left-associated, 6-dp rounded
    * by every caller before any comparison).
    */
  private def l2sq(a: Column, b: Column): Column =
    dotDouble(a, a) - lit(2.0) * dotDouble(a, b) + dotDouble(b, b)

  /** The sub'th of `m` subvectors of a dim-`m·d` embedding (1-based
    * slice, length d).
    */
  private def subvec(c: Column, sub: Int, d: Int): Column =
    slice(c, sub * d + 1, d)

  /** Train the m per-subspace codebooks: each subspace runs its own
    * Lloyd loop — deterministic seeding (the k lowest-id vectors'
    * subvectors), argmin-L2² assignment (6-dp rounding, cell-asc
    * tiebreak), DECIMAL-exact per-dimension means — exactly the
    * spherical trainer's recipe with Euclidean geometry, so every step
    * is bit-reproducible and the oracle replays the whole loop. Output:
    * (sub, cell, centroid[d]). m·k·d floats — bounded however big the
    * corpus; per iteration each subspace scans the corpus once and
    * shuffles only (cell, pos) partial sums.
    */
  def pqCodebooks(s: SparkSession, dir: String, m: Int = 8, k: Int = 8,
      iters: Int = 2, dim: Int = DefaultDim): DataFrame = {
    import s.implicits._
    val d = dim / m
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    // ALL m subspaces train in the same jobs: the subvector fan-out keys
    // every relation by `sub`, so one assignment join + one mean
    // aggregation per iteration trains every codebook at once (the
    // per-subspace math is independent — fusing the passes changes job
    // count, never a value; a subspace-sequential loop measured ~8× the
    // jobs and ~5× the wall time at probe scale)
    val sv = emb.select(col("vec_id"),
      posexplode(array((0 until m).map(i =>
        subvec(col("embedding"), i, d)): _*)).as(Seq("sub", "sv")))
    var cent = sv.where(col("vec_id") < k)
      .select(col("sub"), col("vec_id").cast("int").as("cell"),
        col("sv").as("centroid"))
    for (_ <- 1 to iters) {
      val w = Window.partitionBy("vec_id", "sub")
        .orderBy(col("dist").asc, col("cell").asc)
      val assigned = sv.join(broadcast(cent), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("sv"), col("cell"),
          round(l2sq(col("sv"), col("centroid")), 6).as("dist"))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      cent = assigned
        .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg(sum(col("v").cast("double").cast("decimal(30,15)")).as("sv_sum"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("cell"), col("pos"),
          round(col("sv_sum").cast("double") / col("n"), 6).cast("float")
            .as("c"))
        .groupBy(col("sub"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("centroid"))
      val local = cent.as[(Int, Int, Array[Float])].collect().toSeq
      cent = s.createDataset(local).toDF("sub", "cell", "centroid")
    }
    cent
  }

  /** Scratch-parquet memo of the TRAINED PQ codebooks, keyed by
    * (dir, m, k, iters, dim) — the [[trainedCentroids]] shape for the
    * product-quantization family. Training is a separate job whose
    * output is a persisted artifact (m·k·d floats — bounded whatever the
    * corpus size); searches READ the artifact, they never retrain. At
    * 100 TB the codebook build is a scheduled index job and the ADC
    * search is the serving path.
    */
  private val pqCodebookPaths =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Int, Int), String]()

  def trainedPqCodebooks(s: SparkSession, dir: String, m: Int = 8,
      k: Int = 8, iters: Int = 2, dim: Int = DefaultDim): DataFrame =
    s.read.parquet(trainedPqIndex(s, dir, m, k, iters, dim).resolve("cb").toString)

  /** The full persisted PQ index: trained codebooks (`cb/`) AND the
    * encoded corpus codes (`codes/`: vec_id, sub, cell — m small ints
    * per vector, the 32× compression that keeps a billion-vector index
    * in RAM). Encoding is part of the INDEX BUILD, not the search: at
    * 100 TB the argmin-L2² encode is one corpus scan in the same
    * scheduled job that trains the codebooks, and the serving path only
    * scans the (narrow) codes relation.
    */
  private def trainedPqIndex(s: SparkSession, dir: String, m: Int, k: Int,
      iters: Int, dim: Int): java.nio.file.Path = {
    val p = pqCodebookPaths.computeIfAbsent((dir, m, k, iters, dim), _ => {
      val root = graft.util.Scratch.dir("graft_pq_index")
      val cb = pqCodebooks(s, dir, m, k, iters, dim)
      cb.coalesce(1).write.mode("overwrite")
        .parquet(root.resolve("cb").toString)
      val cbArt = s.read.parquet(root.resolve("cb").toString)
      val d = dim / m
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val sv = emb.select(col("vec_id"),
        posexplode(array((0 until m).map(i =>
          subvec(col("embedding"), i, d)): _*)).as(Seq("sub", "sv")))
      val wEnc = Window.partitionBy("vec_id", "sub")
        .orderBy(col("dist").asc, col("cell").asc)
      sv.join(broadcast(cbArt), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("cell"),
          round(l2sq(col("sv"), col("centroid")), 6).as("dist"))
        .withColumn("rn", row_number().over(wEnc)).where(col("rn") === 1)
        .select(col("vec_id"), col("sub"), col("cell"))
        .write.mode("overwrite").parquet(root.resolve("codes").toString)
      root.toString
    })
    java.nio.file.Paths.get(p)
  }

  /** The encoded corpus from the persisted PQ index. */
  def trainedPqCodes(s: SparkSession, dir: String, m: Int = 8,
      k: Int = 8, iters: Int = 2, dim: Int = DefaultDim): DataFrame =
    s.read.parquet(trainedPqIndex(s, dir, m, k, iters, dim).resolve("codes").toString)

  /** Trained PQ codebooks as oracle-hashable scalar rows
    * (sub, cell, pos, c) — the [[kmeansCellsScalar]] shape. Deliberately
    * TRAINS (calls pqCodebooks directly, not the artifact memo): this is
    * the gate query for the codebook-training job itself, so its benched
    * time must include the per-subspace Lloyd loops — only searches read
    * [[trainedPqCodebooks]].
    */
  def pqCodebooksScalar(s: SparkSession, dir: String, m: Int = 8,
      k: Int = 8, iters: Int = 2, dim: Int = DefaultDim): DataFrame =
    pqCodebooks(s, dir, m, k, iters, dim)
      .select(col("sub").cast("long").as("sub"),
        col("cell").cast("long").as("cell"),
        posexplode(col("centroid")).as(Seq("pos", "c")))
      .select(col("sub"), col("cell"), (col("pos") + 1).cast("long").as("pos"),
        col("c").cast("double").as("c"))

  /** PQ top-k search with asymmetric distance (ADC). Every vector
    * ENCODES as m small codes (here m codebook ids — m bytes at k ≤ 256,
    * a 32× compression of a 64-float vector: the representation that
    * keeps a billion-vector index in RAM); the query stays uncompressed
    * and scores a candidate as Σ_sub ‖q_sub − centroid(code_sub)‖².
    * Every per-subspace distance is 6-dp rounded and the m parts fold in
    * subspace order, so the ranking replays bitwise. Scale shape: the
    * codebooks and the per-query distance table are m·k rows (broadcast;
    * a real deployment precomputes the q×m×k LUT exactly this way);
    * candidates stream through one narrow join + a bounded
    * WindowGroupLimit — and at corpus sizes where even the code table
    * shouldn't fully scan, the IVF cells prune first (IVFADC).
    */
  def pqTopK(s: SparkSession, dir: String, m: Int = 8, k: Int = 8,
      iters: Int = 2, topK: Int = 10, nQueries: Int = 5,
      dim: Int = DefaultDim): DataFrame = {
    val d = dim / m
    // persisted index artifacts (trainedPqIndex): search never pays the
    // m Lloyd loops nor the corpus encode — it reads codebooks + codes
    val cb = trainedPqCodebooks(s, dir, m, k, iters, dim)
    val codes = trainedPqCodes(s, dir, m, k, iters, dim)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id"),
        posexplode(array((0 until m).map(i =>
          subvec(col("embedding"), i, d)): _*)).as(Seq("sub", "sv")))
      .select(col("vec_id").as("qid"), col("sub").as("q_sub"),
        col("sv").as("qv"))
    // each 6-dp part is exact at ×1e6 — summing LONGS is
    // shuffle-order-proof, so the fold is a codegen'd hash aggregate
    // instead of a collect_list + ordered lambda fold
    val parts = codes.join(broadcast(cb), Seq("sub", "cell"))
      .join(broadcast(q), col("sub") === col("q_sub"))
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        floor(round(l2sq(col("qv"), col("centroid")), 6) * 1e6 + 0.5)
          .cast("long").as("pd_micro"))
    val adc = parts.groupBy(col("qid"), col("vec_id"))
      .agg((sum(col("pd_micro")).cast("double") / 1e6).as("adc_dist"))
    val wr = Window.partitionBy("qid")
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
    adc.withColumn("rank", row_number().over(wr)).where(col("rank") <= topK)
      .select(col("qid"), col("vec_id"), col("adc_dist"), col("rank"))
  }

  /** IVFADC — the composition that actually serves billion-vector
    * indexes: IVF cell pruning (probe the nprobe best label cells, so
    * only |probed|/|cells| of the corpus is CANDIDATE) + PQ
    * asymmetric-distance scoring over the persisted codes (so each
    * candidate costs m LUT adds, never a dim-float scan). Both halves
    * are the already-gated machinery — label-cell centroids with
    * DECIMAL-exact means, the trainedPqIndex artifacts, the
    * micro-scaled-long ADC fold — composed without modification, which
    * is why the whole pipeline stays oracle-replayable. Scale shape:
    * centroids, codebooks, and query subvectors broadcast; the only
    * shuffle is candidates⋈codes on vec_id (bucket both by vec_id in a
    * real deployment and it is co-located).
    */
  def ivfPqTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      topK: Int = 10, nprobe: Int = 2, m: Int = 8, k: Int = 8,
      iters: Int = 2, dim: Int = DefaultDim): DataFrame = {
    val d = dim / m
    val emb = Tables.embeddings(s, dir)
    val cb = trainedPqCodebooks(s, dir, m, k, iters, dim)
    val codes = trainedPqCodes(s, dir, m, k, iters, dim)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val probes = ivfProbes(queries, labelCentroids(emb), nprobe)
      .select(col("qid"), col("label"))
    val cand = probes.join(emb.select(col("label"), col("vec_id")), Seq("label"))
      .where(col("vec_id") =!= col("qid"))
    val qsub = queries.select(col("qid"),
      posexplode(array((0 until m).map(i =>
        subvec(col("qe"), i, d)): _*)).as(Seq("sub", "qv")))
    val parts = cand.join(codes, Seq("vec_id"))
      .join(broadcast(cb), Seq("sub", "cell"))
      .join(broadcast(qsub), Seq("qid", "sub"))
      .select(col("qid"), col("label"), col("vec_id"),
        floor(round(l2sq(col("qv"), col("centroid")), 6) * 1e6 + 0.5)
          .cast("long").as("pd_micro"))
    val adc = parts.groupBy(col("qid"), col("label"), col("vec_id"))
      .agg((sum(col("pd_micro")).cast("double") / 1e6).as("adc_dist"))
    val wr = Window.partitionBy("qid")
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
    adc.withColumn("rank", row_number().over(wr)).where(col("rank") <= topK)
      .select(col("qid"), col("label"), col("vec_id"), col("adc_dist"),
        col("rank"))
  }

  /** Recall@k of the IVFADC search against the EXACT-L2 brute-force
    * top-k — the "is the compressed, pruned index any good?" question
    * as a checked query: per query, how many of the true top-k survive
    * both the cell pruning AND the PQ distance distortion. The truth
    * side uses the SAME metric ADC approximates (L2²), so the number
    * measures pure index loss, not a cosine-vs-L2 ranking mismatch.
    * Integer hit counts + one exact rational, so the oracle replays
    * BOTH pipelines and the intersection value-exactly (the
    * dedup_minhash_recall shape for the ANN family).
    */
  /** MATRYOSHKA truncation recall (Kusupati et al. 2022): search with
    * only the first `prefixDim` embedding components (re-normalized by
    * the prefix norms — exactly what cosine over the slice computes)
    * and measure recall@k against the full-dimension exact top-k. MRL
    * embeddings front-load information so a short prefix retrieves
    * almost as well at a fraction of the memory/compute; this gate
    * prices that trade the same way [[ivfPqRecall]] prices IVFADC.
    * Integer hit counts + one exact rational.
    */
  def matryoshkaRecall(s: SparkSession, dir: String, prefixDim: Int = 16,
      nQueries: Int = 5, topK: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    def topIds(scoreOf: (Column, Column) => Column) =
      emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(scoreOf(col("qe"), col("embedding")), 6).as("cos_sim"))
        .withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
        .select(col("qid"), col("vec_id"))
    val trunc = topIds((q, e) =>
      cosine(slice(q, 1, prefixDim), slice(e, 1, prefixDim)))
    val brute = topIds((q, e) => cosine(q, e))
    val hits = trunc.join(brute, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    brute.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
        (coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_true").cast("double")).as("recall"))
  }

  def ivfPqRecall(s: SparkSession, dir: String, nQueries: Int = 5,
      topK: Int = 10): DataFrame = {
    val approx = ivfPqTopK(s, dir, nQueries = nQueries, topK = topK)
      .select(col("qid"), col("vec_id"))
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wB = Window.partitionBy("qid").orderBy(col("dist").asc, col("vec_id").asc)
    val brute = emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(l2sq(col("qe"), col("embedding")), 6).as("dist"))
      .withColumn("rank", row_number().over(wB)).where(col("rank") <= topK)
      .select(col("qid"), col("vec_id"))
    val hits = approx.join(brute, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    brute.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
        (coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_true").cast("double")).as("recall"))
  }

  /** DOMINANT PRINCIPAL COMPONENT of the embedding corpus by POWER
    * ITERATION on an exact-integer covariance digest — the dimension-
    * reduction / "market-mode" primitive next to the quantization
    * ladder (a pipeline projects onto leading components before
    * clustering or visualizes drift along them). Two stages:
    *
    * 1. COVARIANCE DIGEST, exact: embeddings milli-quantized
    *    (x → trunc(double(x)·1000), truncation toward zero on both
    *    engines; PCA directions are invariant to the uniform scale),
    *    then C_jk = n·Σx_j x_k − Σx_j·Σx_k by the moment identity —
    *    every entry an exact long, so centering never subtracts a
    *    float mean. One pass: per-row 64² outer-product structs
    *    explode into a map-side-combinable groupBy (the d²-per-row
    *    accumulation every distributed PCA uses); the digest is d² =
    *    4096 rows whatever the corpus size.
    * 2. POWER ITERATION on the COLLECTED digest (fixed 8 steps,
    *    driver-side — the k-means-centroid discipline: the digest is
    *    d² = 4096 rows bounded by DIMENSION, not corpus, and the
    *    per-step state is one d-vector; running 8 matvecs as Spark
    *    jobs spent ~5 s of pure scheduling on a 4 KB problem): each
    *    w_j folds c_jk·v_k in ascending-k order (the left fold the
    *    oracle's ordered list_reduce replays), then v = w / max|w| —
    *    L∞ normalization is order-free and sqrt-free, and the final
    *    normalizer IS the eigenvalue estimate (for unit-L∞ v,
    *    max|C·v| → λ). The (loadings, λ) artifact is memoized per
    *    source and shared with [[pcaProject]].
    *
    * Output: one row per dimension (dim, loading, lambda_inf).
    * Moment-sum bound: milli-codes ≤ ~2^10, so Σx_j·x_k stays inside
    * BIGINT up to ~2^42 rows; past that, requantize or lift the digest
    * to DECIMAL — the plan shape is unchanged.
    */
  /** Per-source memoized (loadings, lambda) artifact shared by the
    * train gate and the projection — the classifier-weights pattern.
    */
  private val pcaMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Int), (Array[Double], Double)]

  /** The trained component APPLIED back to the corpus — the
    * train→project pair every reduction pipeline ships (scores feed
    * outlier review and drift dashboards; the top-|score| vectors are
    * the corpus's most extreme along its own dominant axis). Loadings
    * are a per-(source) memoized 64-double artifact (the classifier-
    * weights / k-means-centroid discipline); the projection is one
    * narrow map — per vector an index-ordered zip_with fold q·v
    * (ascending-dim order, the same left fold the oracle's ordered
    * list_reduce replays) — and a TakeOrdered top-k by
    * (|score| DESC, vec_id). Nothing shuffles but the top-k.
    */
  def pcaProject(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val loadings = trainPca(s, dir)._1
    val lArr = array(loadings.toIndexedSeq.map(lit): _*)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"),
        x => (x.cast("double") * lit(1000.0)).cast("long")).as("qv"))
      .select(col("vec_id"),
        aggregate(zip_with(col("qv"), lArr, (q, l) => q.cast("double") * l),
          lit(0.0), (a, x) => a + x).as("score"))
      .orderBy(abs(col("score")).desc, col("vec_id").asc)
      .limit(k)
  }

  /** The quantized moment digests of an embedding relation — (j, k,
    * sjk) cross sums (d² rows) and (j, sj, n) per-dim sums (d rows).
    * Shared by the one-shot trainer and the incremental maintenance:
    * every entry is an exact Long SUM, so per-batch partials fold to
    * the one-shot digest whatever the batching.
    */
  private def pcaMoments(emb: DataFrame): (DataFrame, DataFrame) = {
    val base = emb.select(
      transform(col("embedding"),
        x => (x.cast("double") * lit(1000.0)).cast("long")).as("qv"))
    val sums = base.select(posexplode(col("qv")).as(Seq("p", "q")))
      .groupBy((col("p") + 1).as("j"))
      .agg(sum(col("q")).as("sj"), count(lit(1)).as("n"))
    val cross = base.select(explode(flatten(transform(col("qv"), (xj, pj) =>
        transform(col("qv"), (xk, pk) => struct(pj.as("pj"), pk.as("pk"),
          (xj * xk).as("prod")))))).as("e"))
      .groupBy((col("e.pj") + 1).as("j"), (col("e.pk") + 1).as("k"))
      .agg(sum(col("e.prod")).as("sjk"))
    (cross, sums)
  }

  /** Covariance digest from the moment digests (the moment identity
    * C_jk = n·Σx_j x_k − Σx_j·Σx_k — exact longs, centering never
    * subtracts a float mean), collected (d² rows, dimension-bounded)
    * and power-iterated driver-side.
    */
  private def powerFromMoments(cross: DataFrame, sums: DataFrame,
      iters: Int): (Array[Double], Double) = {
    val cov = cross
      .join(broadcast(sums.select(col("j"), col("sj"))), "j")
      .join(broadcast(sums.select(col("j").as("k"), col("sj").as("sk"),
        col("n"))), "k")
      .select(col("j"), col("k"),
        (col("n") * col("sjk") - col("sj") * col("sk")).as("c"),
        col("n"))
      .collect() // d² = 4096 rows — dimension-bounded, never corpus
    val d = 64
    // n·sjk and sj·sk are each bounded by n²·2^20 (milli-codes ≤
    // ~2^10), so the Long covariance digest is exact only below
    // n = 2^21 rows; past that it would wrap SILENTLY and the power
    // iteration would return wrong loadings — fail loudly instead
    // (at that scale requantize the codes or lift the digest to
    // DECIMAL; the plan shape is unchanged).
    cov.headOption.map(_.getLong(3)).foreach(n => require(n < (1L << 21),
      s"trainPca Long covariance digest is exact only below 2^21 rows " +
        s"(got $n); requantize or lift the moment sums to DECIMAL"))
    val c = Array.ofDim[Long](d, d)
    cov.foreach(r => c(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getLong(2))
    var v = Array.fill(d)(1.0)
    var mx = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(j => (0 until d)
        .foldLeft(0.0)((acc, k) => acc + c(j)(k).toDouble * v(k)))
      mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    (v, mx)
  }

  private def trainPca(s: SparkSession, dir: String,
      iters: Int = 8): (Array[Double], Double) =
    pcaMemo.getOrElseUpdate((dir, iters), {
      val (cross, sums) =
        pcaMoments(Tables.embeddings(s, dir).select(col("embedding")))
      powerFromMoments(cross, sums, iters)
    })

  /** Batch half of INCREMENTAL PCA maintenance — the streaming twin the
    * IVF/MinHash/HNSW indexes and the drift monitors already have: each
    * arriving batch of vectors appends its own exact-Long moment
    * partials ((j, k, sjk) cross sums + (j, sj, n) dim sums — both
    * dimension-bounded: ≤ d²+d rows per batch whatever the batch size).
    * Sums are associative integers, so the folded digest equals the
    * one-shot corpus digest whatever the batching; batchId markers make
    * re-delivered micro-batches no-ops, [[graft.util.BatchAppend]]
    * closes the mid-commit double-count window.
    */
  def appendPcaMomentBatch(s: SparkSession, countsDir: String,
      batch: DataFrame, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    val (cross, sums) = pcaMoments(batch.select(col("embedding")))
    graft.util.BatchAppend.append(cross, s"$countsDir/cross", batchId)
    graft.util.BatchAppend.append(sums, s"$countsDir/sums", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half: fold the maintained moment partials and run the same
    * collected-digest power iteration — must equal the one-shot
    * [[pcaPower]] bit for bit (integer sums fold exactly; the driver
    * matvec consumes the identical covariance longs).
    */
  def pcaPowerFromPartials(s: SparkSession, countsDir: String,
      iters: Int = 8): DataFrame = {
    val cross = s.read.parquet(s"$countsDir/cross")
      .groupBy(col("j"), col("k")).agg(sum(col("sjk")).as("sjk"))
    val sums = s.read.parquet(s"$countsDir/sums")
      .groupBy(col("j"))
      .agg(sum(col("sj")).as("sj"), sum(col("n")).as("n"))
    val (v, mx) = powerFromMoments(cross, sums, iters)
    import s.implicits._
    v.toIndexedSeq.zipWithIndex
      .map { case (l, i) => (i + 1L, l, mx) }
      .toDF("dim", "loading", "lambda_inf")
  }

  def pcaPower(s: SparkSession, dir: String, iters: Int = 8): DataFrame = {
    val (v, mx) = trainPca(s, dir, iters)
    import s.implicits._
    v.toIndexedSeq.zipWithIndex
      .map { case (l, i) => (i + 1L, l, mx) }
      .toDF("dim", "loading", "lambda_inf")
  }

  // ───────────────────────── graph-traversal ANN ─────────────────────────

  /** Scratch-parquet memo of the HNSW-style neighbor graph, keyed by
    * (dir, m): the index is a persisted artifact shared by the top-k
    * and recall gates (the trainedCentroids discipline).
    */
  private val hnswEdgePaths =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  /** Bounded-degree navigable graph for beam-search ANN (the
    * HNSW/NSW family — Malkov & Yashunin 2018, arXiv:1603.09320;
    * public method), built flat (one layer) with the long-range hops
    * HNSW gets from upper layers supplied instead by the trained
    * k-means cells: each node links to its m nearest same-cell
    * neighbors (SYMMETRIZED — NSW's undirected links), to its cell's
    * representative (min vec_id), and representatives link to each
    * other (a k²-edge navigable backbone). All similarity comparisons
    * are 6-dp-rounded cosines with vec-id tiebreaks — the repo's
    * portable float-ranking recipe — so the graph is deterministic and
    * a DuckDB oracle rebuilds it edge for edge.
    *
    * Scale shape: in-cell m-NN is the cell-bounded all-pairs every
    * IVF-family operator already pays at index-build time (never
    * corpus² — cells bound the quadratic); the backbone is
    * cells²+|corpus| extra edges; the artifact is O(m·|corpus|) rows,
    * partitioned by src at serving time.
    */
  private def hnswEdges(s: SparkSession, dir: String, m: Int): DataFrame = {
    val path = hnswEdgePaths.computeIfAbsent((dir, m), _ => {
      val p = graft.util.Scratch.dir("graft_hnsw").resolve("edges").toString
      val af = assignCells(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        trainedCentroids(s, dir))
      val a = af.select(col("cell"), col("vec_id").as("src"),
        col("embedding").as("ea"))
      val b = af.select(col("cell"), col("vec_id").as("dst"),
        col("embedding").as("eb"))
      val w = Window.partitionBy("src")
        .orderBy(col("sim").desc, col("dst").asc)
      val nn = a.join(b, Seq("cell"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          round(cosine(col("ea"), col("eb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= m)
        .select(col("src"), col("dst"))
      val sym = nn.unionAll(nn.select(col("dst").as("src"),
        col("src").as("dst")))
      val reps = af.groupBy(col("cell")).agg(min(col("vec_id")).as("rep"))
      val redges = reps.select(col("rep").as("src"))
        .crossJoin(reps.select(col("rep").as("dst")))
        .where(col("src") =!= col("dst"))
      val n2r = af.join(broadcast(reps), Seq("cell"))
        .where(col("vec_id") =!= col("rep"))
        .select(col("vec_id").as("src"), col("rep").as("dst"))
      sym.unionAll(redges).unionAll(n2r).distinct()
        .write.parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Every (qid, vec_id, sim) the beam search SCORES in `hops` rounds
    * over [[hnswEdges]] — the visited set the top-k and recall gates
    * rank. Deterministic end to end: the beam starts at the cell
    * representatives, each round expands the beam's out-edges, scores
    * candidates by 6-dp cosine (self excluded), and keeps the `beam`
    * best under (sim DESC, vec_id ASC); a FIXED hop budget is what
    * lets the oracle unroll the search as chained CTEs. Serving shape:
    * the frontier is (queries × beam) rows — it broadcasts against the
    * src-keyed edge table; the corpus is touched only to score visited
    * candidates.
    */
  private def hnswVisited(s: SparkSession, dir: String, nQueries: Int,
      mLinks: Int, beamWidth: Int, hops: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val edges = hnswEdges(s, dir, mLinks)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val af = assignCells(emb, trainedCentroids(s, dir))
    val rep0 = af.groupBy(col("cell")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    hnswBeamVisited(queries, emb, edges, rep0, beamWidth, hops)
  }

  /** The beam-search core, abstracted over WHERE the graph comes from —
    * the one-shot build ([[hnswVisited]]) and the maintained streaming
    * index ([[hnswTopKFromIndex]]) walk the identical search.
    */
  private def hnswBeamVisited(queries: DataFrame, emb: DataFrame,
      edges: DataFrame, rep0: DataFrame, beamWidth: Int,
      hops: Int, excludeSelf: Boolean = true): DataFrame = {
    val bw = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    // the frontier/candidate relations are serving-bounded (queries ×
    // beam), so they are ALWAYS the broadcast side — the corpus-sized
    // edge and embedding tables stream past them, never the reverse.
    // Join order keeps the broadcasts NARROW: the (qid, vec_id) candidate
    // pairs attach to the streamed corpus first, and the query vectors
    // join on qid after — broadcasting (queries ⋈ cand) instead would
    // ship every candidate row widened by its 64-float query vector
    // (measured ~45 MB/hop vs ~3 MB at the cross-modal probe count)
    def scored(cand: DataFrame): DataFrame = {
      val joined = broadcast(cand)
        .join(emb, Seq("vec_id"))
        .join(broadcast(queries), Seq("qid"))
      // cross-modal callers keep self-matches: qids live in a different
      // id space from vec_ids, so a numeric collision is not "self"
      (if (excludeSelf) joined.where(col("vec_id") =!= col("qid")) else joined)
        .select(col("qid"), col("vec_id"),
          round(cosine(col("qe"), col("embedding")), 6).as("sim"))
    }
    // each hop's BEAM is checkpointed (it is referenced twice — as the
    // next hop's seed and inside its own expansion — and the iterative
    // lazy plan would otherwise double per hop); the visited union
    // keeps its lineage, so the serving plan shows the per-hop
    // broadcast joins it actually runs (pinned in NewOpPlanSpec)
    var beam = queries.select(col("qid")).crossJoin(broadcast(rep0))
      .select(col("qid"), col("vec_id"))
    var visited: DataFrame = null
    for (_ <- 1 to hops) {
      val cand = beam.unionAll(
          broadcast(beam).join(edges, col("vec_id") === col("src"))
            .select(col("qid"), col("dst").as("vec_id")))
        .distinct()
      val sc = scored(cand)
      visited = if (visited == null) sc else visited.unionAll(sc)
      beam = sc.withColumn("rn", row_number().over(bw))
        .where(col("rn") <= beamWidth)
        .select(col("qid"), col("vec_id"))
        .localCheckpoint()
    }
    visited.distinct()
  }

  /** Beam-search ANN top-k over the navigable graph — the missing ANN
    * family member next to IVF / PQ / LSH / binary: queries never scan
    * the corpus, they walk it. Output mirrors the IVF gate:
    * (qid, vec_id, cos_sim, rank).
    */
  def hnswTopK(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, mLinks: Int = 4, beamWidth: Int = 10,
      hops: Int = 3): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    hnswVisited(s, dir, nQueries, mLinks, beamWidth, hops)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("sim").as("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Beam-search top-k over the one-shot navigable graph for an
    * ARBITRARY query frame (qid, qe) — the cross-modal serving entry:
    * encoder probes from another modality walk the text corpus's graph
    * instead of scanning it. Self-exclusion is OFF by default here
    * because foreign qids live in a different id space from vec_ids.
    */
  def hnswTopKForQueries(s: SparkSession, dir: String, queries: DataFrame,
      k: Int = 3, mLinks: Int = 4, beamWidth: Int = 10, hops: Int = 3,
      excludeSelf: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val edges = hnswEdges(s, dir, mLinks)
    val af = assignCells(emb, trainedCentroids(s, dir))
    val rep0 = af.groupBy(col("cell")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    hnswBeamVisited(queries, emb, edges, rep0, beamWidth, hops, excludeSelf)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("sim").as("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Recall@k of the beam search against the exact cosine brute-force
    * top-k — the same anchor the IVF/PQ/binary recall gates rank
    * against, so the families are directly comparable.
    */
  def hnswRecall(s: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, mLinks: Int = 4, beamWidth: Int = 10,
      hops: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    val brute = queries.join(emb)
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    val approx = hnswTopK(s, dir, nQueries, k, mLinks, beamWidth, hops)
      .select(col("qid"), col("vec_id"))
    val hits = approx.join(brute, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    brute.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_true"),
        (coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_true").cast("double")).as("recall"))
  }

  /** Batch half of INCREMENTAL NAVIGABLE-GRAPH (HNSW) maintenance — the
    * streaming twin the IVF and MinHash indexes already have: each
    * arriving batch of vectors is assigned to the FIXED trained
    * centroids, its in-cell neighbor CANDIDATES are computed against
    * the members indexed so far (both directions, each side capped at
    * its top-`mLinks` under the build's (sim DESC, dst ASC) order), and
    * the candidates + memberships are appended — O(batch · cell) per
    * batch, never a graph rebuild. The per-src top-m is a MERGEABLE
    * partial: once a dst falls out of a src's top-m it can never
    * re-enter (sims are immutable), and any dst in the FINAL top-m
    * ranks ≤ m inside the batch that introduced the pair — so the
    * report-time fold over the appended candidates equals the one-shot
    * [[hnswEdges]] m-NN bit for bit, whatever the batching. batchId
    * markers make re-delivered micro-batches no-ops; [[BatchAppend]]
    * keeps a crash mid-append from double-counting.
    */
  def appendHnswIndexBatch(s: SparkSession, indexDir: String,
      batch: DataFrame, dir: String, cells: Int = 8, iters: Int = 2,
      mLinks: Int = 4, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    val ba = assignCells(batch.select(col("vec_id"), col("embedding")),
      trainedCentroids(s, dir, cells, iters)).localCheckpoint()
    val membersPath = new org.apache.hadoop.fs.Path(s"$indexDir/members")
    val fs = membersPath.getFileSystem(s.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(membersPath)) s.read.parquet(membersPath.toString)
      else s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], ba.schema)
    val w = Window.partitionBy("src").orderBy(col("sim").desc, col("dst").asc)
    def topM(srcSide: DataFrame, dstSide: DataFrame): DataFrame =
      srcSide.select(col("cell"), col("vec_id").as("src"),
          col("embedding").as("ea"))
        .join(dstSide.select(col("cell"), col("vec_id").as("dst"),
          col("embedding").as("eb")), Seq("cell"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          round(cosine(col("ea"), col("eb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= mLinks)
        .select(col("src"), col("dst"), col("sim"))
    // new-node side: top-m among everything present INCLUDING the batch;
    // existing side: top-m among the batch alone (a batch can push at
    // most m new entries into any existing node's neighbor list)
    val cand = topM(ba, existing.unionByName(ba)).unionAll(topM(existing, ba))
    graft.util.BatchAppend.append(cand, s"$indexDir/nncand", batchId)
    graft.util.BatchAppend.append(ba, s"$indexDir/members", batchId)
    marker.foreach { case (fs2, p) =>
      fs2.mkdirs(p.getParent); fs2.create(p, true).close() }
  }

  /** Report half: fold the maintained candidate digest into the SAME
    * navigable graph the one-shot [[hnswEdges]] builds — re-rank the
    * appended per-src candidates (distinct first: sims are a pure
    * function of the pair, so duplicates collapse exactly), keep m,
    * symmetrize, and derive the cell-representative backbone from the
    * maintained membership table.
    */
  private def hnswEdgesFromIndex(s: SparkSession, indexDir: String,
      mLinks: Int): DataFrame = {
    val members = s.read.parquet(s"$indexDir/members")
    val cand = s.read.parquet(s"$indexDir/nncand")
      .select(col("src"), col("dst"), col("sim")).distinct()
    val w = Window.partitionBy("src").orderBy(col("sim").desc, col("dst").asc)
    val nn = cand.withColumn("rn", row_number().over(w))
      .where(col("rn") <= mLinks).select(col("src"), col("dst"))
    val sym = nn.unionAll(nn.select(col("dst").as("src"), col("src").as("dst")))
    val reps = members.groupBy(col("cell")).agg(min(col("vec_id")).as("rep"))
    val redges = reps.select(col("rep").as("src"))
      .crossJoin(reps.select(col("rep").as("dst")))
      .where(col("src") =!= col("dst"))
    val n2r = members.join(broadcast(reps), Seq("cell"))
      .where(col("vec_id") =!= col("rep"))
      .select(col("vec_id").as("src"), col("rep").as("dst"))
    sym.unionAll(redges).unionAll(n2r).distinct()
  }

  /** Search half: the identical beam search as [[hnswTopK]], but walked
    * over the MAINTAINED graph — entry points, edges, and scoring
    * embeddings all come from the index artifact, so the gate proves
    * the maintained index alone answers queries. Must return the
    * one-shot hnswTopK answer bit for bit (the gate reuses the
    * sim_hnsw_topk oracle verbatim).
    */
  def hnswTopKFromIndex(s: SparkSession, indexDir: String, dir: String,
      nQueries: Int = 5, k: Int = 5, mLinks: Int = 4, beamWidth: Int = 10,
      hops: Int = 3, tombstonesDir: Option[String] = None): DataFrame = {
    val members = s.read.parquet(s"$indexDir/members")
    val emb = members.select(col("vec_id"), col("embedding"))
    val queries = Tables.embeddings(s, dir).where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val rep0 = members.groupBy(col("cell")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    // the folded graph is walked `hops` times — freeze it once, the
    // same cost shape as the one-shot build's scratch-parquet artifact
    val edges = hnswEdgesFromIndex(s, indexDir, mLinks).localCheckpoint()
    val visited = hnswBeamVisited(queries, emb, edges, rep0, beamWidth, hops)
    // SOFT DELETES (the documented HNSW practice — Malkov & Yashunin's
    // graphs keep deleted nodes as routing waypoints; repairing every
    // in-edge would be a corpus-sized rewrite): tombstoned ids still
    // ROUTE (the walk and the graph are untouched — O(batch) deletes,
    // never a rebuild) but are filtered from RESULTS before ranking.
    // tombstones default to living inside the index; a caller sharing
    // one ingested index across consumers passes its own tombstone dir
    // so the shared artifact is never mutated
    val tombPath = new org.apache.hadoop.fs.Path(
      tombstonesDir.getOrElse(s"$indexDir/tombstones"))
    val fs = tombPath.getFileSystem(s.sessionState.newHadoopConf())
    val live =
      if (!fs.exists(tombPath)) visited
      else visited.join(
        s.read.parquet(tombPath.toString).select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    live.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("sim").as("cos_sim"),
        col("rank").cast("long").as("rank"))
  }
}
