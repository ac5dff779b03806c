package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal columns for a training-data pipeline: media payloads travel
  * as opaque `binary` columns with typed metadata alongside; decode /
  * feature-extract runs batched per partition so a real decoder would
  * amortize model/codec initialization per task, not per record.
  *
  * The decode step itself is a STUB (this container ships no image/audio
  * codecs): `stubDecode` derives deterministic fake dimensions/features
  * from the bytes. Everything around it — schema, encoders, partition
  * batching, the DataFrame plumbing — is real and tested, so swapping in
  * an actual codec is a one-function change.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, kind: String, bytes: Array[Byte])

  final case class MediaMeta(doc_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, frames: Int, feature: Array[Float])

  /** Stand-in media table: UTF-8 payloads derived from `documents.text`
    * (deterministic; at production scale this column is real image/audio
    * bytes read from parquet/blob storage).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake of a codec's output, pure in the
    * payload bytes. Replace with the real decode when codecs exist.
    */
  def stubDecode(r: MediaRecord): MediaMeta = {
    val len = r.bytes.length
    val feature = Array.tabulate(8) { i =>
      // cheap rolling hash over the payload, per feature slot
      var h = 1125899906842597L + i
      var j = i
      while (j < len) { h = 31 * h + (r.bytes(j) & 0xFF); j += 8 }
      ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
    MediaMeta(r.doc_id, r.kind, len,
      width = 64 + len % 192,
      height = 64 + (len / 3) % 192,
      frames = if (r.kind == "video") 1 + len % 8 else 1,
      feature)
  }

  /** Batched per-partition decode: the `grouped(batchSize)` shape is where
    * a vectorized decoder (or an inference runtime) would consume whole
    * batches; keep it even though the stub maps element-wise.
    */
  def decodeMeta(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => batch.map(stubDecode))
    }
  }

  /** Metadata projection of the decode, minus the feature vector — the
    * part of the stub whose arithmetic is SQL-expressible, so the oracle
    * can check the whole pipeline shape end-to-end.
    */
  def metaTable(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(mediaFromDocuments(spark, dir))
      .toDF()
      .select(col("doc_id"), col("kind"), col("byte_len"),
        col("width"), col("height"), col("frames"))

  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_off: Int,
      frame_len: Int, frame_hash: Long)

  /** Deterministic FRAME SAMPLING over the video payloads: the stub
    * codec's frame count (1 + len % 8) partitions the payload into
    * equal byte windows (stride = len / frames, short tail dropped with
    * the last partial window — a real demuxer has true frame boundaries
    * here), and every `every`-th frame is kept and fingerprinted with
    * the wrapping 31·h+b fold over its window. This is the
    * sample-then-decode shape of video curation: frame selection happens
    * on the OPAQUE payload before any expensive decode, so the decoder
    * downstream touches `1/every` of the frames.
    *
    * Pure narrow flatMap — fan-out is per-record, no shuffle at any
    * corpus size. The oracle replays the window arithmetic and the
    * mod-2^64 fold byte-for-byte from the hex payload.
    */
  def frameSamples(spark: SparkSession, dir: String, every: Int = 2): DataFrame =
    frameSamplesOf(mediaFromDocuments(spark, dir), every)

  /** [[frameSamples]] over an explicit media relation — the same pure
    * narrow flatMap, reused by the corpus with derived re-encodes.
    */
  def frameSamplesOf(media: Dataset[MediaRecord], every: Int): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter((r: MediaRecord) => r.kind == "video")
      .flatMap { r =>
        val len = r.bytes.length
        val frames = 1 + len % 8
        val stride = len / frames
        (0 until frames by every).iterator.map { i =>
          val off = i * stride
          val end = math.min(off + stride, len)
          var h = 1125899906842597L
          var j = off
          while (j < end) { h = 31 * h + (r.bytes(j) & 0xFF); j += 1 }
          FrameSample(r.doc_id, i, off, end - off, h)
        }
      }.toDF()
  }

  /** Doc-id offset under which [[videoCorpus]] files its derived
    * re-encoded copies — far above any synthetic corpus id.
    */
  val VideoDerivedOffset = 1000000000L

  /** Video corpus WITH derived payloads: the video-kind records plus,
    * for every even video with at least 3 stub frames, a deterministic
    * RE-ENCODED copy under `doc_id + VideoDerivedOffset` — same length
    * (so the stub demuxer's equal-stride frame grid aligns, the
    * re-encode model: same cut, different encoder), with the bytes of
    * frame 0 perturbed `(b+1) mod 256` (localized encoder artifacts).
    * At production scale re-uploads and re-encodes exist naturally in
    * the corpus; the synthetic documents table has none at the frame
    * grid's byte alignment, so the corpus generator stands in for
    * them — the same role [[mediaFromDocuments]] plays for the
    * payloads themselves. Narrow map, no shuffle.
    */
  def videoCorpus(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val base = mediaFromDocuments(spark, dir)
      .filter((r: MediaRecord) => r.kind == "video")
    val derived = base
      .filter((r: MediaRecord) =>
        r.doc_id % 6 == 2 && r.bytes.length % 8 >= 2)
      .map { r =>
        val len = r.bytes.length
        val stride = len / (1 + len % 8)
        val out = r.bytes.clone()
        var j = 0
        while (j < stride) { out(j) = ((out(j) + 1) & 0xFF).toByte; j += 1 }
        MediaRecord(r.doc_id + VideoDerivedOffset, r.kind, out)
      }
    base.union(derived)
  }

  /** NEAR-DUP VIDEO detection by frame-fingerprint overlap: two videos
    * are near-duplicates when their (distinct) frame-hash sets overlap
    * — re-encodes, trims, and concatenations share long frame runs even
    * when the container bytes differ. Candidate pairs form ONLY through
    * the inverted-index join on the frame hash (the blocking key), so
    * no all-pairs step touches the corpus; degenerate hashes shared by
    * more than `maxDocsPerHash` videos are dropped first (the
    * oversize-bucket cap of the LSH family — think black frames).
    * Jaccard is an exact rational of integer counts. This is the video
    * member of the dedup family next to mm_phash_dedup (images) and
    * the text near-dup operators. Runs over [[videoCorpus]], so the
    * derived re-encodes pair with their sources at jaccard
    * (f−1)/(f+1).
    */
  def videoNearDup(spark: SparkSession, dir: String,
      maxDocsPerHash: Int = 100, minShared: Int = 2): DataFrame = {
    val fh = frameSamplesOf(videoCorpus(spark, dir), every = 1)
      .select(col("doc_id"), col("frame_hash")).distinct()
    val capped = fh.join(
      fh.groupBy(col("frame_hash")).agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDocsPerHash).select(col("frame_hash")),
      Seq("frame_hash"))
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    val pairs = capped.select(col("doc_id").as("doc_a"), col("frame_hash"))
      .join(capped.select(col("doc_id").as("doc_b"), col("frame_hash")),
        Seq("frame_hash"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_frames").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_frames").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared").cast("double")
          / (col("na") + col("nb") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** Payload DEDUP CLUSTERS: weakly-connected components of the CDC
    * near-dup pair graph at a Jaccard threshold — the decision layer a
    * dedup store runs on the pair evidence ([[cdcNearDup]]), via the
    * same generic hash-min machinery as the text near-dup clusters.
    */
  def cdcClusters(spark: SparkSession, dir: String,
      minJaccard: Double = 0.5): DataFrame = {
    val pairs = cdcNearDup(spark, dir)
      .where(col("jaccard") >= minJaccard)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = graft.operators.ConnectedComponents.labelPropagation(pairs)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  final case class CdcChunk(doc_id: Long, kind: String, chunk_idx: Int,
      chunk_off: Int, chunk_len: Int, chunk_hash: Long)

  /** CONTENT-DEFINED CHUNKING over the opaque payloads — the
    * rsync/LBFS/backup-dedup primitive: a boundary falls wherever the
    * rolling window hash of the LAST `window` bytes hits 0 mod
    * `divisor`, so boundaries depend only on local content and RESYNC
    * after any insertion or deletion (fixed-stride framing never
    * recovers from a one-byte shift). Chunks are fingerprinted with the
    * wrapping 31·h+b fold. The window hash here is the additive byte
    * sum — it has the resync property that makes CDC work and replays
    * as prefix-sum arithmetic in the oracle; a production deployment
    * swaps in a gear/Rabin hash for boundary uniformity, changing no
    * plan shape. Pure narrow flatMap, no shuffle at any corpus size;
    * empty payloads emit nothing.
    */
  /** The pure per-payload segmentation: (chunk_idx, off, len, hash)
    * tuples. Exposed for the spec's resync/reconstruction pins.
    */
  private[graft] def cdcSegments(bytes: Array[Byte], window: Int,
      divisor: Int): Iterator[(Int, Int, Int, Long)] = {
    val len = bytes.length
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var wsum = 0
    var i = 0
    while (i < len) {
      wsum += bytes(i) & 0xFF
      if (i >= window) wsum -= bytes(i - window) & 0xFF
      if (i >= window - 1 && wsum % divisor == 0) cuts += (i + 1)
      i += 1
    }
    if (cuts.isEmpty || cuts.last != len) cuts += len
    var start = 0
    cuts.iterator.zipWithIndex.map { case (end, idx) =>
      var h = 1125899906842597L
      var j = start
      while (j < end) { h = 31 * h + (bytes(j) & 0xFF); j += 1 }
      val c = (idx, start, end - start, h)
      start = end
      c
    }
  }

  def cdcChunks(spark: SparkSession, dir: String, window: Int = 16,
      divisor: Int = 64): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter((r: MediaRecord) => r.bytes.nonEmpty)
      .flatMap { r =>
        cdcSegments(r.bytes, window, divisor).map { case (idx, off, l, h) =>
          CdcChunk(r.doc_id, r.kind, idx, off, l, h)
        }
      }.toDF()
  }

  /** NEAR-DUP PAYLOAD detection over the CDC chunks: two payloads are
    * near-duplicates when their (distinct) chunk-fingerprint sets
    * overlap — because boundaries are content-defined, re-encodes with
    * local edits still share the chunks around the edit. Candidate
    * pairs form ONLY through the inverted-index join on the chunk hash
    * (the blocking key); degenerate fingerprints shared by more than
    * `maxDocsPerHash` payloads are dropped first (the oversize-bucket
    * cap of the LSH family). Jaccard is an exact rational of integer
    * counts. The payload member of the dedup family, next to
    * [[videoNearDup]] (frame grid) and mm_phash_dedup (images).
    */
  def cdcNearDup(spark: SparkSession, dir: String,
      maxDocsPerHash: Int = 100, minShared: Int = 2): DataFrame = {
    val ch = cdcChunks(spark, dir)
      .select(col("doc_id"), col("chunk_hash")).distinct()
    val capped = ch.join(
      ch.groupBy(col("chunk_hash")).agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDocsPerHash).select(col("chunk_hash")),
      Seq("chunk_hash"))
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    val pairs = capped.select(col("doc_id").as("doc_a"), col("chunk_hash"))
      .join(capped.select(col("doc_id").as("doc_b"), col("chunk_hash")),
        Seq("chunk_hash"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_chunks").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_chunks").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared").cast("double")
          / (col("na") + col("nb") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** CDC STORAGE-SAVINGS report — the number a dedup store quotes: of
    * all payload bytes, how many survive as unique chunks (first copy
    * kept, every repeat free). One row: total bytes, unique-chunk
    * bytes, stored/total ratio and the dedup factor. Exact integers +
    * two exact rationals; a chunk is "the same" when (hash, len) match
    * — the (hash, len) pair is the dedup-store key, so colliding hashes
    * of different lengths never merge. Scale shape: one
    * map-side-combinable distinct over the chunk relation, then a
    * digest-sized aggregate.
    */
  def cdcSavings(spark: SparkSession, dir: String): DataFrame = {
    val ch = cdcChunks(spark, dir)
    val total = ch.agg(sum(col("chunk_len").cast("long")).as("total_bytes"))
    val unique = ch.select(col("chunk_hash"), col("chunk_len")).distinct()
      .agg(sum(col("chunk_len").cast("long")).as("stored_bytes"),
        count(lit(1)).as("n_unique_chunks"))
    total.crossJoin(unique)
      .select(col("total_bytes"), col("stored_bytes"), col("n_unique_chunks"),
        (col("stored_bytes").cast("double") / col("total_bytes").cast("double"))
          .as("stored_ratio"),
        (col("total_bytes").cast("double") / col("stored_bytes").cast("double"))
          .as("dedup_factor"))
  }

  final case class SceneCut(doc_id: Long, frame_idx: Int,
      frame_sum: Long, delta: Long, is_cut: Boolean)

  /** SCENE-CUT detection over the stub-decoded frame grid: consecutive
    * frames whose intensity mass jumps are segment boundaries — the
    * shot-boundary pass a video-curation pipeline runs before sampling
    * one keyframe per shot (frame-difference thresholding, the classic
    * first-order detector). The stub codec's equal-stride windows stand
    * in for real frames; intensity mass per frame is the exact byte sum
    * (windows are all exactly `stride` long — frames·stride ≤ len — so
    * raw sums compare without normalization), and a cut fires when
    * |ΔS| > stride·threshold, i.e. mean absolute change above
    * `threshold` gray levels. Pure integer arithmetic; single-frame
    * videos emit nothing (no deltas exist).
    *
    * Narrow per-record flatMap like the other stub decoders — the
    * frame-difference signal never leaves the record, so there is no
    * shuffle at any corpus size; segment assembly downstream is a
    * gaps-and-islands window over the cut flags.
    */
  def sceneCuts(spark: SparkSession, dir: String,
      threshold: Int = 16): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter((r: MediaRecord) => r.kind == "video")
      .flatMap { r =>
        val len = r.bytes.length
        val frames = 1 + len % 8
        val stride = len / frames
        val sums = Array.tabulate(frames) { i =>
          var h = 0L
          var j = i * stride
          val end = j + stride
          while (j < end) { h += (r.bytes(j) & 0xFF); j += 1 }
          h
        }
        (1 until frames).iterator.map { i =>
          val d = math.abs(sums(i) - sums(i - 1))
          SceneCut(r.doc_id, i, sums(i), d, d > stride.toLong * threshold)
        }
      }.toDF()
  }

  /** KEYFRAME SELECTION per shot — the sampling decision the scene-cut
    * pass exists to feed: shots are the gaps-and-islands over the cut
    * flags (a cut frame STARTS a new shot; shot_id is the running cut
    * count), and each shot's keyframe is its max-intensity frame
    * (exact byte-sum argmax, frame_idx-asc tiebreak — a stand-in for
    * the sharpness/face heuristics a real sampler scores with). The
    * downstream decoder then touches ONE frame per shot instead of the
    * grid. All-relational over the [[sceneCuts]] rows: two window
    * passes on the same (doc, frame) sort — one shuffle on doc_id —
    * then the rn=1 filter; the argmax uses a descending row_number,
    * never a composite-key arg_max (engines disagree on those).
    */
  def videoKeyframes(spark: SparkSession, dir: String,
      threshold: Int = 16): DataFrame = {
    val sc = sceneCuts(spark, dir, threshold)
    val seqW = Window.partitionBy("doc_id").orderBy("frame_idx")
    val shots = sc.withColumn("shot_id",
      sum(when(col("is_cut"), 1L).otherwise(0L)).over(seqW))
    val shotW = Window.partitionBy("doc_id", "shot_id")
    val rankW = shotW.orderBy(col("frame_sum").desc, col("frame_idx").asc)
    shots
      .withColumn("rn", row_number().over(rankW))
      .withColumn("n_frames", count(lit(1)).over(shotW))
      .withColumn("shot_start", min(col("frame_idx")).over(shotW))
      .withColumn("shot_end", max(col("frame_idx")).over(shotW))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("shot_id"),
        col("frame_idx").as("keyframe_idx"),
        col("frame_sum").as("key_sum"),
        col("n_frames"), col("shot_start"), col("shot_end"))
  }

  final case class AudioWindow(doc_id: Long, win_idx: Int, win_off: Int,
      energy: Long, peak: Int)

  /** Audio windowing over the OPAQUE payload (the audio analog of
    * [[frameSamples]]): the stub codec treats the bytes as 8-bit PCM
    * mono and cuts non-overlapping `windowBytes` windows (short tail
    * dropped — a real resampler pads or drops the same way); per window
    * it computes the exact-integer signal stats a silence/clipping
    * filter needs BEFORE any decode: energy = Σ(b−128)² and peak
    * amplitude = max |b−128|. Integer arithmetic only (max window energy
    * 200·128² ≈ 3.3e6 — fits BIGINT with no wrapping), so the DuckDB
    * oracle replays it exactly from the hex payload.
    *
    * Pure narrow flatMap — per-record fan-out, no shuffle at any corpus
    * size; window selection (e.g. top-energy segments for a speech
    * model) then rides normal relational operators downstream.
    */
  def audioWindows(spark: SparkSession, dir: String,
      windowBytes: Int = 200): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter((r: MediaRecord) => r.kind == "audio")
      .flatMap { r =>
        val len = r.bytes.length
        (0 until len / windowBytes).iterator.map { i =>
          val off = i * windowBytes
          var energy = 0L
          var peak = 0
          var j = off
          while (j < off + windowBytes) {
            val c = (r.bytes(j) & 0xFF) - 128
            energy += c.toLong * c
            val a = math.abs(c)
            if (a > peak) peak = a
            j += 1
          }
          AudioWindow(r.doc_id, i, off, energy, peak)
        }
      }.toDF()
  }

  /** AUDIO LANDMARK FINGERPRINTS (the constellation-hash scheme of
    * Shazam, Wang 2003): energy peaks of the window series are anchor
    * points; each anchor pairs with its next `fanout` peaks within
    * `maxDt` windows, and the (quantized-anchor, quantized-target,
    * time-delta) triple packs into one integer hash. Landmarks are
    * CONTENT-LOCAL — a clipped or concatenated copy keeps most of its
    * peak constellation, which is what makes the scheme robust where
    * fixed framing is not. The stub "spectrum" is the byte-window
    * energy series ([[audioWindows]]); a real frontend would feed FFT
    * magnitudes through the identical plumbing.
    *
    * Shape: one window pass for the peak test (shuffle on doc), then a
    * per-doc peak self-join bounded by the target zone — peaks per doc
    * are bounded by windows/2, so nothing is quadratic in the corpus.
    * All arithmetic is exact integers.
    */
  def audioFingerprints(spark: SparkSession, dir: String,
      windowBytes: Int = 16, maxDt: Int = 32, fanout: Int = 3): DataFrame = {
    // a fine 16-byte frame (vs the 200-byte analysis window) — the
    // payloads are short, and a constellation needs tens of frames
    val en = audioWindows(spark, dir, windowBytes)
      .select(col("doc_id"), col("win_idx").as("t"), col("energy"))
    val w = Window.partitionBy("doc_id").orderBy("t")
    val peaks = en
      .select(col("doc_id"), col("t"), col("energy"),
        coalesce(lag(col("energy"), 1).over(w), lit(-1L)).as("pe"),
        coalesce(lead(col("energy"), 1).over(w), lit(-1L)).as("ne"))
      .where(col("energy") > col("pe") && col("energy") >= col("ne"))
      .select(col("doc_id"), col("t"), col("energy"))
    val rw = Window.partitionBy("doc_id", "t1").orderBy("t2")
    peaks.select(col("doc_id"), col("t").as("t1"), col("energy").as("e1"))
      .join(peaks.select(col("doc_id"), col("t").as("t2"),
        col("energy").as("e2")), Seq("doc_id"))
      .where(col("t2") > col("t1") && col("t2") <= col("t1") + maxDt)
      .withColumn("rk", row_number().over(rw)).where(col("rk") <= fanout)
      .select(col("doc_id"), col("t1"), (col("t2") - col("t1")).as("dt"),
        ((col("e1") % 64) * 65536 + (col("e2") % 64) * 256
          + (col("t2") - col("t1"))).as("h"))
  }

  /** NEAR-DUP AUDIO by landmark overlap: the audio member of the
    * cross-modal dedup family (text shingles, image pHash, video frame
    * sets, payload CDC chunks) — distinct landmark-hash sets paired
    * through the df-capped inverted index, exact-rational Jaccard.
    * Takes the fingerprint relation so any frontend (stub or FFT)
    * plugs in; the synthetic corpus has no aligned audio duplicates,
    * so pair semantics are pinned on a hand fixture (the videoNearDup
    * precedent) while the fingerprint relation itself is the gate.
    */
  def audioNearDup(fingerprints: DataFrame, maxDocsPerHash: Int = 100,
      minShared: Int = 2): DataFrame = {
    val fh = fingerprints.select(col("doc_id"), col("h")).distinct()
    val capped = fh.join(
      fh.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDocsPerHash).select(col("h")),
      Seq("h"))
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_marks"))
    val pairs = capped.select(col("doc_id").as("doc_a"), col("h"))
      .join(capped.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_marks").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_marks").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared").cast("double")
          / (col("na") + col("nb") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** VAD-style SEGMENTATION over the audio windows — the
    * speech/activity extraction stage of an audio training pipeline:
    * a window is VOICED when its energy exceeds the document's own mean
    * (compared by exact integer cross-multiplication, `energy·cnt >
    * Σenergy` — no division, no doubles, bitwise on any engine), and
    * maximal voiced runs merge into segments through the
    * gaps-and-islands window (the sessionize/substring-span recipe).
    * Shape: the per-window digest aggregates once per doc (broadcast
    * back — |docs| rows), islands run on the pair key; the payload
    * bytes are read exactly once, in [[audioWindows]]' narrow flatMap.
    */
  def audioSegments(spark: SparkSession, dir: String,
      windowBytes: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = audioWindows(spark, dir, windowBytes)
    val tot = w.groupBy(col("doc_id"))
      .agg(sum(col("energy")).as("tot"), count(lit(1)).as("cnt"))
    val voiced = w.join(broadcast(tot), Seq("doc_id"))
      .where(col("energy") * col("cnt") > col("tot"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("win_idx"))
    voiced
      .withColumn("grp", col("win_idx") - row_number().over(win))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("win_idx")).cast("long").as("seg_start"),
        max(col("win_idx")).cast("long").as("seg_end"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("seg_energy"),
        max(col("peak")).cast("long").as("seg_peak"))
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("n_windows"), col("seg_energy"), col("seg_peak"))
  }

  /** The FEATURE path surfaced as a query: the batched decode's 8-float
    * vector reduced to a deterministic scalar (sequential-fold sum in
    * double, rounded) — so the machinery the Dataset hop exists for
    * (decode → typed feature vector) actually executes under the gate.
    * Hash-checked: the stub's byte-stride hash loop is pure mod-2^64
    * arithmetic over the UTF-8 bytes, which the DuckDB oracle replays
    * (hex-pair byte extraction + HUGEINT fold — SparkEntry.oracleSql
    * "mm_features"); MultimodalSpec additionally pins exact vectors.
    */
  def featureTable(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(mediaFromDocuments(spark, dir))
      .toDF()
      .select(col("doc_id"), col("kind"),
        round(aggregate(col("feature"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 6).as("feature_sum"))

  /** dHash-style 64-bit PERCEPTUAL hash of an image payload (public
    * method — difference hash over an 8×9 downsampled luma grid). The
    * "decode + downsample" half is the stub codec: grid cell g is the
    * wrapping 31·h+b fold over the payload bytes at stride 72 (a real
    * decoder produces real luma here — same one-function swap as
    * [[stubDecode]]); the dHash half is real: bit (8r+c) is set when
    * grid[9r+c] > grid[9r+c+1] on the unsigned-shifted 53-bit values.
    * Pure integer arithmetic end to end, so the DuckDB oracle replays
    * the hash exactly from the hex payload.
    */
  def phash(bytes: Array[Byte]): Long = {
    val grid = Array.tabulate(72) { g =>
      var h = 1125899906842597L + g
      var j = g
      while (j < bytes.length) { h = 31 * h + (bytes(j) & 0xFF); j += 72 }
      h >>> 11 // < 2^53: exact-integer comparable in any engine
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(9 * r + c) > grid(9 * r + c + 1)) bits |= 1L << (8 * r + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** (doc_id, phash) over the image payloads — narrow per-record map,
    * no shuffle at any corpus size.
    */
  def phashTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter((r: MediaRecord) => r.kind == "image")
      .map(r => (r.doc_id, phash(r.bytes)))
      .toDF("doc_id", "phash")
  }

  /** Perceptual-hash image near-dup: Hamming-distance dedup over the
    * dHash values with BYTE-chunk blocking — the phash splits into 8
    * 8-bit chunks and only images colliding on some (chunk, value)
    * bucket are paired. By pigeonhole a pair within Hamming distance 7
    * keeps at least one byte intact, so candidate recall is EXACT at the
    * default threshold — up to the same `maxBucket` cap as every other
    * blocking family (an oversized bucket means the hash doesn't
    * separate that region; pairing inside it is quadratic cost, not
    * signal — dropped whole, mirrored in the oracle).
    *
    * Scale shape: self-equi-join on the chunk key (shuffle bounded by
    * bucket sizes), bit_count(xor) distance, per-image best neighbor via
    * a bounded window — never O(n²). Every image emits a row.
    */
  def phashNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 7, maxBucket: Int = 50): DataFrame = {
    val ph = phashTable(spark, dir)
    val chunked = ph.select(col("doc_id"),
      posexplode(array((0 until 8).map(c =>
        shiftrightunsigned(col("phash"), c * 8).bitwiseAND(0xFFL)): _*))
        .as(Seq("chunk", "ckey")))
    val pairs = graft.text.NearDup.cappedBucketPairs(
      chunked, Seq("chunk", "ckey"), "doc_id", maxBucket)
    val cand = pairs
      .join(ph, Seq("doc_id"))
      .join(ph.select(col("doc_id").as("nb_id"), col("phash").as("nb_phash")),
        Seq("nb_id"))
      .select(col("doc_id"), col("nb_id"),
        bit_count(col("phash").bitwiseXOR(col("nb_phash"))).as("hamming"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("hamming").asc, col("nb_id").asc)
    val best = cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("nb_id").as("nn_id"),
        col("hamming").cast("long").as("nn_hamming"))
    ph.join(best, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("phash"), col("nn_id"), col("nn_hamming"),
        coalesce(col("nn_hamming") <= maxHamming, lit(false)).as("is_dup"))
  }

  /** STUB media encoder into the TEXT-embedding space: 64 rolling-hash
    * slots over the payload bytes at stride 64 — the same wrapping
    * 31·h+b arithmetic as [[stubDecode]]'s 8-dim feature, widened to
    * the `embeddings` table's dimensionality so the two modalities
    * share a vector space (a real CLIP/CLAP image tower produces real
    * unit vectors here; the swap is this one function). Deterministic,
    * pure in the bytes, oracle-replayable (hex-pair HUGEINT fold).
    */
  def mediaEmbeddingTable(spark: SparkSession, dir: String,
      dim: Int = 64): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter((r: MediaRecord) => r.kind == "image")
      .map { r =>
        val len = r.bytes.length
        val v = Array.tabulate(dim) { i =>
          var h = 1125899906842597L + i
          var j = i
          while (j < len) { h = 31 * h + (r.bytes(j) & 0xFF); j += dim }
          ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
        }
        (r.doc_id, v)
      }
      .toDF("doc_id", "media_vec")
  }

  /** CLIP-shaped cross-modal retrieval: every image's encoder output is
    * matched against the text `embeddings` table by cosine, top-k text
    * vectors per image — the image→caption / audio→transcript retrieval
    * join of a multimodal training pipeline. The scoring kernel is the
    * same codegen'd [[graft.functions.CosineSimilarity]] the text-side
    * search uses; the text side BROADCASTS (the corpus-scale side is the
    * images, which stream through a narrow map). Brute force here is the
    * recall baseline — at text-corpus sizes that don't broadcast, route
    * the probe through the IVF cells (`Similarity.ivfTopK`) unchanged.
    */
  def crossModalTopK(spark: SparkSession, dir: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val enc = mediaEmbeddingTable(spark, dir)
    val emb = graft.model.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    enc.crossJoin(broadcast(emb))
      .select(col("doc_id"), col("vec_id"),
        round(graft.functions.CosineSimilarity(
          col("media_vec"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Cross-modal retrieval routed through the IVF cells — the scale
    * path [[crossModalTopK]] documents: image probes rank the text
    * corpus's label-cell centroids, then rerank exactly within the
    * nprobe best cells only, so the text side never fully scans per
    * probe (and never needs to broadcast). No self-exclusion: query ids
    * are doc_ids, a different id space from the text vec_ids.
    */
  def crossModalIvfTopK(spark: SparkSession, dir: String,
      k: Int = 3, nprobe: Int = 2): DataFrame = {
    val queries = mediaEmbeddingTable(spark, dir)
      .select(col("doc_id").as("qid"), col("media_vec").as("qe"))
    val emb = graft.model.Tables.embeddings(spark, dir)
    graft.similarity.Similarity
      .ivfSearch(queries, emb, k, nprobe, excludeSelf = false)
      .select(col("qid").as("doc_id"), col("label"), col("vec_id"),
        col("cos_sim"), col("rank"))
  }

  /** Cross-modal retrieval WALKED over the navigable graph — the
    * mm family's graph-index scale path next to the IVF cells: image
    * probes enter at the text corpus's cell representatives and beam-
    * search the trained HNSW graph, so serving cost is O(beam · hops ·
    * degree) per probe whatever the text-corpus size (the brute gate
    * stays as the recall anchor). No self-exclusion: doc_ids and
    * vec_ids are different id spaces.
    */
  def crossModalHnswTopK(spark: SparkSession, dir: String,
      k: Int = 3): DataFrame = {
    // the beam search references the query frame once per hop (plus the
    // final ranking) — checkpoint it so the media decode runs ONCE per
    // invocation instead of once per hop
    val queries = mediaEmbeddingTable(spark, dir)
      .select(col("doc_id").as("qid"), col("media_vec").as("qe"))
      .localCheckpoint()
    graft.similarity.Similarity
      .hnswTopKForQueries(spark, dir, queries, k, excludeSelf = false)
      .select(col("qid").as("doc_id"), col("vec_id"), col("cos_sim"),
        col("rank"))
  }
}
