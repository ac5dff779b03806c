package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join that stays a SHUFFLE join at scale.
  *
  * The declarative form — `p JOIN i ON p.ts BETWEEN i.start AND i.end`
  * (optionally plus equi-keys) — gives Catalyst no equality to hash on
  * beyond the keys, and with skewed or absent keys the plan degrades to
  * a nested-loop over every (point, interval) pair in a key group: the
  * O(n·m) shape that falls over at 100 TB. The standard fix (used by
  * every warehouse engine's range-join optimization) is to QUANTIZE the
  * time axis: an interval is exploded onto the fixed-width buckets it
  * overlaps, a point maps to exactly one bucket, and the join becomes a
  * plain equi-join on (keys, bucket) with the exact BETWEEN predicate
  * left as a residual filter. Each qualifying pair meets in precisely
  * one bucket — the point's — so no post-join dedup is needed.
  *
  * Cost model: interval replication = ceil(len/bucket)+1 rows, so pick
  * `bucketMicros` on the order of the TYPICAL interval length —
  * replication stays O(1) per interval while a bucket's population
  * stays bounded — and the whole operator is one shuffle of each side
  * on (keys, bucket), map-side explode included, AQE-skew-splittable
  * like any other equi-join.
  *
  * Reference analog: none (the reference's only temporal predicate is
  * the grouped-max cutoff, SURVEY §2.3 P3/P5) — this is the batch
  * complement of the STREAMING interval join the engine already ships
  * (RateStream stream-stream join), for the backfill/audit side of the
  * same question.
  *
  * Contract: `points` and `intervals` share the `equiKeys` column names;
  * all other column names must be disjoint (alias before calling). The
  * BETWEEN is inclusive on both bounds.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startTs: String, endTs: String,
      equiKeys: Seq[String], bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    // floor() (not integer /) keeps pre-epoch timestamps in the right
    // bucket: -1µs must land in bucket -1, not 0
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(pointTs)) / lit(bucketMicros.toDouble)).cast("long"))
    // empty intervals (end < start) are dropped up front: they can match
    // nothing, and sequence() would otherwise COUNT DOWN between their
    // reversed bucket bounds — a malformed row exploding into
    // |start−end|/bucket rows instead of zero
    val i = intervals.where(col(startTs) <= col(endTs))
      .withColumn("__bucket",
        explode(sequence(
          floor(unix_micros(col(startTs)) / lit(bucketMicros.toDouble)).cast("long"),
          floor(unix_micros(col(endTs)) / lit(bucketMicros.toDouble)).cast("long"))))
    p.join(i, equiKeys :+ "__bucket")
      .where(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__bucket")
  }

  /** INTERVAL-overlap join — the interval × interval sibling of
    * [[pointInInterval]]: pairs where [aStart, aEnd] ∩ [bStart, bEnd]
    * is non-empty (inclusive bounds), with the same quantization trick
    * keeping it an equi-join. Both sides explode onto their buckets; an
    * overlapping pair shares EVERY bucket of the overlap, so the join
    * would emit duplicates — instead each pair is emitted only in its
    * CANONICAL bucket, the bucket of max(aStart, bStart) (the overlap's
    * first instant, which both sides necessarily cover). No post-join
    * distinct, no pair ever counted twice.
    *
    * Cost: replication = ceil(len/bucket)+1 per interval per side; pick
    * `bucketMicros` near the typical interval length. One shuffle per
    * side on (keys, bucket), AQE-skew-splittable. Column names outside
    * `equiKeys` must be disjoint across the two inputs.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      equiKeys: Seq[String], bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    def bucketed(df: DataFrame, s: String, e: String) =
      df.where(col(s) <= col(e)).withColumn("__bucket",
        explode(sequence(
          floor(unix_micros(col(s)) / lit(bucketMicros.toDouble)).cast("long"),
          floor(unix_micros(col(e)) / lit(bucketMicros.toDouble)).cast("long"))))
    val canonicalBucket = floor(
      greatest(unix_micros(col(aStart)), unix_micros(col(bStart)))
        / lit(bucketMicros.toDouble)).cast("long")
    bucketed(a, aStart, aEnd).join(bucketed(b, bStart, bEnd),
        equiKeys :+ "__bucket")
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd)
        && col("__bucket") === canonicalBucket)
      .drop("__bucket")
  }
}
