package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Equi-width histogram sketch — the QUANTILE member of the mergeable-
  * sketch family next to KMV (distinct), Count-Min (frequency), HLL
  * (distinct registers), and Bloom (membership): fixed bins over a
  * declared domain, exact integer counts per bin, percentile estimates
  * by linear interpolation inside the covering bin. Unlike the exact
  * sort-based percentile (a full shuffle-and-sort of the corpus) the
  * sketch is ONE map-side-combinable groupBy to ≤ nBins rows, bins sum
  * across batches/partitions/days (mergeable, additive), and the
  * estimator runs on the digest alone.
  *
  * Determinism: bin = clamped floor((x−lo)/w) — doubles, but identical
  * operand trees on both engines; counts exact longs; the interpolated
  * estimate is one fixed double expression per quantile over exact
  * integers. Values outside [lo, hi) clamp into the edge bins (the
  * declared-domain convention; a production deployment picks lo/hi from
  * column stats).
  */
object HistogramSketch {

  /** (bin, cnt) digest of `valueCol` over the declared domain. */
  def binCounts(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    val w = (hi - lo) / nBins
    df.select(
        least(greatest(floor((col(valueCol).cast("double") - lit(lo)) / lit(w)),
          lit(0L)), lit(nBins - 1L)).cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Interpolated percentile estimates from a bin digest: for each q,
    * rank = ceil(q·N), the first bin whose cumulative count reaches the
    * rank covers it, and the estimate interpolates linearly inside that
    * bin. Output: (quantile, rank, bin, estimate). The digest collect
    * is ≤ nBins rows — bounded driver state, the k-means-centroid
    * pattern.
    */
  def percentiles(s: SparkSession, bins: DataFrame, lo: Double, hi: Double,
      nBins: Int, qs: Seq[Double]): DataFrame = {
    val w = (hi - lo) / nBins
    val counts = bins.collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap.withDefaultValue(0L)
    val n = counts.values.sum
    require(n > 0, "histogram digest is empty — percentiles are undefined " +
      "on an empty corpus (rank 1 would never find a covering bin)")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got ${qs.mkString(", ")} — a value " +
        "outside the range would never find a covering bin and the " +
        "interpolation would divide by zero")
    val rows = qs.map { q =>
      val rank = math.ceil(q * n.toDouble).toLong.max(1L)
      var cum = 0L
      var bin = 0
      var found = -1
      var cumPrev = 0L
      while (found < 0 && bin < nBins) {
        val c = counts(bin)
        if (cum + c >= rank) { found = bin; cumPrev = cum }
        cum += c
        bin += 1
      }
      val cnt = counts(found)
      val est = lo + w * (found.toDouble +
        (rank - cumPrev).toDouble / cnt.toDouble)
      Row(q, rank, found, est)
    }
    s.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      StructType(Seq(
        StructField("quantile", DoubleType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("bin", IntegerType, nullable = false),
        StructField("estimate", DoubleType, nullable = false))))
  }
}
