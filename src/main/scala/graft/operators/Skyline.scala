package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both dimensions): the points
  * no other point dominates — dominance = ≥ in both dims, > in at least
  * one. The classic answer to "best trade-offs" queries (price vs
  * recency, quality vs length) without collapsing the two objectives
  * into one score.
  *
  * The naive formulation is a quadratic NOT-EXISTS self-join; in 2-D the
  * frontier is order-structured: a point survives iff no STRICTLY
  * higher-x point has y ≥ its y, and no equal-x point has a strictly
  * higher y. That "max y over strictly higher x" is a running max — and
  * a running max over an unbounded relation must NOT become one global
  * window sort (the single-task cumsum trap), so it runs as the same
  * chunked two-pass scan the sequence packer uses:
  *
  *   1. bucket x into coarse chunks (floor(x/W)); per-chunk level table
  *      (distinct x, max y) — map-side-combinable groupBy, the only
  *      full-data pass;
  *   2. IN-chunk strictly-higher running max: a window PARTITIONED by
  *      chunk (parallel, bounded by the chunk's level count);
  *   3. ACROSS-chunk running max: a window over the |chunks| digest
  *      (domain/W rows however large the corpus), broadcast back;
  *   4. per-row dominance test joining the level digest on (chunk, x).
  *
  * Exact comparisons only — no arithmetic on the dims — so the result
  * is trivially engine-portable, and the oracle can be the DEFINITIONAL
  * quadratic NOT-EXISTS: the scalable plan must equal the textbook
  * semantics.
  */
object Skyline {

  /** Rows of `df` on the maximizing skyline of (`x`, `y`). Exact
    * duplicates in both dims are ALL kept (neither dominates). `chunkW`
    * buckets the x domain for the two-pass running max.
    */
  def skylineMax2D(df: DataFrame, x: Column, y: Column,
      chunkW: Double = 25000.0): DataFrame = {
    val dims = df.withColumn("__x", x).withColumn("__y", y)
      .withColumn("__chunk", floor(col("__x") / lit(chunkW)))
    val lvl = dims.groupBy(col("__chunk"), col("__x"))
      .agg(max(col("__y")).as("__lvlmax"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inChunk = lvl.withColumn("__inHigher", max(col("__lvlmax")).over(wIn))
    val wAcross = Window.orderBy(col("__chunk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val across = lvl.groupBy(col("__chunk")).agg(max(col("__lvlmax")).as("__cmax"))
      .withColumn("__acrossHigher", max(col("__cmax")).over(wAcross))
      .select(col("__chunk"), col("__acrossHigher"))
    val digest = inChunk.join(broadcast(across), "__chunk")
      // greatest() skips NULLs by spec (NULL only when both are), which
      // is exactly the "no higher point on that side" semantics
      .withColumn("__higher",
        greatest(col("__inHigher"), col("__acrossHigher")))
      .select(col("__chunk"), col("__x"), col("__lvlmax"), col("__higher"))
    dims.join(digest, Seq("__chunk", "__x"))
      .where(
        (col("__higher").isNull || col("__higher") < col("__y")) &&
          col("__y") === col("__lvlmax"))
      .drop("__chunk", "__x", "__y", "__lvlmax", "__higher")
  }
}
