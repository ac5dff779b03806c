package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005, public
  * algorithm): d×w counter cells addressed by d independent hashes; a
  * key's frequency estimate is the MIN over its d cells — an upper
  * bound on the true count that collisions can only inflate, never
  * deflate.
  *
  * Like [[Kmv]], the point of this formulation is a DETERMINISTIC,
  * engine-portable sketch: the d hash functions are Spark's multi-arg
  * `xxhash64` fold (row index, then key — each value hashed with the
  * accumulator as seed), which the DuckDB oracle replays bit-exactly,
  * so the hash gate verifies the whole sketch including its collision
  * errors. `CountMinSketch` in Spark's own util exists but its
  * serialized layout is engine-private, like HLL++.
  *
  * Scale shape: cell building is one narrow map (d structs per row)
  * plus a groupBy on (row, cell) — at most d×w result rows however big
  * the corpus, fully map-side combinable. The probe side joins the
  * candidate keys against the broadcast d×w cell table. Memory is
  * O(d·w) everywhere.
  */
object CountMin {

  private def cellCol(keyCol: String, i: Int, w: Int) =
    pmod(xxhash64(lit(i), col(keyCol)), lit(w.toLong))

  /** One relation's sketch cells: (r, c, cnt) — at most d·w rows. Cell
    * counts are mergeable (sum by (r, c)), which is what lets partial
    * cells from micro-batches fold into the same sketch a one-shot
    * build produces.
    */
  def cellsOf(df: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 1024): DataFrame = {
    val rcs = (0 until d).map(i =>
      struct(lit(i).as("r"), cellCol(keyCol, i, w).as("c")))
    df.select(explode(array(rcs: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Probe the exact top-`topK` keys of `df` against a prebuilt (or
    * folded) cell table.
    */
  def heavyHittersFromCells(cells: DataFrame, df: DataFrame,
      keyCol: String, d: Int = 4, w: Int = 1024,
      topK: Int = 10): DataFrame = {
    val rcs = (0 until d).map(i =>
      struct(lit(i).as("r"), cellCol(keyCol, i, w).as("c")))
    val top = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col(keyCol).asc)
      .limit(topK)
    val probes = top.select(col(keyCol), col("exact_count"),
      explode(array(rcs: _*)).as("rc"))
      .select(col(keyCol), col("exact_count"),
        col("rc.r").as("r"), col("rc.c").as("c"))
    probes.join(broadcast(cells), Seq("r", "c"))
      .groupBy(col(keyCol), col("exact_count"))
      .agg(min(col("cnt")).as("cms_estimate"))
  }

  /** The exact top-`topK` keys by frequency (ties to the smaller key)
    * with their CMS estimates — estimate ≥ exact always, equal in the
    * collision-free case. One row per heavy hitter.
    */
  def heavyHitters(df: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 1024, topK: Int = 10): DataFrame =
    heavyHittersFromCells(cellsOf(df, keyCol, d, w), df, keyCol, d, w, topK)
}
