package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over a symmetric edge list: for every NON-adjacent
  * node pair sharing at least one neighbor, the two classic local
  * scores — the common-neighbor count (Newman 2001) and the
  * resource-allocation index (Zhou, Lü & Zhang 2009), RA(a,b) =
  * Σ_{z ∈ N(a)∩N(b)} 1/deg(z). RA down-weights promiscuous
  * intermediaries, which is what makes it beat raw common-neighbor
  * counting on most real graphs; it is chosen here over Adamic-Adar
  * (1/ln deg) because 1/deg stays in EXACT integer arithmetic.
  *
  * Exactness device: RA is quoted as `ra_scaled` = Σ floor(10^12 /
  * deg(z)) — integer floor division per wedge centre, integer sum — so
  * the score is accumulation-order-free and the oracle replays it with
  * `//`. No floats exist in the operator.
  *
  * Scale shape: one degree aggregation, one wedge self-join shuffling
  * on the wedge centre z (the [[Triangles]] budget: Σ deg(z)² rows,
  * bounded on mutual-top-N inputs by N²·|nodes|), one grouped count on
  * the candidate pair, one left-anti join against the edge list to
  * drop already-adjacent pairs. Nothing is quadratic in |nodes| unless
  * the wedge structure itself is; degrees ride the wedge join's own
  * z-partitioning as a broadcast digest (≤|nodes| rows).
  */
object LinkPrediction {

  private val RaScale = 1000000000000L // 10^12: floor(RaScale / deg)

  /** `edges`: SYMMETRIC directed edge list (both orientations, no
    * self-loops) — the [[GraphStats.mutualTopK]] output shape. Returns
    * one row per predicted (a < b) pair: common_neighbors, ra_scaled.
    */
  def predictLinks(edges: DataFrame): DataFrame = {
    // symmetric input: out-degree IS the degree; ≤|nodes|-row digest
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val wedges = edges.select(col("src").as("a"), col("dst").as("z"))
      .join(edges.select(col("src").as("z"), col("dst").as("b")), "z")
      .where(col("a") < col("b")) // each unordered pair once per centre
    val scored = wedges
      .join(broadcast(deg.select(col("src").as("z"), col("deg"))), "z")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr(s"$RaScale div deg")).as("ra_scaled"))
    // drop pairs already adjacent (symmetric list: (a,b) present iff
    // (b,a) is, so one orientation suffices for the anti-join)
    scored.join(edges.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"), "left_anti")
  }
}
