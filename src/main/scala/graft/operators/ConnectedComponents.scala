package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Generic weakly-connected components by hash-min label propagation —
  * the graph primitive under near-dup clustering, entity resolution,
  * and householding: every node repeatedly adopts the minimum label in
  * its neighborhood until no label changes, so each component converges
  * to its minimum node id. Extracted from the near-dup cluster pass so
  * arbitrary edge relations get the same machinery.
  *
  * Scale shape: per round one join edges⋈labels + one min-aggregate —
  * both shuffle on node keys and combine map-side; the label relation
  * is |nodes| rows. Rounds are `localCheckpoint`ed (eager) because each
  * round's plan would otherwise nest the previous round's join tree and
  * planning time would dominate. Convergence is detected by counting
  * CHANGED labels in the round's own join output (a label changes iff
  * its neighborhood min undercuts it) — one cheap scan over the
  * checkpointed round, no generation diff join, and sound for any
  * 64-bit node-id domain (a label-sum probe can wrap and is NULL on an
  * empty edge relation). Deterministic: labels are node ids, min is
  * order-free.
  */
object ConnectedComponents {

  private val mem = StorageLevel.MEMORY_AND_DISK

  /** (id, label) for every node appearing in `edges` (`src`, `dst`
    * columns); label = the component's minimum node id. Isolated nodes
    * (no edges) never appear — prepend self-loops if they must.
    */
  def labelPropagation(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst")).unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst"))).persist(mem)
    var labels = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).persist(mem)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbMin = e.join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      val next = labels
        .join(nbMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("changed"))
        .localCheckpoint(true)
      val nChanged = next.where(col("changed")).count()
      labels.unpersist()
      labels = next.select(col("id"), col("label"))
      converged = nChanged == 0L
      i += 1
    }
    e.unpersist()
    labels
  }
}
