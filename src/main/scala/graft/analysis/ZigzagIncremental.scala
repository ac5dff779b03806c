package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL maintenance of the zigzag pivot report — a different
  * animal from the repo's other incrementals: their per-batch partials
  * are mergeable (counts, bitsets, min-structs fold in any order), but
  * the zigzag leg recurrence is ORDER-DEPENDENT, so the maintained
  * state is a per-pair FRONTIER: days strictly before the newest seen
  * day are final (the feed is chronological) and fold through
  * [[MarketAnalytics.zigzagFold]] exactly once; the newest day stays
  * BUFFERED as a running LWW close (a later batch may still revise it)
  * and only folds when a younger day supersedes it — or at report time,
  * when the stream's end makes it final.
  *
  * Work per batch: one LWW aggregation over the batch's (pair, day)
  * rows, a ≤|pairs|-row state join, one fold expression — O(batch) +
  * O(|pairs|) state, never a rescan. Idempotent via batch-scoped dirs +
  * markers, and crash-safe in the window between the state write and
  * the marker: a retried batch reads only generations strictly before
  * its own batch id, so it re-folds from the pre-batch state and
  * overwrites the orphaned attempt with identical content. The
  * report must equal the one-shot fx_zigzag bit for bit — the gate
  * reuses that oracle verbatim.
  */
object ZigzagIncremental {

  private def emptyPiv = array().cast(MarketAnalytics.ZigzagPivType)

  private val stateSchema = "ccy_couple string, dir int, ev bigint, ed date, " +
    "bday date, bts bigint, bid bigint, bclose double"

  /** Latest committed state generation. `below` bounds the read to
    * generations STRICTLY before the given batch id: a crash after the
    * state/pivots writes but before the `_applied` marker leaves the
    * failed attempt's own `state/b{bid}` on disk, and a retried batch
    * reading the global max would fold its finalized days a second time
    * through the order-dependent recurrence. Bounding by the batch id
    * makes the retry re-read the pre-batch state (and harmlessly
    * overwrite the orphaned attempt).
    */
  /** Generation dirs that finished their write — a crash mid-write
    * leaves a partial dir with no _SUCCESS marker, which must be
    * invisible to every reader (the retry overwrites it).
    */
  private def committedGens(root: String): Array[(Long, java.io.File)] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(f => f.getName.stripPrefix("b").toLong -> f)
  }

  private def latestState(s: SparkSession, stateRoot: String,
      below: Option[Long] = None): DataFrame = {
    val gens = committedGens(stateRoot)
      .filter { case (g, _) => below.forall(g < _) }
    if (gens.isEmpty) s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(stateSchema))
    else s.read.parquet(gens.maxBy(_._1)._2.getAbsolutePath)
  }

  /** The decimal chain the one-shot close digest uses — buffered raw
    * doubles convert ONLY at fold time, so a revised close never
    * double-rounds.
    */
  private def milli(close: org.apache.spark.sql.Column) =
    (close.cast("decimal(18,6)").cast("decimal(12,3)") * lit(1000))
      .cast("long")

  def applyBatch(s: SparkSession, root: String, batch: DataFrame,
      thresholdMilli: Long = 100000L, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map(id =>
      java.nio.file.Paths.get(root, "_applied", s"batch-$id"))
    if (marker.exists(java.nio.file.Files.exists(_))) return
    val bid = batchId.getOrElse(0L)

    val prev = latestState(s, s"$root/state", below = batchId)
    // batch LWW per (pair, day), merged with the buffered frontier rows
    val daily = batch
      .select(col("ccy_couple"), col("timestamp").cast("date").as("day"),
        unix_micros(col("timestamp")).as("ts"), col("event_id"), col("rate"))
      .unionByName(prev.where(col("bday").isNotNull)
        .select(col("ccy_couple"), col("bday").as("day"), col("bts").as("ts"),
          col("bid").as("event_id"), col("bclose").as("rate")))
      .groupBy(col("ccy_couple"), col("day"))
      .agg(max_by(struct(col("rate"), col("ts"), col("event_id")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("ccy_couple"), col("day"), col("m.rate").as("rate"),
        col("m.ts").as("ts"), col("m.event_id").as("event_id"))
      .withColumn("wmax", max(col("day")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ccy_couple"))))
      .localCheckpoint(true)

    val newBuffer = daily.where(col("day") === col("wmax"))
      .select(col("ccy_couple"), col("day").as("bday"), col("ts").as("bts"),
        col("event_id").as("bid"), col("rate").as("bclose"))
    val finalized = daily.where(col("day") < col("wmax"))
      .groupBy(col("ccy_couple"))
      .agg(array_sort(collect_list(struct(col("day").as("date"),
        milli(col("rate")).as("v")))).as("days"))

    val zprev = prev.select(col("ccy_couple"), col("dir"), col("ev"), col("ed"))
    val joined = zprev.join(finalized, Seq("ccy_couple"), "full")
      .withColumn("days", coalesce(col("days"),
        array().cast("array<struct<date:date,v:bigint>>")))
    val hasState = col("dir").isNotNull
    val init = when(hasState,
      MarketAnalytics.zigzagPack(col("dir"), col("ev"), col("ed"), emptyPiv))
      .otherwise(MarketAnalytics.zigzagPack(lit(0),
        element_at(col("days"), 1).getField("v"),
        element_at(col("days"), 1).getField("date"), emptyPiv))
    val toFold = when(hasState, col("days"))
      .otherwise(slice(col("days"), lit(2),
        greatest(size(col("days")) - 1, lit(0))))
    // rows with no prior state AND no finalized day fold to an all-null
    // init harmlessly — zvalid masks them out of both state and pivots
    val folded2 = joined.withColumn("toFoldX", toFold)
      .withColumn("z", MarketAnalytics.zigzagFold(init, col("toFoldX"),
        thresholdMilli))
      .withColumn("zvalid", hasState || size(col("days")) > 0)
      .localCheckpoint(true)

    val newState = folded2
      .select(col("ccy_couple"),
        when(col("zvalid"), col("z.dir")).as("dir"),
        when(col("zvalid"), col("z.ev")).as("ev"),
        when(col("zvalid"), col("z.ed")).as("ed"))
      .join(newBuffer, Seq("ccy_couple"), "full")
      .select(col("ccy_couple"), col("dir"), col("ev"), col("ed"),
        col("bday"), col("bts"), col("bid"), col("bclose"))
    newState.write.mode("overwrite").parquet(s"$root/state/b$bid")

    folded2.where(col("zvalid"))
      .select(col("ccy_couple"), explode(col("z.piv")).as("p"))
      .select(col("ccy_couple"), col("p.pd").as("pivot_date"),
        col("p.pv").as("pivot_milli"), col("p.kind").as("kind"))
      .write.mode("overwrite").parquet(s"$root/pivots/b$bid")

    marker.foreach { m =>
      java.nio.file.Files.createDirectories(m.getParent)
      java.nio.file.Files.createFile(m)
      ()
    }
  }

  /** Report: the buffered frontier day is final once the stream ends —
    * fold it through the same recurrence, then union every batch's
    * emitted pivots. Equals the one-shot [[MarketAnalytics.zigzagPivots]]
    * exactly.
    */
  def report(s: SparkSession, root: String,
      thresholdMilli: Long = 100000L): DataFrame = {
    val st = latestState(s, s"$root/state")
      .where(col("bday").isNotNull)
    val withDays = st.withColumn("days",
      array(struct(col("bday").as("date"), milli(col("bclose")).as("v"))))
    val hasState = col("dir").isNotNull
    val init = when(hasState,
      MarketAnalytics.zigzagPack(col("dir"), col("ev"), col("ed"), emptyPiv))
      .otherwise(MarketAnalytics.zigzagPack(lit(0),
        element_at(col("days"), 1).getField("v"),
        element_at(col("days"), 1).getField("date"), emptyPiv))
    val toFold = when(hasState, col("days"))
      .otherwise(slice(col("days"), lit(2), lit(0)))
    val tail = withDays.withColumn("toFoldX", toFold)
      .select(col("ccy_couple"),
        explode(MarketAnalytics.zigzagFold(init, col("toFoldX"),
          thresholdMilli).getField("piv")).as("p"))
      .select(col("ccy_couple"), col("p.pd").as("pivot_date"),
        col("p.pv").as("pivot_milli"), col("p.kind").as("kind"))
    // only COMMITTED pivot generations — a crashed attempt's partial
    // dir has no _SUCCESS and must not leak rows into the report
    val pivotDirs = committedGens(s"$root/pivots").map(_._2.getAbsolutePath)
    val emitted =
      if (pivotDirs.isEmpty) tail.limit(0)
      else s.read.parquet(pivotDirs: _*)
    emitted.unionByName(tail)
  }
}
