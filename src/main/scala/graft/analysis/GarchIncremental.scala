package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL maintenance of the GARCH(1,1) volatility report — the
  * second instance of the ORDER-DEPENDENT incremental discipline
  * [[ZigzagIncremental]] established (the conditional-variance
  * recurrence consumes returns strictly in day order, so partials are
  * not mergeable): per-pair state carries the recurrence tail
  * (previous FINALIZED close, σ², running peak, return count) plus a
  * BUFFERED frontier day (a later batch may still revise the newest
  * day's close); a day folds through the recurrence exactly once, when
  * a younger day supersedes it — or at report time, when the stream's
  * end makes it final.
  *
  * Exactness: the state's previous close is the RAW double rate and
  * every return derives at fold time through the one-shot's exact cast
  * chain — (close₆ − prev₆) rounded to DECIMAL(12,3), ×1000 long — so
  * diff-then-round never degrades to round-then-diff and the report
  * must equal the one-shot `fx_garch_vol` bit for bit (same oracle).
  *
  * Work per batch: one LWW aggregation over the batch's (pair, day)
  * rows merged with the ≤|pairs|-row buffered frontier, one fold —
  * O(batch) + O(|pairs|) state. Idempotent via batch markers; the
  * retry window reads only `_SUCCESS`-committed generations STRICTLY
  * below its own batch id (the [[ZigzagIncremental]] crash contract).
  */
object GarchIncremental {

  private val stateSchema = "ccy_couple string, pcr double, s double, " +
    "pk double, pd date, n bigint, bday date, bts bigint, bid bigint, " +
    "bclose double"

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

  /** One recurrence step over (acc, day-close), acc fields
    * (pcr, s, pk, pd, n) — the FIRST observed close only seeds pcr.
    */
  private def step(acc: Column, d: Column, c: Column): Column = {
    val chgU = ((c.cast("decimal(18,6)") - acc.getField("pcr")
      .cast("decimal(18,6)")).cast("decimal(12,3)") * lit(1000))
      .cast("long")
    val r = chgU.cast("double")
    val s2 = lit(1000.0) + lit(0.1) * (r * r) +
      lit(0.85) * acc.getField("s")
    val better = acc.getField("pk").isNull || s2 > acc.getField("pk")
    when(acc.getField("pcr").isNull,
      struct(c.as("pcr"), acc.getField("s").as("s"),
        acc.getField("pk").as("pk"), acc.getField("pd").as("pd"),
        acc.getField("n").as("n")))
      .otherwise(struct(c.as("pcr"), s2.as("s"),
        when(better, s2).otherwise(acc.getField("pk")).as("pk"),
        when(better, d).otherwise(acc.getField("pd")).as("pd"),
        (acc.getField("n") + 1L).as("n")))
  }

  def applyBatch(s: SparkSession, root: String, batch: DataFrame,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map(id =>
      java.nio.file.Paths.get(root, "_applied", s"batch-$id"))
    if (marker.exists(java.nio.file.Files.exists(_))) return
    val bid = batchId.getOrElse(0L)

    val prev = latestState(s, s"$root/state", below = batchId)
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
      .agg(array_sort(collect_list(struct(col("day").as("d"),
        col("rate").as("c")))).as("days"))

    val st = prev.select(col("ccy_couple"), col("pcr"), col("s"),
      col("pk"), col("pd"), col("n"))
    val joined = st.join(finalized, Seq("ccy_couple"), "full")
      .withColumn("days", coalesce(col("days"),
        array().cast("array<struct<d:date,c:double>>")))
    val hasState = col("pcr").isNotNull || col("n").isNotNull
    val init = when(hasState,
      struct(col("pcr"), col("s"), col("pk"), col("pd"), col("n")))
      .otherwise(struct(lit(null).cast("double").as("pcr"),
        lit(20000.0).as("s"), lit(null).cast("double").as("pk"),
        lit(null).cast("date").as("pd"), lit(0L).as("n")))
    val folded = joined.withColumn("z",
      aggregate(col("days"), init,
        (acc, x) => step(acc, x.getField("d"), x.getField("c"))))

    val newState = folded
      .select(col("ccy_couple"), col("z.pcr").as("pcr"), col("z.s").as("s"),
        col("z.pk").as("pk"), col("z.pd").as("pd"), col("z.n").as("n"))
      .join(newBuffer, Seq("ccy_couple"), "full")
      .select(col("ccy_couple"), col("pcr"), col("s"), col("pk"),
        col("pd"), col("n"), col("bday"), col("bts"), col("bid"),
        col("bclose"))
    newState.write.mode("overwrite").parquet(s"$root/state/b$bid")

    marker.foreach { m =>
      java.nio.file.Files.createDirectories(m.getParent)
      java.nio.file.Files.createFile(m)
      ()
    }
  }

  /** Report: the buffered frontier day is final once the stream ends —
    * fold it through the same step, then emit pairs with ≥1 return.
    * Must equal the one-shot [[MarketAnalytics.garchVol]] exactly.
    */
  def report(s: SparkSession, root: String): DataFrame = {
    val st = latestState(s, s"$root/state")
    val hasState = col("pcr").isNotNull || col("n").isNotNull
    val init = when(hasState,
      struct(col("pcr"), col("s"), col("pk"), col("pd"), col("n")))
      .otherwise(struct(lit(null).cast("double").as("pcr"),
        lit(20000.0).as("s"), lit(null).cast("double").as("pk"),
        lit(null).cast("date").as("pd"), lit(0L).as("n")))
    val z = when(col("bday").isNotNull,
      step(init, col("bday"), col("bclose"))).otherwise(init)
    st.select(col("ccy_couple"), z.as("z"))
      .where(col("z.n") > 0L)
      .select(col("ccy_couple"), col("z.n").as("n_days"),
        col("z.s").as("sigma2_forecast"), col("z.pk").as("sigma2_peak"),
        col("z.pd").as("peak_date"))
  }
}
