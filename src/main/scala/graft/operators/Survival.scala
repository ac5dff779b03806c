package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** KAPLAN-MEIER survival analysis (Kaplan & Meier 1958 — the
  * product-limit estimator, the standard churn/retention curve with
  * CENSORING done right: a user still active at the observation edge is
  * not a churn event, merely censored — naive retention curves
  * systematically overstate churn by counting them). Subject = user;
  * duration = days between first and last event; a user whose last
  * event is within `censorDays` of the corpus's last day is censored
  * (still alive), otherwise their duration is a churn event.
  *
  *   S(t) = Π_{t' ≤ t, d_{t'} > 0} (1 − d_{t'} / n_{t'})
  *
  * with d_t churn events at duration t and n_t the at-risk count
  * (users with duration ≥ t).
  *
  * Scale shape: ONE map-side-combinable per-user min/max aggregation is
  * the only corpus-touching pass; everything after runs on the
  * ≤|distinct durations| digest (bounded by the calendar span) — the
  * at-risk reverse cumsum is a digest window, and the cumulative
  * product folds the digest in duration order on one row, exact-long
  * d/n with one double division + multiply per step, operand-identical
  * to the oracle's iteration-shaped recursive CTE.
  */
object Survival {

  def kaplanMeier(s: SparkSession, dir: String,
      censorDays: Int = 14): DataFrame =
    kaplanMeierOf(Tables.events(s, dir)
      .select(col("user_id"), col("ts")), censorDays)

  def kaplanMeierOf(events: DataFrame, censorDays: Int): DataFrame =
    curveFromSpans(events.groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("f"),
        max(col("ts").cast("date")).as("l")), censorDays)

  /** The curve from a (user_id, f, l) span relation — the incremental
    * path folds maintained min/max partials into the same shape.
    */
  private[graft] def curveFromSpans(u: DataFrame,
      censorDays: Int): DataFrame = {
    val mx = u.agg(max(col("l")).as("mx"))
    val durs = u.crossJoin(broadcast(mx))
      .select(datediff(col("l"), col("f")).as("t"),
        (col("l") <= date_sub(col("mx"), censorDays)).cast("long")
          .as("ev"))
    val agg = durs.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"),
        (count(lit(1)) - sum(col("ev"))).as("c"))
    // at-risk = users with duration ≥ t: reverse cumsum over the
    // ≤|calendar-span| digest (single-partition window by design)
    val rk = agg.withColumn("n", sum(col("d") + col("c")).over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("t").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    // cumulative product in duration order: fold the whole digest on
    // one row, appending (t, d, c, n, running S) per step
    val rowT = "struct<t:int,d:bigint,c:bigint,n:bigint,s:double>"
    val folded = rk
      .agg(sort_array(collect_list(struct(col("t"), col("d"), col("c"),
        col("n")))).as("rows"))
      .select(aggregate(col("rows"),
        struct(lit(1.0).as("p"),
          array().cast(s"array<$rowT>").as("out")),
        (acc, x) => {
          val p2 = when(x.getField("d") > 0L,
            acc.getField("p") * (lit(1.0)
              - x.getField("d").cast("double")
                / x.getField("n").cast("double")))
            .otherwise(acc.getField("p"))
          struct(p2.as("p"),
            concat(acc.getField("out"), array(struct(
              x.getField("t").as("t"), x.getField("d").as("d"),
              x.getField("c").as("c"), x.getField("n").as("n"),
              p2.as("s")))).as("out"))
        }).getField("out").as("out"))
      .select(explode(col("out")).as("r"))
    folded.select(col("r.t").cast("long").as("duration_days"),
      col("r.n").as("n_risk"), col("r.d").as("n_events"),
      col("r.c").as("n_censored"), col("r.s").as("survival"))
  }
}
