package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality gate: every rule's violation count computed in
  * ONE aggregate over the data (a conditional sum per rule), not one scan
  * per rule — at 100 TB the difference between a DQ gate and a DQ outage.
  */
object DataQuality {

  final case class Rule(name: String, holds: Column)

  /** One row: total row count plus a violation count per rule. */
  def profile(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      rules.map(r =>
        sum(when(!coalesce(r.holds, lit(false)), 1L).otherwise(0L))
          .as(s"viol_${r.name}")): _*)

  /** The WRITE-PATH form of [[profile]]: the same single-pass rule
    * counters collected while the data flows to its sink via
    * `Dataset.observe` (Catalyst `CollectMetrics`) — zero extra scans,
    * zero extra shuffles; the metrics ride the already-running job as
    * accumulators. This is how a production pipeline gates a 100 TB
    * write: profile() afterwards would pay a second full read; observe()
    * is free. Returns the observed metrics as a 1-row DataFrame after
    * running `action` on the instrumented frame (in production: the
    * parquet write of the instrumented frame itself — the noop-format
    * write the gate query uses is that shape without the bytes).
    */
  def observedProfile(df: DataFrame, rules: Seq[Rule])
      (action: DataFrame => Unit): DataFrame = {
    val obs = org.apache.spark.sql.Observation()
    val metricCols =
      count(lit(1)).as("n_rows") +:
        rules.map(r =>
          sum(when(!coalesce(r.holds, lit(false)), 1L).otherwise(0L))
            .as(s"viol_${r.name}"))
    val instrumented = df.observe(obs, metricCols.head, metricCols.tail: _*)
    action(instrumented)
    val row = obs.get
    val names = "n_rows" +: rules.map(r => s"viol_${r.name}")
    val spark = df.sparkSession
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row.fromSeq(
        names.map(n => row(n).asInstanceOf[Long]))),
      org.apache.spark.sql.types.StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Throws with a per-rule breakdown when any rule is violated. */
  def assertAll(df: DataFrame, rules: Seq[Rule]): Unit = {
    val row = profile(df, rules).collect().head
    val bad = rules.zipWithIndex
      .map { case (r, i) => r.name -> row.getLong(i + 1) }
      .filter(_._2 > 0)
    require(bad.isEmpty,
      s"data-quality violations: ${bad.map { case (n, c) => s"$n=$c" }.mkString(", ")}")
  }

  /** Key-skew diagnostic — the numbers that decide whether a join/agg on
    * `keyCol` needs salting, AQE skew handling, or nothing: total rows,
    * distinct keys, the heaviest key's row count and share, the p99 key
    * size, and the max/mean skew factor. One groupBy to the per-key
    * count digest (map-side combinable), then a 1-row aggregate over
    * |keys| rows — the profile costs one shuffle however large the
    * corpus. Counts are exact longs; the three derived ratios are single
    * double divisions on identical operands.
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_key_rows"),
      percentile(col("c"), lit(0.99)).as("p99_key_rows"))
    .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
      col("p99_key_rows"),
      (col("max_key_rows").cast("double") / col("n_rows").cast("double"))
        .as("top_key_share"),
      (col("max_key_rows").cast("double")
        / (col("n_rows").cast("double") / col("n_keys").cast("double")))
        .as("skew_factor"))
  }
}
