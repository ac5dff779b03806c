package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named as-of join: for each left row, the most recent right row at or
  * before the left row's time, per key.
  *
  * The reference hand-rolls exactly this ("PreviousRates":
  * /root/reference/Fx_1min.py:175-197 — grouped max + theta join +
  * correlated scalar subquery); SURVEY §2.4 calls for naming the
  * capability. The implementation is the scalable union-window technique:
  * tag both sides, union, and carry the last right-side value forward with
  * last_value(ignoreNulls) over one (key, time) sort — a single shuffle,
  * no range/nested-loop join, no per-row subquery. This is the plan shape
  * that survives a 1000-executor cluster: partition by key, sort within
  * partition, stream.
  *
  * Ties (equal times on both sides) resolve inclusively — a right row at
  * exactly the left row's time matches, like DuckDB/QuestDB ASOF JOIN.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are carried)
    * @param keys      equi-join keys
    * @param leftTime  ordering column on `left`
    * @param rightTime ordering column on `right`
    * @param valueCols right-side columns to surface, renamed as given
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    val tagged =
      left.select(
        keys.map(col) ++
          Seq(col(leftTime).as("__t"), lit(0).as("__is_right")) ++
          leftCols.filterNot(keys.contains).map(col) ++
          valueCols.map { case (_, out) => lit(null).as(s"__v_$out") }: _*)
      .unionByName(
        right.select(
          keys.map(col) ++
            Seq(col(rightTime).as("__t"), lit(1).as("__is_right")) ++
            leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
            valueCols.map { case (in, out) => col(in).as(s"__v_$out") }: _*))
    // right rows sort before left rows at equal time → inclusive (<=) match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(tagged) { case (df, (_, out)) =>
      df.withColumn(out, last(col(s"__v_$out"), ignoreNulls = true).over(w))
    }
    carried.where(col("__is_right") === 0)
      .select(keys.map(col) ++
        Seq(col("__t").as(leftTime)) ++
        leftCols.filterNot(k => keys.contains(k) || k == leftTime).map(col) ++
        valueCols.map { case (_, out) => col(out) }: _*)
  }
}
