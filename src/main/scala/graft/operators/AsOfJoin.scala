package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Named as-of join family: for each left row, the right row nearest in
  * time per key — backward (most recent at-or-before), forward (earliest
  * at-or-after), or nearest-within-tolerance (closer of the two).
  *
  * The reference hand-rolls exactly the backward case ("PreviousRates":
  * /root/reference/Fx_1min.py:175-197 — grouped max + theta join +
  * correlated scalar subquery); SURVEY §2.4 calls for naming the
  * capability, and forward/nearest complete the family (DuckDB ASOF
  * oracles both directions). The implementation is the scalable
  * union-window technique: tag both sides, union, and carry the adjacent
  * right-side value across with last_value(ignoreNulls) over one
  * (key, time) sort — a single shuffle, no range/nested-loop join, no
  * per-row subquery. The forward pass is the same window with the sort
  * REVERSED, so backward+forward together still cost one Exchange (the
  * partitioning is identical; Spark re-sorts between the two Window
  * operators without reshuffling). This is the plan shape that survives
  * a 1000-executor cluster: partition by key, sort within partition,
  * stream.
  *
  * Ties (equal times on both sides) resolve inclusively in BOTH
  * directions — a right row at exactly the left row's time matches, like
  * DuckDB/QuestDB ASOF JOIN. Nearest at equal distance resolves backward.
  */
object AsOfJoin {

  /** Tag + union the two sides: right rows carry `__v_<out>` values (and
    * `__rt`, the right time), left rows carry their payload columns.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__is_right"),
          lit(null).cast(right.schema(rightTime).dataType).as("__rt")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map { case (_, out) => lit(null).as(s"__v_$out") }: _*)
      .unionByName(
        right.select(
          keys.map(col) ++
            Seq(col(rightTime).as("__t"), lit(1).as("__is_right"),
              col(rightTime).as("__rt")) ++
            leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
            valueCols.map { case (in, out) => col(in).as(s"__v_$out") }: _*))
  }

  private def leftProjection(leftCols: Seq[String], keys: Seq[String],
      leftTime: String, outCols: Seq[String]): Seq[Column] =
    keys.map(col) ++
      Seq(col("__t").as(leftTime)) ++
      leftCols.filterNot(k => keys.contains(k) || k == leftTime).map(col) ++
      outCols.map(col)

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
    val tagged = taggedUnion(left, right, keys, leftTime, rightTime, valueCols)
    // right rows sort before left rows at equal time → inclusive (<=) match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(tagged) { case (df, (_, out)) =>
      df.withColumn(out, last(col(s"__v_$out"), ignoreNulls = true).over(w))
    }
    carried.where(col("__is_right") === 0)
      .select(leftProjection(left.columns.toIndexedSeq, keys, leftTime,
        valueCols.map(_._2)): _*)
  }

  /** Forward as-of: the EARLIEST right row at-or-after each left row's
    * time. The mirror of asofBackward: descending time sort, so
    * "preceding" rows are the later ones and right rows at equal time
    * still sort into the frame (inclusive match).
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    val tagged = taggedUnion(left, right, keys, leftTime, rightTime, valueCols)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(tagged) { case (df, (_, out)) =>
      df.withColumn(out, last(col(s"__v_$out"), ignoreNulls = true).over(w))
    }
    carried.where(col("__is_right") === 0)
      .select(leftProjection(left.columns.toIndexedSeq, keys, leftTime,
        valueCols.map(_._2)): _*)
  }

  /** Microsecond distance between two time columns (timestamp/date cast
    * exactly; numeric columns are taken as already-micros).
    */
  private def asMicros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case TimestampType => unix_micros(c)
      case DateType => unix_micros(c.cast("timestamp"))
      case _ => c.cast("long")
    }

  /** Nearest-within-tolerance as-of: the closer of the backward and
    * forward matches, null when neither lies within `toleranceMicros` of
    * the left time. Equal distance resolves backward (the convention that
    * makes "nearest" degrade to plain backward as tolerance grows on
    * time-skewed feeds). Both passes ride ONE shuffle: same partitioning,
    * two in-partition sorts.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)], toleranceMicros: Long): DataFrame = {
    val tagged = taggedUnion(left, right, keys, leftTime, rightTime, valueCols)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCarried = valueCols.foldLeft(
      tagged
        .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wb))
        .withColumn("__ft", last(col("__rt"), ignoreNulls = true).over(wf))) {
      case (df, (_, out)) =>
        df.withColumn(s"__b_$out", last(col(s"__v_$out"), ignoreNulls = true).over(wb))
          .withColumn(s"__f_$out", last(col(s"__v_$out"), ignoreNulls = true).over(wf))
    }
    val tDt = right.schema(rightTime).dataType
    val lt = asMicros(col("__t"), tDt)
    val bd = lt - asMicros(col("__bt"), tDt)
    val fd = asMicros(col("__ft"), tDt) - lt
    val tol = lit(toleranceMicros)
    val pickB = col("__bt").isNotNull && bd <= tol &&
      (col("__ft").isNull || fd > tol || bd <= fd)
    val pickF = !pickB && col("__ft").isNotNull && fd <= tol
    val out = valueCols.foldLeft(withCarried) { case (df, (_, o)) =>
      df.withColumn(o, when(pickB, col(s"__b_$o"))
        .when(pickF, col(s"__f_$o")))
    }
    out.where(col("__is_right") === 0)
      .select(leftProjection(left.columns.toIndexedSeq, keys, leftTime,
        valueCols.map(_._2)): _*)
  }
}
