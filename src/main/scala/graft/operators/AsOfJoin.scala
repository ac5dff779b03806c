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
  * right-side ROW across with last_value(ignoreNulls) over one
  * (key, time) sort — a single shuffle, no range/nested-loop join, no
  * per-row subquery. The forward pass is the same window with the sort
  * REVERSED, so backward+forward together still cost one Exchange (the
  * partitioning is identical; Spark re-sorts between the two Window
  * operators without reshuffling). This is the plan shape that survives
  * a 1000-executor cluster: partition by key, sort within partition,
  * stream.
  *
  * The carried unit is a STRUCT of (right time, value columns), so the
  * matched row's time and values always travel together: a right row
  * whose value column is NULL is still the match (and surfaces its
  * null), it is never skipped in favor of an older row's value — the
  * struct is non-null exactly for right rows, which is what
  * ignoreNulls skips on.
  *
  * Ties (equal times on both sides) resolve inclusively in BOTH
  * directions — a right row at exactly the left row's time matches, like
  * DuckDB/QuestDB ASOF JOIN. Nearest at equal distance resolves backward.
  */
object AsOfJoin {

  /** Tag + union the two sides: right rows carry ONE `__r` struct
    * (`__rt` = right time, then the renamed value columns); left rows
    * carry their payload columns and a typed-null `__r`.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    val rStruct = struct(col(rightTime).as("__rt") +:
      valueCols.map { case (in, out) => col(in).as(out) }: _*)
    val rType = right.select(rStruct.as("__r")).schema.head.dataType
    left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__is_right"),
          lit(null).cast(rType).as("__r")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
      .unionByName(
        right.select(
          keys.map(col) ++
            Seq(col(rightTime).as("__t"), lit(1).as("__is_right"),
              rStruct.as("__r")) ++
            leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*))
  }

  private def leftProjection(leftCols: Seq[String], keys: Seq[String],
      leftTime: String, carried: Column, outCols: Seq[String]): Seq[Column] =
    keys.map(col) ++
      Seq(col("__t").as(leftTime)) ++
      leftCols.filterNot(k => keys.contains(k) || k == leftTime).map(col) ++
      outCols.map(o => carried.getField(o).as(o))

  private def directional(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)], descending: Boolean): DataFrame = {
    val tagged = taggedUnion(left, right, keys, leftTime, rightTime, valueCols)
    // right rows sort before left rows at equal time → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (descending) col("__t").desc else col("__t").asc,
        col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__is_right") === 0)
      .select(leftProjection(left.columns.toIndexedSeq, keys, leftTime,
        col("__m"), valueCols.map(_._2)): _*)
  }

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are carried)
    * @param keys      equi-join keys
    * @param leftTime  ordering column on `left`
    * @param rightTime ordering column on `right`
    * @param valueCols right-side columns to surface, renamed as given
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)]): DataFrame =
    directional(left, right, keys, leftTime, rightTime, valueCols,
      descending = false)

  /** Forward as-of: the EARLIEST right row at-or-after each left row's
    * time. The mirror of asofBackward: descending time sort, so
    * "preceding" rows are the later ones and right rows at equal time
    * still sort into the frame (inclusive match).
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)]): DataFrame =
    directional(left, right, keys, leftTime, rightTime, valueCols,
      descending = true)

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
    val withCarried = tagged
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(wf))
    val tDt = right.schema(rightTime).dataType
    val lt = asMicros(col("__t"), tDt)
    val bt = col("__b").getField("__rt")
    val ft = col("__f").getField("__rt")
    val bd = lt - asMicros(bt, tDt)
    val fd = asMicros(ft, tDt) - lt
    val tol = lit(toleranceMicros)
    val pickB = bt.isNotNull && bd <= tol &&
      (ft.isNull || fd > tol || bd <= fd)
    val pickF = !pickB && ft.isNotNull && fd <= tol
    withCarried
      .withColumn("__m", when(pickB, col("__b")).when(pickF, col("__f")))
      .where(col("__is_right") === 0)
      .select(leftProjection(left.columns.toIndexedSeq, keys, leftTime,
        col("__m"), valueCols.map(_._2)): _*)
  }
}
