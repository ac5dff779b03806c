package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Literal, Multiply, Round, Subtract}
import org.apache.spark.sql.types.DecimalType

/** pct_change(cur, prev): the reference's percentage-change formula
  * (Fx_1min.py:207-210) as a RuntimeReplaceable expression — it
  * disappears into `round(cast((cur-prev)/prev*100 as decimal), 2)` at
  * analysis time, so it costs nothing at runtime while giving SQL users
  * the reference's semantics (decimal HALF_UP rounding included) by name.
  */
case class PctChange(cur: Expression, prev: Expression)
    extends RuntimeReplaceable {
  // built fully typed (casts + double literal): a RuntimeReplaceable's
  // replacement must resolve as-is — analyzer type coercion does not run
  // inside it
  override lazy val replacement: Expression = {
    val c = Cast(cur, org.apache.spark.sql.types.DoubleType)
    val p = Cast(prev, org.apache.spark.sql.types.DoubleType)
    Round(Cast(
      Multiply(Divide(Subtract(c, p), p), Literal(100.0)),
      DecimalType(28, 10)), Literal(2))
  }
  override def children: Seq[Expression] = Seq(cur, prev)
  override def prettyName: String = "pct_change"
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PctChange = copy(cur = c(0), prev = c(1))
}

/** Function registration, both as library Columns and as SQL names —
  * per-session (`register`) or at session build time via
  * SparkSessionExtensions (`new GraftExtensions`).
  */
object GraftFunctions {

  def cosine_sim(a: Column, b: Column): Column = CosineSimilarity(a, b)

  def pct_change(cur: Column, prev: Column): Column =
    GraftBridge.column(PctChange(
      GraftBridge.expression(cur), GraftBridge.expression(prev)))

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es(0), es(1))),
    "rolling_hash64" -> (es => RollingHash64(es(0))),
    "pct_change" -> (es => PctChange(es(0), es(1))))

  /** Register into an existing session (usable from spark.sql), including
    * the optimizer identities via the public experimental hook.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(FoldSelfIntersect))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FoldSelfIntersect
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * function surface at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("pct_change"),
      new ExpressionInfo(classOf[PctChange].getName, "pct_change"),
      (es: Seq[Expression]) => PctChange(es(0), es(1))))
    e.injectOptimizerRule(_ => FoldSelfIntersect)
  }
}
