package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, If, IsNull, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule for the custom expression vocabulary (the
  * injectOptimizerRule surface): algebraic identities Catalyst cannot know
  * about third-party expressions.
  *
  * `sorted_intersect_count(x, x)` ≡ `size(x)` — exactly, because the
  * two-pointer merge over two identical sorted arrays counts every
  * element (pure integer semantics, unlike a floating-point identity such
  * as cosine_sim(x,x)≈1, which would NOT be safe to fold). The identity
  * appears on the diagonal of self-join similarity pipelines; folding it
  * removes an O(|x|) loop per row. Null behavior is preserved via an
  * explicit null check on the child.
  */
object FoldSelfIntersect extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SortedIntersectCount(a, b) if a.semanticEquals(b) && a.deterministic =>
        If(IsNull(a), Literal.create(null, LongType),
          Cast(Size(a), LongType))
    }
}
