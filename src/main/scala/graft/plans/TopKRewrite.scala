package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (tier b of the extension ladder, completing
  * expression → rule → strategy → physical plan): recognize the
  * composable top-k idiom
  *
  * {{{
  *   df.withColumn("rk", row_number().over(partitionBy(K).orderBy(O)))
  *     .filter($"rk" <= k)
  *     .select(cols not including rk)
  * }}}
  *
  * i.e. `Project(cols, Filter(rk <= k, Window(row_number over (K, O))))`
  * where the rank column is projected AWAY, and rewrite it to the
  * heap-based [[TopKPerKey]] operator: O(n log k) bounded-heap
  * selection instead of a full per-group sort, no rank column ever
  * materialized. Users keep writing the idiomatic window form and get
  * the custom operator transparently.
  *
  * Safety: only fires when (a) the window has exactly the row_number
  * frame, (b) the filter condition is a pure rank-vs-literal bound,
  * (c) nothing downstream references the rank attribute (the Project
  * drops it), and (d) the partition spec is non-empty (a global top-k
  * belongs to TakeOrderedAndProject instead). Ties beyond the ordering
  * are broken arbitrarily — exactly row_number's own contract.
  *
  * If Spark's own InferWindowGroupLimit already inserted a
  * WindowGroupLimit below the Window, it is stripped: TopKPerKey
  * performs the same bound (and more) after the exchange.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** rank <= k / rank < k in either literal position → retained k. */
  private def rankBound(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(partitionSpec, orderSpec,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)
            if partitionSpec.nonEmpty &&
              projectList.forall(ne => !ne.exists(_.semanticEquals(alias.toAttribute))) =>
          rankBound(cond, alias.toAttribute) match {
            case Some(k) if k > 0 =>
              // strip Spark's own group-limit node ONLY when it provably
              // belongs to this window (same partition/order specs, a
              // row_number rank, and a limit that keeps at least our k) —
              // TopKPerKey subsumes that bound. A WindowGroupLimit with
              // ANY other shape (a future rule, a third-party plan) has
              // row-pruning semantics of its own, so the rewrite backs
              // off entirely rather than silently dropping it.
              val strippedChild: Option[LogicalPlan] = w.child match {
                case WindowGroupLimit(ps, os, fn, limit, grandChild) =>
                  val sameSpecs =
                    ps.length == partitionSpec.length &&
                      ps.zip(partitionSpec).forall { case (x, y) => x.semanticEquals(y) } &&
                      os.length == orderSpec.length &&
                      os.zip(orderSpec).forall { case (x, y) => x.semanticEquals(y) }
                  if (sameSpecs && fn.isInstanceOf[RowNumber] && limit >= k)
                    Some(grandChild)
                  else None
                case c => Some(c)
              }
              strippedChild match {
                case Some(child) =>
                  Project(projectList, TopKPerKey(partitionSpec, orderSpec, k, child))
                case None => p
              }
            case _ => p
          }
        case _ => p
      }
  }
}

/** Live-session switches (the SparkSessionExtensions path applies at
  * builder time; these work on an existing session).
  */
object TopKRewrite {
  def enable(spark: SparkSession): Unit = {
    ColumnBridge.addStrategy(spark, TopKStrategy)
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
}
