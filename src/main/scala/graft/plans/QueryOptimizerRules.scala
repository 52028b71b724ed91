package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, IntegerLiteral, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** The reference QueryOptimizer (grape-vector-db
  * src/query_engine.rs:236 OptimizationRule) re-expressed where query
  * optimization actually lives in Spark: injected Catalyst rules.
  *
  * - LimitMaxResults (max_limit=100 default) → [[CapResultLimit]]: a
  *   logical rewrite capping any literal LIMIT above the configured
  *   ceiling, so a runaway `LIMIT 1e9` top-k never materializes more
  *   than the ceiling per query. The cap value is session-configurable
  *   via `spark.graft.maxResultLimit` (absent = rule inert).
  * - MinSimilarityThreshold → expressed as a plain Filter on the score
  *   column by the operator builders (predicate pushdown handles it);
  *   no plan rewrite needed.
  * - QueryRewrite (string pattern substitution) → subsumed by
  *   Catalyst's expression canonicalization/constant folding.
  */
object CapResultLimit extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.maxResultLimit"

  private def cap(plan: LogicalPlan): Option[Int] = {
    val v = conf.getConfString(ConfKey, "")
    if (v.isEmpty) None else Some(v.toInt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = cap(plan) match {
    case None => plan
    case Some(max) =>
      plan.transformUp {
        case GlobalLimit(IntegerLiteral(n), child) if n > max =>
          GlobalLimit(Literal(max), child)
        case LocalLimit(IntegerLiteral(n), child) if n > max =>
          LocalLimit(Literal(max), child)
      }
  }
}
