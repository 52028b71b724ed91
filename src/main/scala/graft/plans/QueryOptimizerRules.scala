package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Descending, GreaterThanOrEqual, IntegerLiteral, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** The reference QueryOptimizer (grape-vector-db
  * src/query_engine.rs:236 OptimizationRule) re-expressed where query
  * optimization actually lives in Spark: injected Catalyst rules.
  *
  * - LimitMaxResults (max_limit=100 default) → [[CapResultLimit]]: a
  *   logical rewrite capping any literal LIMIT above the configured
  *   ceiling, so a runaway `LIMIT 1e9` top-k never materializes more
  *   than the ceiling per query. The cap value is session-configurable
  *   via `spark.graft.maxResultLimit` (absent = rule inert).
  * - MinSimilarityThreshold (min_threshold=0.1 default, raises any
  *   weaker per-query threshold, query_engine.rs:321-336) →
  *   [[MinSimilarityThreshold]]: inserts a `score >= threshold` Filter
  *   under every descending sort on a score column, so sub-threshold
  *   hits are dropped before the top-k materializes. Conf-keyed via
  *   `spark.graft.minSimilarityThreshold` (absent = rule inert).
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

/** Column-metadata tag marking graft similarity-score columns. Every
  * operator aliases its final score as `.as("score", ScoreTag.metadata)`,
  * and [[MinSimilarityThreshold]] keys on the tag — not the column
  * name — so a user query ordering by its OWN column that happens to
  * be called "score" is never rewritten. Metadata rides the Alias into
  * its AttributeReference and survives projection/sort resolution, so
  * the tag is visible wherever the attribute is referenced.
  */
object ScoreTag {
  val Key = "graft.score"
  val metadata: org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder().putBoolean(Key, true).build()
}

/** The reference's MinSimilarityThreshold optimization rule
  * (query_engine.rs:321-336: threshold = max(requested, configured),
  * injected when absent) as a Catalyst rewrite: under any global
  * descending sort whose leading key is a numeric graft score column —
  * the shape every graft search/top-k query plans — insert
  * `Filter(score >= threshold)` so sub-threshold rows are discarded at
  * the scan side of the sort instead of riding through the shuffle
  * into the client's page.
  *
  * The threshold is read from `spark.graft.minSimilarityThreshold` in
  * the score column's own units (graft scores are fixed-point longs —
  * see OracleNum.fx — so a 0.1 cosine floor at 1e4 scale is "1000").
  * Comparison happens after a cast to double, which is exact for every
  * fixed-point long the operators emit (< 2^53) and keeps the rule
  * type-agnostic across long/double score columns.
  *
  * SCOPE: the rule matches the [[ScoreTag]] column-metadata tag graft
  * operators stamp on their score outputs — the reference applies
  * min_score only inside its search path, and the tag is the
  * plan-level equivalent of "inside the search path". A non-graft
  * query ordering by its own column named "score" carries no tag and
  * is untouched even while the conf is set.
  */
object MinSimilarityThreshold extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.minSimilarityThreshold"

  private def threshold: Option[Double] = {
    val v = conf.getConfString(ConfKey, "")
    // toDoubleOption: a malformed conf value must degrade to "rule
    // inert", not throw NumberFormatException out of the optimizer
    // and fail every query in the session
    if (v.isEmpty) None else v.toDoubleOption
  }

  private def scoreKey(order: Seq[SortOrder]): Option[AttributeReference] =
    order.headOption.collect {
      case SortOrder(a: AttributeReference, Descending, _, _)
        if a.metadata.contains(ScoreTag.Key) &&
          a.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => a
    }

  /** Already guarded by this rule? (idempotence under the optimizer's
    * fixed-point iteration) */
  private def guarded(child: LogicalPlan, a: AttributeReference, thr: Double): Boolean =
    child match {
      case Filter(GreaterThanOrEqual(Cast(b: AttributeReference, DoubleType, _, _), Literal(t, DoubleType)), _) =>
        b.exprId == a.exprId && t == thr
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = threshold match {
    case None => plan
    case Some(thr) =>
      plan.transformUp {
        case s @ Sort(order, true, child, _) =>
          scoreKey(order) match {
            case Some(a) if !guarded(child, a, thr) =>
              s.copy(child = Filter(
                GreaterThanOrEqual(Cast(a, DoubleType), Literal(thr, DoubleType)), child))
            case _ => s
          }
      }
  }
}
