package graft

import graft.functions.expressions.{CosineSim, DotProd}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions, so `spark.sql("SELECT
  * cosine_sim(a, b) ...")` plans the same fused codegen kernels the
  * DataFrame API uses, and injects the reference QueryOptimizer's
  * LimitMaxResults as a Catalyst rewrite
  * ([[graft.plans.CapResultLimit]]).
  *
  * Wire up via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_prod"),
      new ExpressionInfo(classOf[DotProd].getName, "dot_prod"),
      (args: Seq[Expression]) => DotProd(args(0), args(1))))
    ext.injectOptimizerRule(_ => graft.plans.CapResultLimit)
    ext.injectOptimizerRule(_ => graft.plans.MinSimilarityThreshold)
  }
}
