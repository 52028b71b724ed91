package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends GraftSuite {

  test("native cosine expression matches the HOF formulation bit-for-bit") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        cosineSimilarity(col("emb"), col("qv")).as("native"),
        cosineSimilarityHof(col("emb"), col("qv")).as("hof"),
        dotProduct(col("emb"), col("qv")).as("native_dot"),
        dotProductHof(col("emb"), col("qv")).as("hof_dot"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "cosine mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "dot mismatch")
    }
  }

  test("native cosine runs inside whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select(cosineSimilarity(col("emb"), col("qv")).as("s"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators render with a "*(stage)" prefix; the cosine
    // projection must carry one (CodegenFallback exprs would drop it)
    assert(plan.linesIterator.exists(l => l.contains("cosinesim") && l.contains("*(")),
      s"cosine projection not inside a codegen stage:\n$plan")
  }

  test("zero-norm vectors score 0.0 like the reference") {
    import spark.implicits._
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(cosineSimilarity(col("a"), col("b"))).head.getDouble(0) == 0.0)
  }
}
