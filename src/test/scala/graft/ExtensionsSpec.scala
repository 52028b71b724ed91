package graft

import graft.operators.{DocOps, HybridSearch}
import graft.sources.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

class ExtensionsSpec extends GraftSuite {

  test("SQL functions cosine_sim / dot_prod register via extensions") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "dot_prod(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 11.0)
    } finally s2.close()
  }

  test("normalized fusion bounds branch scores to [0,1] weights") {
    val rows = HybridSearch.normalized(spark, sf).collect()
    assert(rows.length == 20)
    // max possible fused score = sum of weights = 1.0
    assert(rows.forall(r => r.getAs[Long]("score") <= 1000000L))
  }

  test("cursor scroll seeks past the cursor without OFFSET") {
    val rows = DocOps.scroll(spark, sf, cursor = 199, pageSize = 50).collect()
    assert(rows.length == 50)
    assert(rows.head.getAs[Long]("doc_id") == 200)
    val plan = DocOps.scroll(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(doc_id,199)"), s"seek not pushed:\n$plan")
  }

  test("ingest dedups by content hash and partitions by lang") {
    val out = java.nio.file.Files.createTempDirectory("graft_store").toString
    Ingest.ingestDocuments(spark, sf, out)
    val written = spark.read.parquet(out)
    assert(written.count() == written.select(col("content_hash")).distinct().count())
    // partition pruning works: per-lang read touches one directory
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("lang=")))
    assert(written.filter(col("lang") === "en").count() > 0)
  }
}
