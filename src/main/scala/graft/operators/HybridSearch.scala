package graft.operators

import graft.OracleNum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse the dense (cosine), sparse (BM25) and plain
  * text branches.
  *
  * Reference surface: grape-vector-db src/hybrid.rs — rrf_fusion
  * (score = sum over branches of 1/(k + rank), k=60 conventionally)
  * and linear_fusion (weighted raw scores, missing branch = 0).
  *
  * Scale design: each branch is itself a top-N (N = 2*limit, as the
  * reference oversamples) so fusion operates on a few hundred rows
  * regardless of corpus size — union + groupBy on a driver-trivial
  * set. The expensive work stays in the branch scans, which keep
  * their own pushdown/top-k properties.
  */
object HybridSearch {
  import OracleNum.{fx, fxSql}

  val RrfK = 60.0

  /** Ranked (doc_id, rank) for the dense branch: cosine vs query
    * vector `qid`, ranks on the fixed-point score with id tie-break
    * so both engines rank identically.
    */
  private def denseRanked(spark: SparkSession, dir: String, qid: Long, n: Int): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("vec_id"))
    VectorSearch.semanticTopK(spark, dir, qid, n)
      .withColumn("rank", row_number().over(w))
      .select(col("vec_id").as("doc_id"), col("rank"))
  }

  private def sparseRanked(spark: SparkSession, dir: String, query: String, n: Int): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    Bm25.search(spark, dir, query, n)
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("rank"))
  }

  private def textRanked(spark: SparkSession, dir: String, query: String, n: Int): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    Bm25.textSearch(spark, dir, query, n)
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("rank"))
  }

  /** RRF fusion (reference src/hybrid.rs:421): each branch
    * contributes 1/(k + rank); docs appearing in more branches rise.
    */
  def rrf(spark: SparkSession, dir: String, qid: Long = 0,
          query: String = Bm25.DefaultQuery, limit: Int = 20): DataFrame = {
    val n = limit * 2
    val branches = denseRanked(spark, dir, qid, n)
      .unionByName(sparseRanked(spark, dir, query, n))
      .unionByName(textRanked(spark, dir, query, n))
    branches
      .groupBy(col("doc_id"))
      .agg(fx(sum(lit(1.0) / (lit(RrfK) + col("rank"))), 6).as("rrf_score"),
           count(lit(1)).as("n_branches"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(limit)
  }

  def rrfSql(qid: Long = 0, query: String = Bm25.DefaultQuery, limit: Int = 20): String = {
    val n = limit * 2
    s"""WITH dense AS (
       |  SELECT vec_id AS doc_id,
       |    row_number() OVER (ORDER BY score DESC, vec_id) AS rank
       |  FROM (${VectorSearch.semanticTopKSql(qid, n)})
       |), sparse AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM (${Bm25.searchSql(query, n)})
       |), txt AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM (${Bm25.textSearchSql(query, n)})
       |), branches AS (
       |  SELECT * FROM dense UNION ALL SELECT * FROM sparse UNION ALL SELECT * FROM txt
       |)
       |SELECT doc_id,
       |  ${fxSql(s"SUM(1.0 / ($RrfK + rank))", 6)} AS rrf_score,
       |  COUNT(*) AS n_branches
       |FROM branches
       |GROUP BY doc_id
       |ORDER BY rrf_score DESC, doc_id
       |LIMIT $limit""".stripMargin
  }

  val DenseWeight  = 0.5
  val SparseWeight = 0.3
  val TextWeight   = 0.2

  /** Normalized fusion (reference src/hybrid.rs normalized_fusion):
    * each branch is min-max normalized to [0,1] over its own top-N
    * before weighting, so no branch's score scale dominates. The
    * min/max are per-branch scalar aggregates over <=2*limit rows —
    * free at any corpus size.
    */
  def normalized(spark: SparkSession, dir: String, qid: Long = 0,
                 query: String = Bm25.DefaultQuery, limit: Int = 20): DataFrame = {
    val n = limit * 2
    def norm(df: DataFrame, idCol: String): DataFrame = {
      val stats = df.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
      df.crossJoin(broadcast(stats))
        .select(col(idCol).as("doc_id"),
          when(col("hi") === col("lo"), lit(1.0))
            .otherwise((col("score") - col("lo")).cast("double") /
                       (col("hi") - col("lo")).cast("double")).as("ns"))
    }
    val dense  = norm(VectorSearch.semanticTopK(spark, dir, qid, n), "vec_id")
      .select(col("doc_id"), col("ns").as("dense_s"))
    val sparse = norm(Bm25.search(spark, dir, query, n), "doc_id")
      .select(col("doc_id"), col("ns").as("sparse_s"))
    val txt    = norm(Bm25.textSearch(spark, dir, query, n), "doc_id")
      .select(col("doc_id"), col("ns").as("text_s"))
    dense
      .join(sparse, Seq("doc_id"), "full_outer")
      .join(txt, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        fx(coalesce(col("dense_s"), lit(0.0)) * DenseWeight +
           coalesce(col("sparse_s"), lit(0.0)) * SparseWeight +
           coalesce(col("text_s"), lit(0.0)) * TextWeight, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }

  def normalizedSql(qid: Long = 0, query: String = Bm25.DefaultQuery, limit: Int = 20): String = {
    val n = limit * 2
    def normCte(src: String, idCol: String): String =
      s"""SELECT $idCol AS doc_id,
         |    CASE WHEN hi = lo THEN 1.0
         |         ELSE (score - lo)::DOUBLE / (hi - lo)::DOUBLE END AS ns
         |  FROM ($src) b, (SELECT MIN(score) AS lo, MAX(score) AS hi FROM ($src)) s""".stripMargin
    s"""WITH dense AS (
       |  ${normCte(VectorSearch.semanticTopKSql(qid, n), "vec_id")}
       |), sparse AS (
       |  ${normCte(Bm25.searchSql(query, n), "doc_id")}
       |), txt AS (
       |  ${normCte(Bm25.textSearchSql(query, n), "doc_id")}
       |)
       |SELECT COALESCE(dense.doc_id, sparse.doc_id, txt.doc_id) AS doc_id,
       |  ${fxSql(s"COALESCE(dense.ns, 0.0) * $DenseWeight + COALESCE(sparse.ns, 0.0) * $SparseWeight + COALESCE(txt.ns, 0.0) * $TextWeight", 6)} AS score
       |FROM dense
       |FULL OUTER JOIN sparse ON dense.doc_id = sparse.doc_id
       |FULL OUTER JOIN txt ON COALESCE(dense.doc_id, sparse.doc_id) = txt.doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $limit""".stripMargin
  }

  /** Linear weighted fusion (reference src/hybrid.rs linear_fusion):
    * weighted sum of branch scores, absent branch contributes 0.
    * Branch scores are fixed-point longs (deterministic cross-engine)
    * re-scaled back to doubles before weighting.
    */
  def linear(spark: SparkSession, dir: String, qid: Long = 0,
             query: String = Bm25.DefaultQuery, limit: Int = 20): DataFrame = {
    val n = limit * 2
    val dense = VectorSearch.semanticTopK(spark, dir, qid, n)
      .select(col("vec_id").as("doc_id"), (col("score") / 1e4).as("dense_s"))
    val sparse = Bm25.search(spark, dir, query, n)
      .select(col("doc_id"), (col("score") / 1e6).as("sparse_s"))
    val txt = Bm25.textSearch(spark, dir, query, n)
      .select(col("doc_id"), col("score").cast("double").as("text_s"))
    dense
      .join(sparse, Seq("doc_id"), "full_outer")
      .join(txt, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        fx(coalesce(col("dense_s"), lit(0.0)) * DenseWeight +
           coalesce(col("sparse_s"), lit(0.0)) * SparseWeight +
           coalesce(col("text_s"), lit(0.0)) * TextWeight, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }

  def linearSql(qid: Long = 0, query: String = Bm25.DefaultQuery, limit: Int = 20): String = {
    val n = limit * 2
    s"""WITH dense AS (
       |  SELECT vec_id AS doc_id, score / 1e4 AS dense_s
       |  FROM (${VectorSearch.semanticTopKSql(qid, n)})
       |), sparse AS (
       |  SELECT doc_id, score / 1e6 AS sparse_s
       |  FROM (${Bm25.searchSql(query, n)})
       |), txt AS (
       |  SELECT doc_id, score::DOUBLE AS text_s
       |  FROM (${Bm25.textSearchSql(query, n)})
       |)
       |SELECT COALESCE(dense.doc_id, sparse.doc_id, txt.doc_id) AS doc_id,
       |  ${fxSql(s"COALESCE(dense_s, 0.0) * $DenseWeight + COALESCE(sparse_s, 0.0) * $SparseWeight + COALESCE(text_s, 0.0) * $TextWeight", 6)} AS score
       |FROM dense
       |FULL OUTER JOIN sparse ON dense.doc_id = sparse.doc_id
       |FULL OUTER JOIN txt ON COALESCE(dense.doc_id, sparse.doc_id) = txt.doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $limit""".stripMargin
  }
}
