package graft

import graft.operators.{Bm25, HybridSearch}

class RetrievalSpec extends GraftSuite {

  test("query tokenizer mirrors the corpus tokenizer semantics") {
    assert(Bm25.tokenizeQuery("The FAST, fast query!! a to") == Seq("fast", "query"))
    assert(Bm25.tokenizeQuery("x y") == Seq())
  }

  test("bm25 returns scored docs for corpus terms") {
    val rows = Bm25.search(spark, sf, "spark vector join", 15).collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getAs[Long]("score")).toSeq
    assert(scores == scores.sortBy(-_))
    // raw reference IDF ln((N-df+0.5)/(df+0.5)) goes negative when a
    // term is in >half the corpus (true at sf0.001) — scores just
    // need to be finite and ordered, not positive
    assert(scores.distinct.size > 1)
  }

  test("bm25 of an absent term is empty") {
    assert(Bm25.search(spark, sf, "zzzqqqxyzzy", 10).count() == 0)
  }

  test("text search counts containment per query term") {
    val rows = Bm25.textSearch(spark, sf, "spark vector", 10).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val s = r.getAs[Long]("score"); s >= 1 && s <= 2
    })
  }

  test("rrf fusion rewards docs found by multiple branches") {
    val rows = HybridSearch.rrf(spark, sf).collect()
    assert(rows.length == 20)
    val multi = rows.filter(_.getAs[Long]("n_branches") > 1)
    // fused list should contain at least one multi-branch doc, ranked high
    assert(multi.nonEmpty)
    val scores = rows.map(_.getAs[Long]("rrf_score")).toSeq
    assert(scores == scores.sortBy(-_))
  }

  test("linear fusion combines weighted branch scores") {
    val rows = HybridSearch.linear(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Long]("score") > 0))
  }

  test("learned fusion boosts weights by branch quality but preserves top-k size") {
    val rows = HybridSearch.learned(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Long]("score")).toSeq
    assert(scores == scores.sortBy(-_))
    // quality-boosted weights scale every branch up (w_i >= base_i),
    // so the fused best score must be >= the plain linear one
    val linBest = HybridSearch.linear(spark, sf).collect().head.getAs[Long]("score")
    assert(scores.head >= linBest)
  }

  test("adaptive fusion with empty history is identical to linear fusion") {
    import spark.implicits._
    val empty = Seq.empty[(String, Option[Double])].toDF("query_text", "satisfaction")
    val ad = HybridSearch.adaptive(spark, sf, empty).collect().toSeq
    val lin = HybridSearch.linear(spark, sf).collect().toSeq
    assert(ad == lin)
  }

  test("adaptive fusion shifts weight off the dense branch on low satisfaction") {
    val ad = HybridSearch.adaptiveDemo(spark, sf).collect()
    assert(ad.length == 20)
    // demo history avg satisfaction = (0.4 + 0.6 + 0) / 3 < 0.6 →
    // weights (0.45, 0.33, 0.21) ≠ linear's (0.5, 0.3, 0.2)
    val lin = HybridSearch.linear(spark, sf).collect()
    assert(ad.map(_.getAs[Long]("score")).toSeq !=
           lin.map(_.getAs[Long]("score")).toSeq)
  }
}
