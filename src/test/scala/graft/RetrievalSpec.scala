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
}
