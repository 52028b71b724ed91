package graft

import graft.operators.{Bm25, VectorSearch}
import org.apache.spark.storage.StorageLevel

/** The query-result cache must key on plan SEMANTICS (not object
  * identity), honor TTL and the LRU bound, and release persisted
  * blocks on eviction/clear — the reference QueryEngine cache
  * contract (query_engine.rs execute_query / clear_cache /
  * get_cache_stats).
  */
class QueryCacheSpec extends GraftSuite {

  test("semantically equal plans hit; different parameters miss") {
    val qc = new QueryCache()
    val a = qc.getOrRun(VectorSearch.semanticTopK(spark, sf, qid = 0, k = 10))
    val first = a.collect().toSeq
    // a fresh DataFrame object, same computation → HIT returns the
    // same persisted frame
    val b = qc.getOrRun(VectorSearch.semanticTopK(spark, sf, qid = 0, k = 10))
    assert(b eq a)
    assert(qc.stats == (1L, 1L))
    // different parameter → different canonical plan → MISS
    qc.getOrRun(VectorSearch.semanticTopK(spark, sf, qid = 1, k = 10))
    assert(qc.stats == (1L, 2L))
    // and a different operator entirely → MISS
    qc.getOrRun(Bm25.textSearch(spark, sf))
    assert(qc.stats == (1L, 3L))
    assert(b.collect().toSeq == first)
    qc.clear()
  }

  test("TTL expires entries; expiry unpersists the stale frame") {
    var now = 0L
    val qc = new QueryCache(ttlMs = 100L, clock = () => now)
    val a = qc.getOrRun(Bm25.textSearch(spark, sf))
    now = 100L // exactly at TTL: still fresh
    assert(qc.getOrRun(Bm25.textSearch(spark, sf)) eq a)
    now = 201L // past TTL: stale → miss, fresh frame persisted
    val b = qc.getOrRun(Bm25.textSearch(spark, sf))
    assert(!(b eq a))
    // storageLevel is plan-keyed (CacheManager), so after the refresh
    // the plan is persisted again — the observable TTL contract is the
    // miss + replacement
    assert(b.storageLevel != StorageLevel.NONE)
    assert(qc.stats == (1L, 2L))
    qc.clear()
    assert(b.storageLevel == StorageLevel.NONE)
  }

  test("LRU bound evicts the least-recently-used entry and its blocks") {
    val qc = new QueryCache(maxEntries = 2)
    val a = qc.getOrRun(VectorSearch.semanticTopK(spark, sf, qid = 0, k = 5))
    val b = qc.getOrRun(VectorSearch.semanticTopK(spark, sf, qid = 1, k = 5))
    qc.getOrRun(VectorSearch.semanticTopK(spark, sf, qid = 0, k = 5)) // touch a
    qc.getOrRun(VectorSearch.semanticTopK(spark, sf, qid = 2, k = 5)) // evicts b
    assert(qc.size == 2)
    assert(b.storageLevel == StorageLevel.NONE, "evicted entry still persisted")
    assert(a.storageLevel != StorageLevel.NONE, "recently-used entry evicted")
    qc.clear()
    assert(qc.size == 0)
    assert(a.storageLevel == StorageLevel.NONE)
  }
}
