package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Query-result cache (reference grape-vector-db
  * src/query_engine.rs:79-113 execute_query cache path, :214
  * clear_cache, :221 get_cache_stats; TTL from
  * QueryEngineConfig.cache_ttl_seconds).
  *
  * The reference keys an in-memory HashMap by the serialized query
  * request. The Spark-first key is the CANONICALIZED analyzed logical
  * plan: two DataFrames built through different code paths but
  * describing the same computation hit the same entry (Catalyst
  * canonicalization normalizes expression ids, literal forms,
  * ordering of commutative children), and the cached payload is the
  * persisted DataFrame itself — partitions live distributed in
  * executor block storage, nothing result-sized ever sits on the
  * driver, so a "cache entry" costs the same at 100 TB as at 100 MB.
  *
  * Entries are LRU-bounded (access-ordered) and TTL-expired on
  * access; eviction and [[clear]] unpersist the backing blocks.
  * `clock` is injectable for deterministic TTL tests.
  */
class QueryCache(maxEntries: Int = 64,
                 ttlMs: Long = Long.MaxValue,
                 clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, at: Long)

  // access-order LinkedHashMap = LRU order for free
  private val entries =
    new java.util.LinkedHashMap[LogicalPlan, Entry](16, 0.75f, true)
  private var hitCount = 0L
  private var missCount = 0L

  /** Serve `build`'s result through the cache: a semantically equal
    * plan within TTL returns the already-persisted frame (hit);
    * otherwise the new frame is persisted and registered (miss).
    */
  def getOrRun(build: => DataFrame): DataFrame = synchronized {
    val df = build
    val key = df.queryExecution.analyzed.canonicalized
    val now = clock()
    val e = entries.get(key)
    if (e != null && now - e.at <= ttlMs) {
      hitCount += 1
      e.df
    } else {
      if (e != null) { // expired: drop the stale blocks
        e.df.unpersist()
        entries.remove(key)
      }
      missCount += 1
      df.persist(StorageLevel.MEMORY_AND_DISK)
      entries.put(key, Entry(df, now))
      if (entries.size > maxEntries) {
        val oldest = entries.entrySet().iterator().next()
        oldest.getValue.df.unpersist()
        entries.remove(oldest.getKey)
      }
      df
    }
  }

  /** (hits, misses) — get_cache_stats. */
  def stats: (Long, Long) = synchronized { (hitCount, missCount) }

  def size: Int = synchronized { entries.size }

  /** Drop every entry and its persisted blocks — clear_cache. */
  def clear(): Unit = synchronized {
    entries.values.forEach(e => { e.df.unpersist(); () })
    entries.clear()
  }
}

/** Driver-side embedding cache (reference performance/
  * cache_manager.rs:73 get_embedding / :78 set_embedding, sized by
  * config.rs CacheConfig.embedding_cache_size): query texts repeat
  * far more than documents do, and re-embedding the same query on
  * every search is pure waste — the reference memoizes text→vector on
  * the serving node, and so does graft's point-serving tier. LRU +
  * TTL + hit/miss stats, same lifecycle contract as [[QueryCache]];
  * values are tiny (dim doubles), so even the default 10k entries are
  * a few hundred KB. Corpus-side batch embedding never goes through
  * here — that is a distributed scan+map ([[operators.Embeddings]]).
  */
class EmbeddingCache(maxEntries: Int = 10000,
                     ttlMs: Long = Long.MaxValue,
                     clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(vec: Array[Double], at: Long)

  private val entries =
    new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)
  private var hitCount = 0L
  private var missCount = 0L

  /** Serve `compute(text)` through the cache (cache_manager.rs
    * get_embedding-or-compute-then-set shape).
    */
  def getOrCompute(text: String)(compute: String => Array[Double]): Array[Double] =
    synchronized {
      val now = clock()
      val e = entries.get(text)
      if (e != null && now - e.at <= ttlMs) {
        hitCount += 1
        e.vec
      } else {
        if (e != null) entries.remove(text)
        missCount += 1
        val vec = compute(text)
        entries.put(text, Entry(vec, now))
        if (entries.size > maxEntries)
          entries.remove(entries.entrySet().iterator().next().getKey)
        vec
      }
    }

  def stats: (Long, Long) = synchronized { (hitCount, missCount) }

  def size: Int = synchronized { entries.size }

  def clear(): Unit = synchronized { entries.clear() }
}
