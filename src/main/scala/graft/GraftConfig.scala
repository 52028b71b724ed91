package graft

/** Engine configuration mirroring the reference's config surface
  * (grape-vector-db src/config.rs:169 VectorDbConfig and its nested
  * BM25Config :94, HybridWeights :73, HybridSearchConfig :115,
  * QueryConfig :252, CacheConfig :244; lib.rs:555 get_config).
  *
  * Defaults reproduce graft's oracle-checked constants (Bm25.K1/B,
  * HybridSearch.DenseWeight/SparseWeight/TextWeight, the facade's
  * limit/threshold defaults) so a default-configured handle is
  * bit-identical to the bare operators; the reference ships different
  * fusion defaults (0.7/0.2/0.1 — config.rs:82) which a user can set
  * here without touching any operator. Config knobs that Spark itself
  * owns at scale (timeouts, concurrency, memory ceilings — the
  * reference's ApiLimitsConfig/PerformanceConfig) are deliberately NOT
  * duplicated: `spark.conf` is their home and re-wrapping it would
  * shadow the real settings.
  */
object GraftConfig {

  /** Fusion strategies the facade dispatches (types.rs FusionStrategy;
    * adaptive is excluded here because it needs a history relation —
    * HybridSearch.adaptive takes it explicitly).
    */
  val Strategies: Set[String] = Set("rrf", "linear", "normalized", "learned")

  /** BM25 scoring parameters (config.rs:94 BM25Config). */
  final case class Bm25Config(k1: Double = operators.Bm25.K1,
                              b: Double = operators.Bm25.B)

  /** Linear/normalized fusion weights (config.rs:73 HybridWeights). */
  final case class HybridWeights(
      dense: Double = operators.HybridSearch.DenseWeight,
      sparse: Double = operators.HybridSearch.SparseWeight,
      text: Double = operators.HybridSearch.TextWeight)

  /** Fusion-strategy selection (config.rs:115 HybridSearchConfig). */
  final case class HybridSearchConfig(fusionStrategy: String = "rrf",
                                      weights: HybridWeights = HybridWeights(),
                                      bm25: Bm25Config = Bm25Config(),
                                      maxCandidates: Int = 100)

  /** Search-limit and threshold defaults (config.rs:252 QueryConfig). */
  final case class QueryConfig(defaultLimit: Int = 20,
                               maxLimit: Int = 100,
                               similarityThreshold: Double = 0.25)

  /** Cache sizing (config.rs:244 CacheConfig; performance/
    * cache_manager.rs:17). TTL in millis — `Long.MaxValue` = never.
    */
  final case class CacheConfig(embeddingCacheSize: Int = 10000,
                               queryCacheSize: Int = 64,
                               ttlMs: Long = Long.MaxValue)

  /** Chunking geometry (config.rs:39 ContentAnalysisConfig
    * chunk_size/chunk_overlap; graft's oracle-checked defaults).
    */
  final case class ChunkConfig(size: Int = operators.TextAnalysis.ChunkSize,
                               overlap: Int = operators.TextAnalysis.ChunkOverlap)

  /** Index-maintenance thresholds (performance/index_optimizer.rs:51
    * should_optimize; config.rs:56 index_rebuild_threshold).
    */
  final case class IndexConfig(rebuildAppendedFraction: Double = 0.2,
                               rebuildMaxGenerations: Int = 64)
}

final case class GraftConfig(
    vectorDimension: Int = 8,
    hybridSearch: GraftConfig.HybridSearchConfig = GraftConfig.HybridSearchConfig(),
    query: GraftConfig.QueryConfig = GraftConfig.QueryConfig(),
    cache: GraftConfig.CacheConfig = GraftConfig.CacheConfig(),
    chunk: GraftConfig.ChunkConfig = GraftConfig.ChunkConfig(),
    index: GraftConfig.IndexConfig = GraftConfig.IndexConfig()) {

  /** Structural validation (the reference validates on load; a bad
    * knob should fail the handle constructor, not the first query a
    * thousand tasks in). Returns every violation, empty = valid.
    */
  def validate: Seq[String] = {
    val es = Seq.newBuilder[String]
    if (vectorDimension <= 0) es += s"vectorDimension must be > 0 (got $vectorDimension)"
    if (hybridSearch.bm25.k1 <= 0) es += s"bm25.k1 must be > 0 (got ${hybridSearch.bm25.k1})"
    if (hybridSearch.bm25.b < 0 || hybridSearch.bm25.b > 1)
      es += s"bm25.b must be in [0,1] (got ${hybridSearch.bm25.b})"
    val w = hybridSearch.weights
    if (w.dense < 0 || w.sparse < 0 || w.text < 0)
      es += s"fusion weights must be >= 0 (got $w)"
    if (w.dense + w.sparse + w.text <= 0)
      es += "fusion weights must not all be zero"
    if (!GraftConfig.Strategies.contains(hybridSearch.fusionStrategy))
      es += s"unknown fusionStrategy '${hybridSearch.fusionStrategy}' " +
        s"(${GraftConfig.Strategies.mkString("|")})"
    if (hybridSearch.maxCandidates <= 0)
      es += s"maxCandidates must be > 0 (got ${hybridSearch.maxCandidates})"
    if (query.defaultLimit <= 0) es += s"defaultLimit must be > 0 (got ${query.defaultLimit})"
    if (query.maxLimit < query.defaultLimit)
      es += s"maxLimit (${query.maxLimit}) must be >= defaultLimit (${query.defaultLimit})"
    if (cache.embeddingCacheSize < 0 || cache.queryCacheSize < 0)
      es += "cache sizes must be >= 0"
    if (cache.ttlMs <= 0) es += s"cache ttlMs must be > 0 (got ${cache.ttlMs})"
    if (chunk.size <= 0) es += s"chunk.size must be > 0 (got ${chunk.size})"
    if (chunk.overlap < 0 || chunk.overlap >= chunk.size)
      es += s"chunk.overlap must be in [0, chunk.size) (got ${chunk.overlap})"
    if (index.rebuildAppendedFraction <= 0)
      es += s"rebuildAppendedFraction must be > 0 (got ${index.rebuildAppendedFraction})"
    if (index.rebuildMaxGenerations <= 0)
      es += s"rebuildMaxGenerations must be > 0 (got ${index.rebuildMaxGenerations})"
    es.result()
  }
}
