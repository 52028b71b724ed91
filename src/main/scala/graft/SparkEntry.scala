package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Hybrid RRF search exercises the dense, sparse and text
    * branches plus fusion in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    HybridSearch.rrf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"         -> ((s, d) => Analytics.q1(s, d)),
    "q3_topk"        -> ((s, d) => Analytics.q3(s, d)),
    "q5_join"        -> ((s, d) => Analytics.q5(s, d)),
    "events_window"  -> ((s, d) => Analytics.eventsWindow(s, d)),
    "events_session" -> ((s, d) => Analytics.eventsSession(s, d)),
    "semantic_search"   -> ((s, d) => VectorSearch.semanticTopK(s, d)),
    "semantic_search_filtered" -> ((s, d) => VectorSearch.semanticTopKFiltered(s, d)),
    "binary_quantize"   -> ((s, d) => VectorSearch.binaryQuantize(s, d)),
    "multistage_search" -> ((s, d) => VectorSearch.multiStage(s, d)),
    "ann_topk_batch"    -> ((s, d) => VectorSearch.annTopKBatch(s, d)),
    "ann_lsh"           -> ((s, d) => VectorSearch.annLsh(s, d)),
    "ann_ivf"           -> ((s, d) => VectorSearch.annIvf(s, d)),
    "bm25_search"   -> ((s, d) => Bm25.search(s, d)),
    "sparse_vectors" -> ((s, d) => Bm25.sparseVectors(s, d)),
    "text_search"   -> ((s, d) => Bm25.textSearch(s, d)),
    "hybrid_rrf"    -> ((s, d) => HybridSearch.rrf(s, d)),
    "hybrid_linear" -> ((s, d) => HybridSearch.linear(s, d)),
    "filter_comparison" -> ((s, d) => Filtering.filterComparison(s, d)),
    "filter_logical"    -> ((s, d) => Filtering.filterLogical(s, d)),
    "filter_geo"        -> ((s, d) => Filtering.filterGeo(s, d)),
    "filter_nested"     -> ((s, d) => Filtering.filterNested(s, d)),
    "filter_sql_where"  -> ((s, d) => Filtering.filterSqlWhere(s, d)),
    "filter_bbox"       -> ((s, d) => Filtering.filterBBox(s, d)),
    "filter_array_text" -> ((s, d) => Filtering.filterArrayText(s, d)),
    "dedup_exact"     -> ((s, d) => Dedup.exact(s, d)),
    "dedup_minhash"   -> ((s, d) => Dedup.minhash(s, d)),
    "dedup_simhash"   -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_ngram"     -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingPairs(s, d)),
    "lang_id"         -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_quality"    -> ((s, d) => TextAnalysis.quality(s, d)),
    "token_count"     -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "sample_stratified" -> ((s, d) => TextAnalysis.sampleStratified(s, d)),
    "mock_embed" -> ((s, d) => Embeddings.mockEmbed(s, d)),
    "doc_get"   -> ((s, d) => DocOps.get(s, d)),
    "doc_list"  -> ((s, d) => DocOps.list(s, d)),
    "doc_stats" -> ((s, d) => DocOps.stats(s, d)),
    "doc_delete" -> ((s, d) => DocOps.delete(s, d)),
    "filter_geo_near" -> ((s, d) => Filtering.filterGeoNear(s, d)),
    "mm_meta"   -> ((s, d) => Multimodal.meta(s, d)),
    "mm_features"     -> ((s, d) => Multimodal.features(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    "mm_resize"       -> ((s, d) => Multimodal.resize(s, d)),
    "hybrid_normalized" -> ((s, d) => HybridSearch.normalized(s, d)),
    "hybrid_learned"    -> ((s, d) => HybridSearch.learned(s, d)),
    "hybrid_adaptive"   -> ((s, d) => HybridSearch.adaptiveDemo(s, d)),
    "doc_scroll"        -> ((s, d) => DocOps.scroll(s, d)),
  )

  /** DuckDB-equivalent SQL for each key in [[queries]]. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"         -> Analytics.q1Sql,
    "q3_topk"        -> Analytics.q3Sql,
    "q5_join"        -> Analytics.q5Sql,
    "events_window"  -> Analytics.eventsWindowSql,
    "events_session" -> Analytics.eventsSessionSql,
    "semantic_search"   -> VectorSearch.semanticTopKSql(),
    "semantic_search_filtered" -> VectorSearch.semanticTopKFilteredSql(),
    "binary_quantize"   -> VectorSearch.binaryQuantizeSql(),
    "multistage_search" -> VectorSearch.multiStageSql(),
    "ann_topk_batch"    -> VectorSearch.annTopKBatchSql(),
    "ann_lsh"           -> VectorSearch.annLshSql(),
    "ann_ivf"           -> VectorSearch.annIvfSql(),
    "bm25_search"   -> Bm25.searchSql(),
    "sparse_vectors" -> Bm25.sparseVectorsSql,
    "text_search"   -> Bm25.textSearchSql(),
    "hybrid_rrf"    -> HybridSearch.rrfSql(),
    "hybrid_linear" -> HybridSearch.linearSql(),
    "filter_comparison" -> Filtering.filterComparisonSql,
    "filter_logical"    -> Filtering.filterLogicalSql,
    "filter_geo"        -> Filtering.filterGeoSql,
    "filter_nested"     -> Filtering.filterNestedSql,
    "filter_sql_where"  -> Filtering.filterSqlWhereSql,
    "filter_bbox"       -> Filtering.filterBBoxSql,
    "filter_array_text" -> Filtering.filterArrayTextSql,
    "dedup_exact"     -> Dedup.exactSql,
    "dedup_minhash"   -> Dedup.minhashSql(),
    "dedup_simhash"   -> Dedup.simhashSql(),
    "dedup_ngram"     -> Dedup.ngramJaccardSql(),
    "dedup_embedding" -> Dedup.embeddingPairsSql(),
    "lang_id"         -> TextAnalysis.langIdSql,
    "text_quality"    -> TextAnalysis.qualitySql,
    "token_count"     -> TextAnalysis.tokenCountSql,
    "doc_fingerprint" -> TextAnalysis.fingerprintSql,
    "sample_stratified" -> TextAnalysis.sampleStratifiedSql,
    "mock_embed" -> Embeddings.mockEmbedSql(),
    "doc_get"   -> DocOps.getSql(),
    "doc_list"  -> DocOps.listSql(),
    "doc_stats" -> DocOps.statsSql,
    "doc_delete" -> DocOps.deleteSql,
    "filter_geo_near" -> Filtering.filterGeoNearSql(),
    "mm_meta"   -> Multimodal.metaSql,
    "mm_features"     -> Multimodal.featuresSql,
    "mm_frame_sample" -> Multimodal.frameSampleSql,
    "mm_resize"       -> Multimodal.resizeSql(),
    "hybrid_normalized" -> HybridSearch.normalizedSql(),
    "hybrid_learned"    -> HybridSearch.learnedSql(),
    "hybrid_adaptive"   -> HybridSearch.adaptiveSql(),
    "doc_scroll"        -> DocOps.scrollSql(),
  )
}
