package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline: the operators must COMPOSE as
  * lazy DataFrame stages — dedup feeds cluster resolution feeds
  * curation feeds chunking feeds retrieval — because that composition
  * is what a 100 TB data pipeline actually runs (each stage here is a
  * plan transform, not a materialized handoff).
  */
class PipelineSpec extends GraftSuite {

  test("dedup → cluster resolution → curation → chunking → search composes") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. near-dup resolution: keep one representative per cluster.
    // clusters() is the pipeline's expensive iterative stage — persist
    // it once; every later action reuses the materialized labels.
    val clusters = Dedup.clusters(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupIds = clusters.filter(col("is_dup") === 1L).select(col("doc_id"))
    val nDups = dupIds.count()
    val kept = docs.join(broadcast(dupIds), Seq("doc_id"), "left_anti")
    assert(kept.count() == total - nDups)
    // every cluster still has its representative in the kept set
    val reps = clusters.select(col("keep_id")).distinct()
    assert(reps.join(kept, reps("keep_id") === kept("doc_id")).count() == reps.count())

    // 2. deterministic stratified curation over the deduped corpus:
    // the hash gate is content-derived, so it composes with any
    // upstream filter without re-sampling drift
    val curated = kept.filter(
      (graft.functions.TextFunctions.hash60(col("text")) % 100) < 60)
    val nCurated = curated.count()
    assert(nCurated > 0 && nCurated < total)

    // 2b. decontamination + repetition-quality gates compose the same
    // way: tiny flagged-id sets ride broadcast anti-joins, the corpus
    // side stays one pass
    val contaminated = Curation.decontaminate(spark, sf).select(col("doc_id"))
    val repetitive = Curation.textRepetition(spark, sf)
      .filter(col("is_repetitive") === 1L).select(col("doc_id"))
    val gated = curated
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .join(broadcast(repetitive), Seq("doc_id"), "left_anti")
    val nGated = gated.count()
    assert(nGated > 0 && nGated <= nCurated)

    // 2c. sequence packing over the gated corpus: token mass conserved
    // on exactly the surviving rows, bins contiguous per lang
    val packed = Curation.packDocs(gated)
    val packedTokens = packed.agg(sum(col("n_tokens"))).head.getLong(0)
    val gatedTokens = gated
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(packedTokens == gatedTokens)
    assert(packed.agg(sum(col("n_docs"))).head.getLong(0) == nGated)

    // 3. chunking the curated set: every curated doc emits >= 1 chunk,
    // chunk geometry matches the standalone operator on the same rows
    val chunks = TextAnalysis.textChunk(spark, sf)
      .join(broadcast(curated.select(col("doc_id"))), Seq("doc_id"))
    assert(chunks.select(col("doc_id")).distinct().count() == nCurated)
    val maxIx = chunks.agg(max(col("chunk_ix"))).head.getLong(0)
    assert(maxIx >= 1, "expected at least one multi-chunk doc in the curated set")

    // 4. retrieval over the curated corpus: BM25 built on the REDUCED
    // doc set (searchDocs takes any corpus frame) returns only curated
    // ids
    val hits = Bm25.searchDocs(spark, curated, "spark vector join", 10)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(hits.nonEmpty)
    val curatedIds = curated.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(hits.forall(curatedIds))
    assert(hits.toSet.intersect(
      dupIds.collect().map(_.getLong(0)).toSet).isEmpty)
    clusters.unpersist()
  }
}
