package graft.sources

import graft.Tables
import graft.functions.TextFunctions.hash60
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion surface — the batch analogue of the reference's
  * add_document / batch_add_documents (grape-vector-db
  * src/lib.rs:310,317).
  *
  * A vector-DB "insert" becomes, on Spark, an idempotent batch merge
  * into a partitioned columnar layout:
  *  - content-hash dedup ON INGEST (same behavior as the reference's
  *    id upsert, but content-addressed),
  *  - layout partitioned by a low-cardinality column (lang) so
  *    downstream per-language scans prune partitions,
  *  - deterministic surrogate ids derived from content hash — safe
  *    under retries, no driver-side id sequencing at 1000 executors.
  */
object Ingest {

  /** Normalize + dedup a raw document batch: one row per distinct
    * content, earliest doc wins; adds the content hash the store is
    * keyed by.
    */
  def prepare(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    batch
      .withColumn("content_hash", hash60(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Write a prepared batch as a lang-partitioned parquet store. */
  def write(prepared: DataFrame, path: String): Unit =
    prepared.write
      .mode(SaveMode.Overwrite)
      .partitionBy("lang")
      .parquet(path)

  /** End-to-end: ingest the documents table into a store layout. */
  def ingestDocuments(spark: SparkSession, dir: String, outPath: String): Unit =
    write(prepare(Tables.documents(spark, dir)), outPath)

  /** Upsert-merge a new batch into an existing store (reference
    * lib.rs add_document id-upsert semantics, content-addressed):
    * incoming rows win over stored rows with the same content hash,
    * earliest-id-first within the batch. Expressed as union +
    * window-dedup — one shuffle keyed by content hash; at scale both
    * sides are bucketed by content_hash so the merge co-locates.
    */
  def upsert(store: DataFrame, batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val incoming = prepare(batch).withColumn("is_new", lit(1))
    val existing = store.withColumn("is_new", lit(0))
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(col("is_new").desc, col("doc_id"))
    existing.unionByName(incoming.select(existing.columns.map(col): _*))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "is_new")
  }

  /** Store maintenance (reference advanced_storage.rs compaction
    * surface): rewrite a store into `filesPerPartition` files per
    * lang partition, sorted by doc_id within each file so point
    * lookups benefit from parquet min/max row-group pruning. Run
    * periodically after streaming/micro-batch ingest has produced
    * many small files.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
              filesPerPartition: Int = 1): Unit =
    spark.read.parquet(path)
      // key by (lang, salt): every lang directory ends up with at most
      // `filesPerPartition` files regardless of shuffle.partitions
      .repartition(col("lang"), pmod(col("doc_id"), lit(filesPerPartition)))
      .sortWithinPartitions(col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("lang")
      .parquet(outPath)
}
