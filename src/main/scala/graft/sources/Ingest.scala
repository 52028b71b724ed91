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
}
