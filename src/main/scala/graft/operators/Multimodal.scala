package graft.operators

import graft.{OracleNum, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with
  * typed metadata, decoded/feature-extracted in partition-local
  * batches.
  *
  * The container has no image/audio codecs, so `decode` is a
  * clearly-marked deterministic STUB — but everything Spark-side is
  * real: the binary column representation, the schema of the decoded
  * metadata, the batched per-partition execution shape (the Scala
  * analogue of a `mapInPandas` batch UDF), and the partitioning
  * behavior. Swapping the stub for a real codec changes no plan
  * shape.
  */
object Multimodal {
  import OracleNum.fxSql

  /** A binary media asset row. */
  final case class MediaAsset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded (stub) metadata. */
  final case class DecodedMeta(asset_id: Long, media_type: String,
                               n_bytes: Long, width: Long, height: Long, frames: Long)

  /** Column-expression metadata extraction over the binary payload —
    * the oracle-checkable path. The documents' text bytes stand in
    * for media payloads; width/height/frames are deterministic
    * functions of the payload bytes (STUB decode).
    */
  def meta(spark: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val nBytes = octet_length(payload).cast("long")
    val mediaType = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("asset_id"),
        mediaType.as("media_type"),
        nBytes.as("n_bytes"),
        md5(payload).as("payload_md5"),
        // STUB decode: pseudo dimensions derived from byte length
        (nBytes % 1280 + 16).as("width"),
        (nBytes % 720 + 9).as("height"),
        (nBytes % 30 + 1).as("frames"))
      .orderBy(col("asset_id"))
  }

  val metaSql: String =
    s"""SELECT doc_id AS asset_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       |  octet_length(encode(text))::BIGINT AS n_bytes,
       |  md5(text) AS payload_md5,
       |  (octet_length(encode(text)) % 1280 + 16)::BIGINT AS width,
       |  (octet_length(encode(text)) % 720 + 9)::BIGINT AS height,
       |  (octet_length(encode(text)) % 30 + 1)::BIGINT AS frames
       |FROM documents
       |ORDER BY asset_id""".stripMargin

  /** Batched per-partition decode — the execution shape a real codec
    * would use (decode N payloads per partition without per-row JVM
    * crossings). ??? would be the codec call; the stub derives the
    * same deterministic pseudo-metadata as [[meta]].
    */
  def decodeBatch(spark: SparkSession, assets: Dataset[MediaAsset]): Dataset[DecodedMeta] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real implementation: load codec once per partition, then
      // decode each payload — e.g. val codec = Codec.open(); it.map(...)
      it.map { a =>
        val n = a.payload.length.toLong
        DecodedMeta(a.asset_id, a.media_type, n,
          n % 1280 + 16, n % 720 + 9, n % 30 + 1)
      }
    }
  }

  /** Build a MediaAsset dataset from the documents table. */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }
}
