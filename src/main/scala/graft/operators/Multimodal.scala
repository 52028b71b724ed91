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

  /** Feature extraction over the binary payload: an 8-bin positional
    * byte histogram (STUB for a real media embedding; see
    * [[graft.functions.expressions.ByteFeatures]]) plus the
    * normalized bin-0 share. Map-only — the plan shape of any
    * per-asset feature kernel at any scale.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val payload = encode(col("text"), "UTF-8")
    val feats = column(graft.functions.expressions.ByteFeatures(expression(payload)))
    val f = (0 until 8).map(d => col("f").getItem(d).as(s"f$d"))
    val total = (0 until 8).map(d => col(s"f$d")).reduce(_ + _)
    Tables.spread(spark, Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id").as("asset_id"), feats.as("f"))
      .select(col("asset_id") +: f: _*)
      .select(col("asset_id") +: (0 until 8).map(d => col(s"f$d")) :+
        OracleNum.fx(col("f0").cast("double") / total.cast("double"), 6).as("f0_share"): _*)
      .orderBy(col("asset_id"))
  }

  val featuresSql: String = {
    // byte i (0-based) of the payload via one hex() pass per row
    def byteAt(i: String) = s"('0x' || substr(h, 2 * ($i) + 1, 2))::BIGINT"
    val bins = (0 until 8).map { d =>
      s"COALESCE(list_sum(list_transform(range(0, octet_length(p)), i -> CASE WHEN i % 8 = $d THEN ${byteAt("i")} ELSE 0 END)), 0)::BIGINT AS f$d"
    }.mkString(",\n    ")
    val total = (0 until 8).map(d => s"f$d").mkString(" + ")
    s"""WITH b AS (
       |  SELECT doc_id AS asset_id, encode(text) AS p, hex(encode(text)) AS h
       |  FROM documents
       |), f AS (
       |  SELECT asset_id, $bins FROM b
       |)
       |SELECT asset_id, ${(0 until 8).map(d => s"f$d").mkString(", ")},
       |  ${fxSql(s"f0::DOUBLE / ($total)::DOUBLE", 6)} AS f0_share
       |FROM f
       |ORDER BY asset_id""".stripMargin
  }

  /** Even frame sampling (STUB decode supplies the frame count): up
    * to 4 frame indices per asset with their byte offsets — the
    * Generate-based plan shape of real video frame extraction.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val nBytes = octet_length(payload).cast("long")
    val frames = (nBytes % 30 + 1)
    val step = greatest((frames + lit(3)) / lit(4), lit(1)).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"), nBytes.as("n_bytes"), frames.as("frames"),
        step.as("step"))
      .select(col("asset_id"), col("frames"),
        explode(sequence(lit(0L), col("frames") - 1, col("step"))).as("frame_idx"),
        (col("n_bytes") / col("frames")).cast("long").as("frame_bytes"))
      .select(col("asset_id"), col("frames"), col("frame_idx"),
        (col("frame_idx") * col("frame_bytes")).as("byte_offset"))
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  val frameSampleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id AS asset_id,
       |    octet_length(encode(text))::BIGINT AS n_bytes,
       |    (octet_length(encode(text)) % 30 + 1)::BIGINT AS frames
       |  FROM documents
       |)
       |SELECT asset_id, frames, unnest(range(0, frames, greatest((frames + 3) // 4, 1)))::BIGINT AS frame_idx,
       |  (unnest(range(0, frames, greatest((frames + 3) // 4, 1))) * (n_bytes // frames))::BIGINT AS byte_offset
       |FROM m
       |ORDER BY asset_id, frame_idx""".stripMargin

  /** Aspect-preserving resize stub: fit the pseudo (width, height)
    * into a 256-box with exact integer arithmetic (identical in both
    * engines; a real implementation feeds the decoded image through
    * the same column contract).
    */
  def resize(spark: SparkSession, dir: String, box: Int = 256): DataFrame = {
    val nBytes = octet_length(encode(col("text"), "UTF-8")).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        (nBytes % 1280 + 16).as("width"),
        (nBytes % 720 + 9).as("height"))
      .select(col("asset_id"), col("width"), col("height"),
        floor(col("width") * box / greatest(col("width"), col("height"))).cast("long").as("new_width"),
        floor(col("height") * box / greatest(col("width"), col("height"))).cast("long").as("new_height"))
      .orderBy(col("asset_id"))
  }

  def resizeSql(box: Int = 256): String =
    s"""WITH m AS (
       |  SELECT doc_id AS asset_id,
       |    (octet_length(encode(text)) % 1280 + 16)::BIGINT AS width,
       |    (octet_length(encode(text)) % 720 + 9)::BIGINT AS height
       |  FROM documents
       |)
       |SELECT asset_id, width, height,
       |  (width * $box // greatest(width, height))::BIGINT AS new_width,
       |  (height * $box // greatest(width, height))::BIGINT AS new_height
       |FROM m
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
