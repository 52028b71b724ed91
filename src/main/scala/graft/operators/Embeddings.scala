package graft.operators

import graft.{OracleNum, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-provider surface (reference src/embeddings.rs): on Spark
  * a provider is a column kernel mapped over the corpus — batch
  * embedding generation IS a scan + map, shuffle-free at any scale.
  * The deterministic mock provider (embeddings.rs:222) is implemented
  * natively ([[graft.functions.expressions.MockEmbedding]]); a real
  * provider (model endpoint) would swap the kernel behind the same
  * column contract.
  */
object Embeddings {
  import OracleNum.{fx, fxSql}

  def embed(text: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.expressions.MockEmbedding(expression(text), dim))
  }

  /** Oracle-checked mock-embedding query: embed every document at
    * dim 8, emit the first three normalized components.
    */
  def mockEmbed(spark: SparkSession, dir: String, dim: Int = 8): DataFrame = {
    val e = embed(col("text"), dim)
    Tables.spread(spark, Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), e.as("e"))
      .select(col("doc_id"),
        fx(col("e").getItem(0), 6).as("e0"),
        fx(col("e").getItem(1), 6).as("e1"),
        fx(col("e").getItem(2), 6).as("e2"))
      .orderBy(col("doc_id"))
  }

  def mockEmbedSql(dim: Int = 8): String = {
    // byte(i % len) via one hex() pass; identical double arithmetic
    def byteAt(i: Int) =
      s"(('0x' || substr(h, 2 * (($i) % octet_length(p)) + 1, 2))::BIGINT)"
    val vs = (0 until dim).map(i =>
      s"(fmod(${byteAt(i)} / 255.0 + $i * 0.01, 1.0) - 0.5) AS v$i").mkString(",\n    ")
    val norm = (0 until dim).map(i => s"v$i * v$i").mkString(" + ")
    s"""WITH b AS (
       |  SELECT doc_id, encode(text) AS p, hex(encode(text)) AS h FROM documents
       |), v AS (
       |  SELECT doc_id, $vs FROM b
       |), n AS (
       |  SELECT *, sqrt($norm) AS nrm FROM v
       |)
       |SELECT doc_id, ${fxSql("v0 / nrm", 6)} AS e0,
       |  ${fxSql("v1 / nrm", 6)} AS e1, ${fxSql("v2 / nrm", 6)} AS e2
       |FROM n
       |ORDER BY doc_id""".stripMargin
  }
}
