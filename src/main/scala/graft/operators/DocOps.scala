package graft.operators

import graft.{OracleNum, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-store surface of the reference
  * (grape-vector-db src/lib.rs: get_document, list_documents,
  * get_stats). Point lookups are pushed-down scans, listing is
  * order+offset pagination, stats are one grouped aggregate.
  */
object DocOps {
  import OracleNum.{fx, fxSql}

  /** Point lookup by id — the predicate reaches the parquet footer
    * so only matching row groups are read.
    */
  def get(spark: SparkSession, dir: String, id: Long = 42): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") === id)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))

  def getSql(id: Long = 42): String =
    s"SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = $id"

  /** Deterministic listing with limit/offset pagination
    * (lib.rs list_documents).
    */
  def list(spark: SparkSession, dir: String, limit: Int = 50, offset: Int = 100): DataFrame =
    Tables.documents(spark, dir)
      .orderBy(col("doc_id"))
      .offset(offset)
      .limit(limit)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  def listSql(limit: Int = 50, offset: Int = 100): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |ORDER BY doc_id LIMIT $limit OFFSET $offset""".stripMargin

  /** Cursor-based scroll (the scalable alternative to OFFSET: a seek
    * predicate pushes to the scan instead of skipping rows). Returns
    * the page after `cursor`.
    */
  def scroll(spark: SparkSession, dir: String, cursor: Long = 199, pageSize: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") > cursor)
      .orderBy(col("doc_id"))
      .limit(pageSize)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  def scrollSql(cursor: Long = 199, pageSize: Int = 50): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id > $cursor ORDER BY doc_id LIMIT $pageSize""".stripMargin

  /** Batch delete (lib.rs delete_document / remove_document): a
    * deletions relation anti-joined against the store — the
    * distributed form of per-id tombstoning. Small deletion sets
    * broadcast; here the output proves the deletion by per-lang
    * surviving counts. Deletion set: every doc_id divisible by 7.
    */
  /** Surviving documents after deleting `ids` — the ids-parameterized
    * form of [[delete]] (lib.rs:381 delete_document, batched): the
    * deletion set broadcasts against the store scan as an anti-join.
    */
  def deleteIds(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .join(broadcast(ids.toDF("doc_id")), Seq("doc_id"), "left_anti")
  }

  def delete(spark: SparkSession, dir: String): DataFrame = {
    val deletions = Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"))
    Tables.documents(spark, dir)
      .join(broadcast(deletions), Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"))
      .orderBy(col("lang"))
  }

  val deleteSql: String =
    s"""SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_id
       |FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 7 = 0)
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  /** DatabaseStats equivalent: per (lang, source) counts and content
    * statistics in one grouped aggregate.
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        fx(avg(col("n_chars"))).as("avg_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"), col("source"))

  val statsSql: String =
    s"""SELECT lang, source, COUNT(*) AS n_docs,
       |  ${fxSql("AVG(n_chars)")} AS avg_chars,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM documents
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin
}
