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

  /** One-row corpus report card — the at-a-glance health summary a
    * curation run opens with (lib.rs:446 get_stats, extended with the
    * dedup and quality mass the reference's DatabaseStats doesn't
    * carry): doc/source/lang counts, whitespace-token mass, documents
    * that are non-canonical members of an exact-duplicate group, and
    * documents tripping the Gopher repetition gates. Three bounded
    * branches (a doc-grain aggregate, a hash-grain two-level
    * aggregate, the zero-shuffle repetition map aggregated) each
    * reduce to ONE row, then join on a literal key — broadcast hash
    * joins of one-row relations, deliberately NOT a cross join (the
    * no-CartesianProduct invariant holds on every plan).
    */
  def corpusSummary(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val docs = Tables.spread(spark,
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source")))
    val base = docs
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_toks")).as("sum_tokens"))
      .withColumn("k", lit(1))
    val dups = docs.select(hash60(col("text")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1L).as("n_exact_dup_docs"))
      .withColumn("k", lit(1))
    val rep = Curation.textRepetition(spark, dir)
      .agg(sum(col("is_repetitive")).as("n_repetitive"))
      .withColumn("k", lit(1))
    base.join(dups, "k").join(rep, "k")
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("sum_tokens"), col("n_exact_dup_docs"), col("n_repetitive"))
  }

  lazy val corpusSummarySql: String =
    s"""SELECT
       |  (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
       |  (SELECT COUNT(DISTINCT source) FROM documents)::BIGINT AS n_sources,
       |  (SELECT COUNT(DISTINCT lang) FROM documents)::BIGINT AS n_langs,
       |  (SELECT SUM(len(string_split(text, ' '))) FROM documents)::BIGINT AS sum_tokens,
       |  (SELECT SUM(c - 1) FROM (
       |     SELECT COUNT(*) AS c FROM documents
       |     GROUP BY ${graft.functions.TextFunctions.hash60Sql("text")}))::BIGINT
       |    AS n_exact_dup_docs,
       |  (SELECT SUM(is_repetitive) FROM (
       |     ${Curation.textRepetitionSql.replace("\n", "\n     ")}))::BIGINT
       |    AS n_repetitive""".stripMargin
}
