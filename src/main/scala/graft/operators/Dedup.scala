package graft.operators

import graft.{OracleNum, Tables}
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.{cosineSimilarity, hammingDistance, packSignBits, toDouble}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface.
  *
  * All candidate generation is CONTENT-derived (hashing/LSH banding),
  * never metadata blocking: the injected near-duplicates in the
  * corpus deliberately differ in lang/source, and at 100 TB no
  * metadata key bounds the pair space anyway. Every variant is
  * linear-ish: explode → keyed shuffle → within-bucket pairs; the
  * quadratic step only ever runs inside a bucket.
  */
object Dedup {
  import OracleNum.{fx, fxSql}

  /** Modulus for minhash permutations (2^31 - 1, prime). */
  val P = 2147483647L
  val NumHashes = 32
  val BandRows  = 4
  val NumBands  = NumHashes / BandRows

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      array_distinct(wordShingles(tokens(col("text")), 3)).as("shingles"))

  private def shinglesSqlCte: String =
    s"""SELECT doc_id,
       |  list_distinct(${wordShinglesSql(tokensSql("text"), 3)}) AS shingles
       |FROM documents""".stripMargin

  // ---- exact dedup ----

  /** Exact duplicate grouping by content hash: one row per distinct
    * content, the kept (minimal) id and the copy count. A pure
    * hash-groupBy — the map-side partial aggregation makes this a
    * single shuffle of (hash, id) pairs at any scale.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(hash60(col("text")).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("keep_id"))

  val exactSql: String =
    s"""SELECT ${hash60Sql("text")} AS content_hash,
       |  COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
       |FROM documents
       |GROUP BY 1
       |ORDER BY keep_id""".stripMargin

  // ---- minhash + LSH ----

  /** Per-doc minhash signature entries, one row per (doc, band) with
    * a band key hash. Signature j uses permutation
    * h_j(x) = ((2j+1) * x + 7919j + 12345) mod (2^31-1) over 60-bit
    * shingle hashes reduced mod P — coefficients small enough that
    * every product stays far below 2^63 in both engines.
    */
  private def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val hashes = transform(col("shingles"), s => hash60(s) % P)
    val sig = array((0 until NumHashes).map { j =>
      array_min(transform(hashes, h => (h * (2 * j + 1) + (7919 * j + 12345)) % P))
    }: _*)
    val withSig = docShingles(spark, dir)
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("shingles"), sig.as("sig"))
    val bands = explode(array((0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        hash60(concat_ws(",", lit(b) +: (0 until BandRows).map(r =>
          col("sig").getItem(b * BandRows + r)): _*)).as("band_key"))
    }: _*))
    withSig.select(col("doc_id"), col("shingles"), bands.as("bk"))
      .select(col("doc_id"), col("shingles"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** MinHash+LSH near-duplicate pairs: docs sharing at least one LSH
    * band are candidates; candidates are verified with exact shingle
    * Jaccard >= threshold. The shuffle key is (band, band_key) so the
    * self-join never leaves a bucket.
    */
  def minhash(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val bands = minhashBands(spark, dir)
    val a = bands.select(col("doc_id").as("id1"), col("shingles").as("sh1"),
      col("band"), col("band_key"))
    val b = bands.select(col("doc_id").as("id2"), col("shingles").as("sh2"),
      col("band"), col("band_key"))
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val union = size(col("sh1")) + size(col("sh2")) - size(array_intersect(col("sh1"), col("sh2")))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sh1"), col("sh2")).distinct()
      .select(col("id1"), col("id2"), fx(inter / union.cast("double")).as("jaccard"))
      .filter(col("jaccard") >= (threshold * 1e4).toLong)
      .orderBy(col("id1"), col("id2"))
  }

  def minhashSql(threshold: Double = 0.5): String = {
    val sigExprs = (0 until NumHashes).map { j =>
      s"list_min(list_transform(hashes, h -> (h * ${2 * j + 1} + ${7919 * j + 12345}) % $P))"
    }.mkString("[", ",\n    ", "]")
    val bandStructs = (0 until NumBands).map { b =>
      val keyParts = (s"'$b'" +: (0 until BandRows).map(r => s"sig[${b * BandRows + r + 1}]"))
        .mkString("concat_ws(',', ", ", ", ")")
      s"struct_pack(band := $b, band_key := ${hash60Sql(keyParts)})"
    }.mkString("[", ",\n    ", "]")
    s"""WITH docs AS ($shinglesSqlCte),
       |hashed AS (
       |  SELECT doc_id, shingles,
       |    list_transform(shingles, s -> ${hash60Sql("s")} % $P) AS hashes
       |  FROM docs WHERE len(shingles) > 0
       |), sigs AS (
       |  SELECT doc_id, shingles, $sigExprs AS sig FROM hashed
       |), bands AS (
       |  SELECT doc_id, shingles, unnest($bandStructs, recursive := true) FROM sigs
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT c.id1, c.id2, da.shingles AS sh1, db.shingles AS sh2
       |  FROM cand c JOIN docs da ON c.id1 = da.doc_id JOIN docs db ON c.id2 = db.doc_id
       |)
       |SELECT id1, id2,
       |  ${fxSql("len(list_intersect(sh1, sh2))::DOUBLE / (len(sh1) + len(sh2) - len(list_intersect(sh1, sh2)))::DOUBLE")} AS jaccard
       |FROM pairs
       |WHERE ${fxSql("len(list_intersect(sh1, sh2))::DOUBLE / (len(sh1) + len(sh2) - len(list_intersect(sh1, sh2)))::DOUBLE")} >= ${(threshold * 1e4).toLong}
       |ORDER BY id1, id2""".stripMargin
  }

  // ---- simhash ----

  /** 60-bit weighted simhash packed into two 32-bit words, computed
    * entirely with row-local higher-order functions — a map-only
    * stage, zero shuffles until the band join.
    */
  private def simhashWords(toksCol: Column): Column = {
    val pairs = transform(array_distinct(toksCol), t =>
      struct(
        size(filter(toksCol, x => x === t)).cast("long").as("tf"),
        hash60(t).as("h")))
    val zeros = array((0 until 60).map(_ => lit(0L)): _*)
    val bitsums = aggregate(pairs, zeros, (acc, p) =>
      zip_with(acc,
        array((0 until 60).map { i =>
          p.getField("tf") *
            when(shiftright(p.getField("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        }: _*),
        (x, y) => x + y))
    // pad to 64 with always-negative sums so packSignBits yields 2 words
    packSignBits(concat(bitsums, array(lit(-1L), lit(-1L), lit(-1L), lit(-1L))), 64)
  }

  private def simhashWordsSql: String =
    s"""list_transform(range(0, 60), i ->
       |      list_sum(list_transform(pairs, p -> p.tf * CASE WHEN (p.h >> i) & 1 = 1 THEN 1 ELSE -1 END)))""".stripMargin

  /** SimHash near-duplicate pairs. Banding: the 60-bit fingerprint
    * splits into four 15-bit bands; any pair within Hamming distance 3
    * shares a band exactly (pigeonhole), so the band join finds ALL
    * such pairs — this is exact search, not approximation, at a
    * linear shuffle cost. Pairs up to `maxHamming` that happen to
    * collide on a band are also surfaced.
    */
  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), simhashWords(col("toks")).as("words"))
    val lo = col("words").getItem(0)
    val hi = col("words").getItem(1)
    val banded = docs.select(col("doc_id"), col("words"),
      explode(array(
        struct(lit(0).as("band"), lo.bitwiseAND(0x7FFF).as("bits")),
        struct(lit(1).as("band"), shiftright(lo, 15).bitwiseAND(0x7FFF).as("bits")),
        struct(lit(2).as("band"), hi.bitwiseAND(0x7FFF).as("bits")),
        struct(lit(3).as("band"), shiftright(hi, 15).bitwiseAND(0x7FFF).as("bits")))).as("b"))
      .select(col("doc_id"), col("words"), col("b.band").as("band"), col("b.bits").as("bits"))
    val a = banded.select(col("doc_id").as("id1"), col("words").as("w1"), col("band"), col("bits"))
    val b = banded.select(col("doc_id").as("id2"), col("words").as("w2"), col("band"), col("bits"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        hammingDistance(col("w1"), col("w2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  def simhashSql(maxHamming: Int = 10): String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
       |), tp AS (
       |  SELECT doc_id,
       |    list_transform(list_distinct(toks),
       |      t -> struct_pack(tf := len(list_filter(toks, x -> x = t)), h := ${hash60Sql("t")})) AS pairs
       |  FROM toks WHERE len(toks) > 0
       |), sums AS (
       |  SELECT doc_id, $simhashWordsSql AS bitsums FROM tp
       |), words AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(range(0, 32), i -> CASE WHEN bitsums[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS lo,
       |    list_sum(list_transform(range(0, 28), i -> CASE WHEN bitsums[i + 33] > 0 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS hi
       |  FROM sums
       |), banded AS (
       |  SELECT doc_id, lo, hi, unnest([
       |    struct_pack(band := 0, bits := lo & 32767),
       |    struct_pack(band := 1, bits := (lo >> 15) & 32767),
       |    struct_pack(band := 2, bits := hi & 32767),
       |    struct_pack(band := 3, bits := (hi >> 15) & 32767)], recursive := true)
       |  FROM words
       |)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::BIGINT AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
       |WHERE (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))) <= $maxHamming
       |ORDER BY id1, id2""".stripMargin

  // ---- n-gram jaccard ----

  /** N-gram Jaccard pairs via a rare-shingle inverted index: only
    * shingles with document frequency <= dfCap generate candidates
    * (SpotSigs-style blocking), candidates are verified exactly. The
    * dfCap bounds per-shingle fan-out to C(dfCap,2) pairs, keeping
    * the join linear in corpus size.
    */
  def ngramJaccard(spark: SparkSession, dir: String,
                   dfCap: Int = 20, threshold: Double = 0.3): DataFrame = {
    val docs = docShingles(spark, dir).filter(size(col("shingles")) > 0)
    val posting = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val rare = posting.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") >= 2)
    val rarePosting = posting.join(rare.select(col("sh")), "sh")
    val cand = rarePosting.select(col("sh"), col("doc_id").as("id1"))
      .join(rarePosting.select(col("sh"), col("doc_id").as("id2")), "sh")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val union = (size(col("sh1")) + size(col("sh2")) -
      size(array_intersect(col("sh1"), col("sh2")))).cast("double")
    cand
      .join(docs.select(col("doc_id").as("id1"), col("shingles").as("sh1")), "id1")
      .join(docs.select(col("doc_id").as("id2"), col("shingles").as("sh2")), "id2")
      .select(col("id1"), col("id2"), fx(inter / union).as("jaccard"))
      .filter(col("jaccard") >= (threshold * 1e4).toLong)
      .orderBy(col("id1"), col("id2"))
  }

  def ngramJaccardSql(dfCap: Int = 20, threshold: Double = 0.3): String =
    s"""WITH docs AS ($shinglesSqlCte),
       |docs2 AS (SELECT * FROM docs WHERE len(shingles) > 0),
       |posting AS (
       |  SELECT doc_id, unnest(shingles) AS sh FROM docs2
       |), rare AS (
       |  SELECT sh FROM posting GROUP BY sh HAVING COUNT(*) <= $dfCap AND COUNT(*) >= 2
       |), rp AS (
       |  SELECT p.doc_id, p.sh FROM posting p JOIN rare USING (sh)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM rp a JOIN rp b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT c.id1, c.id2, da.shingles AS sh1, db.shingles AS sh2
       |  FROM cand c JOIN docs2 da ON c.id1 = da.doc_id JOIN docs2 db ON c.id2 = db.doc_id
       |)
       |SELECT id1, id2,
       |  ${fxSql("len(list_intersect(sh1, sh2))::DOUBLE / (len(sh1) + len(sh2) - len(list_intersect(sh1, sh2)))::DOUBLE")} AS jaccard
       |FROM pairs
       |WHERE ${fxSql("len(list_intersect(sh1, sh2))::DOUBLE / (len(sh1) + len(sh2) - len(list_intersect(sh1, sh2)))::DOUBLE")} >= ${(threshold * 1e4).toLong}
       |ORDER BY id1, id2""".stripMargin

  // ---- embedding cosine near-dup ----

  /** Embedding near-duplicate candidates: pairs inside the same
    * random-hyperplane LSH bucket, ranked by exact cosine, top-k.
    * The bucket key bounds the pair space to ~n^2/2^planes; at scale
    * more planes (or multi-probe) tighten it further.
    */
  def embeddingPairs(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val planes = VectorSearch.lshPlanes(64)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("bucket", VectorSearch.lshBucket(col("emb"), planes))
    val a = e.select(col("vec_id").as("id1"), col("emb").as("e1"), col("bucket"))
    val b = e.select(col("vec_id").as("id2"), col("emb").as("e2"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        fx(cosineSimilarity(col("e1"), col("e2")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id1"), col("id2"))
      .limit(k)
  }

  def embeddingPairsSql(k: Int = 50): String = {
    val planes = VectorSearch.lshPlanes(64)
    val planesSql = planes.map(_.mkString("[", ",", "]")).mkString("[", ", ", "]")
    val bucketExpr = (0 until VectorSearch.LshPlanes).map { j =>
      s"(CASE WHEN list_dot_product(emb, planes[${j + 1}]::DOUBLE[]) > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb, $planesSql AS planes FROM embeddings
       |), e AS (
       |  SELECT vec_id, emb, ($bucketExpr) AS bucket FROM e0
       |)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |  ${fxSql(VectorSearch.cosineSql("a.emb", "b.emb"), 6)} AS cosine
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |ORDER BY cosine DESC, id1, id2
       |LIMIT $k""".stripMargin
  }
}
