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

  /** Bucket-size bound for every banded self-join: singleton buckets
    * generate no pairs (dropping them shrinks the join input), and a
    * degenerate bucket of B docs would generate B² candidate rows —
    * at 100 TB one hot bucket would dominate the whole stage. The
    * window count rides the same (band, key) partitioning the
    * self-join shuffles on, so the bound costs no extra exchange.
    */
  val MaxBucket = 500

  /** Keep only buckets with 2..MaxBucket members; `keys` must be the
    * self-join key columns (the window re-uses their partitioning).
    */
  private def boundBuckets(df: DataFrame, keys: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_bn", count(lit(1)).over(Window.partitionBy(keys: _*)))
      .filter(col("_bn") >= 2 && col("_bn") <= MaxBucket)
      .drop("_bn")
  }

  /** DuckDB twin of [[boundBuckets]] as a QUALIFY-style CTE filter. */
  private def boundBucketsSql(keys: String): String =
    s"COUNT(*) OVER (PARTITION BY $keys) BETWEEN 2 AND $MaxBucket"

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      array_distinct(wordShingles(tokens(col("text")), 3)).as("shingles"))

  /** Relational 3-token shingle construction: posexplode + window
    * lead + concat, all codegen'd. Produces the identical shingle set
    * to the array formulation in [[docShingles]] but ~25x faster —
    * Spark's array higher-order functions are interpreted
    * (CodegenFallback) and the Generate path re-evaluates the array
    * expression, so the HOF version pays the O(doc * shingles) lambda
    * cost twice per pass.
    */
  private[graft] def relationalShingles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
      .distinct()
  }

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

  /** Exploded posting table of hashed distinct shingles: one
    * (doc_id, h) row per shingle, computed by the native one-pass
    * [[graft.functions.expressions.ShingleHashes]] expression
    * (tokenize → distinct space-joined 3-grams → md5-hash each
    * exactly once, all inside one map). All downstream dedup joins
    * are int-only — no string or array column ever enters a shuffle,
    * and shingle construction itself costs zero shuffles (the earlier
    * relational lead-window formulation paid a window shuffle plus a
    * distinct shuffle over one row per token).
    */
  private def shinglePosting(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val hashes = column(graft.functions.expressions.ShingleHashes(
      expression(col("text")), 3, P))
    Tables.spread(spark, Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(hashes).as("h"))
      // the posting feeds 4+ plan branches (sigs/df/verify/sizes);
      // Spark has no subtree reuse across different shuffle keys, so
      // without this the tokenize+md5 pipeline runs once per branch.
      // ~16 bytes/row: at 100 TB input this is ~1% of corpus size and
      // would spill to disk, still beating 4 full recomputes.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact Jaccard for candidate (id1, id2) pairs from the hashed
    * posting table: |A∩B| via a co-grouped join on (shingle hash),
    * sizes via per-doc counts. Pure relational — linear shuffles,
    * quadratic work only inside candidate buckets.
    */
  private def verifyJaccard(cand: DataFrame, posting: DataFrame): DataFrame = {
    val sizes = posting.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(posting.select(col("doc_id").as("id1"), col("h")), "id1")
      .join(posting.select(col("doc_id").as("id2"), col("h")), Seq("id2", "h"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).cast("double").as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
      .select(col("id1"), col("id2"),
        fx(col("inter") / (col("sz1") + col("sz2") - col("inter")).cast("double")).as("jaccard"))
  }

  /** MinHash+LSH near-duplicate pairs: 32 permutation minima are
    * 32 min-aggregates over the posting table (one shuffle keyed by
    * doc, map-side partials); docs sharing any of 8 four-row band
    * keys are candidates; candidates are verified with exact shingle
    * Jaccard >= threshold. Permutation j is
    * h_j(x) = ((2j+1) * x + 7919j + 12345) mod (2^31-1) — products
    * stay far below 2^63 in both engines.
    */
  def minhash(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val posting = shinglePosting(spark, dir)
    val sigs = posting.groupBy(col("doc_id")).agg(
      min((col("h") * (2 * 0 + 1) + (7919 * 0 + 12345)) % P).as("s0"),
      (1 until NumHashes).map { j =>
        min((col("h") * (2 * j + 1) + (7919 * j + 12345)) % P).as(s"s$j")
      }: _*)
    val bands = sigs.select(col("doc_id"),
      explode(array((0 until NumBands).map { b =>
        struct(lit(b).as("band"),
          hash60(concat_ws(",", lit(b) +: (0 until BandRows).map(r =>
            col(s"s${b * BandRows + r}")): _*)).as("band_key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val bounded = boundBuckets(bands, col("band"), col("band_key"))
    val cand = bounded.select(col("doc_id").as("id1"), col("band"), col("band_key"))
      .join(bounded.select(col("doc_id").as("id2"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    verifyJaccard(cand, posting)
      .filter(col("jaccard") >= (threshold * 1e4).toLong)
      .orderBy(col("id1"), col("id2"))
  }

  /** Shared SQL: hashed shingle posting + Jaccard verification CTEs.
    * Expects a `cand(id1, id2)` CTE to exist upstream.
    */
  private def postingSqlCte: String =
    s"""posting AS (
       |  SELECT doc_id, ${hash60Sql("sh")} % $P AS h
       |  FROM (SELECT doc_id, unnest(shingles) AS sh FROM docs)
       |)""".stripMargin

  private def verifySqlTail(thresholdFx: Long): String =
    s"""sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM posting GROUP BY doc_id
       |), inter AS (
       |  SELECT c.id1, c.id2, COUNT(*)::DOUBLE AS inter
       |  FROM cand c
       |  JOIN posting p1 ON p1.doc_id = c.id1
       |  JOIN posting p2 ON p2.doc_id = c.id2 AND p2.h = p1.h
       |  GROUP BY c.id1, c.id2
       |)
       |SELECT i.id1, i.id2,
       |  ${fxSql("i.inter / (s1.sz + s2.sz - i.inter)::DOUBLE")} AS jaccard
       |FROM inter i
       |JOIN sizes s1 ON s1.doc_id = i.id1
       |JOIN sizes s2 ON s2.doc_id = i.id2
       |WHERE ${fxSql("i.inter / (s1.sz + s2.sz - i.inter)::DOUBLE")} >= $thresholdFx
       |ORDER BY id1, id2""".stripMargin

  def minhashSql(threshold: Double = 0.5): String = {
    val sigExprs = (0 until NumHashes).map { j =>
      s"min((h * ${2 * j + 1} + ${7919 * j + 12345}) % $P) AS s$j"
    }.mkString(",\n    ")
    val bandStructs = (0 until NumBands).map { b =>
      val keyParts = (s"'$b'" +: (0 until BandRows).map(r => s"s${b * BandRows + r}"))
        .mkString("concat_ws(',', ", ", ", ")")
      s"struct_pack(band := $b, band_key := ${hash60Sql(keyParts)})"
    }.mkString("[", ",\n    ", "]")
    s"""WITH docs AS ($shinglesSqlCte),
       |$postingSqlCte,
       |sigs AS (
       |  SELECT doc_id, $sigExprs FROM posting GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, unnest($bandStructs, recursive := true) FROM sigs
       |), bounded AS (
       |  SELECT * FROM bands QUALIFY ${boundBucketsSql("band, band_key")}
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bounded a JOIN bounded b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |),
       |${verifySqlTail((threshold * 1e4).toLong)}""".stripMargin
  }

  // ---- simhash ----

  /** Per-doc 60-bit weighted simhash as two words (lo 32 bits, hi 28
    * bits), computed by the native one-pass
    * [[graft.functions.expressions.SimHashWords]] expression — a
    * zero-shuffle map (the earlier relational formulation paid an
    * explode, a repartition and a 60-aggregate groupBy per doc).
    */
  private[graft] def simhashWordsDf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val words = column(graft.functions.expressions.SimHashWords(expression(col("text"))))
    Tables.spread(spark, Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), words.as("words"))
      .filter(col("words").isNotNull)
  }

  /** Relational twin of [[simhashWordsDf]] kept as the reference
    * semantics the native expression must match (DedupSpec parity
    * test): Spark-side md5 (`hash60` column) + 60 literal-shift SUM
    * aggregates. Slower (explode + two shuffles) but built entirely
    * from Spark built-ins.
    */
  private[graft] def relationalSimhashWords(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", hash60(col("term")))
    val bitsums = tf.groupBy(col("doc_id")).agg(
      sum(col("tf") * (shiftright(col("h"), 0).bitwiseAND(1) * 2 - 1)).as("b0"),
      (1 until 60).map { i =>
        sum(col("tf") * (shiftright(col("h"), i).bitwiseAND(1) * 2 - 1)).as(s"b$i")
      }: _*)
    val lo = (0 until 32).map(i =>
      when(col(s"b$i") > 0, math.pow(2, i)).otherwise(0.0)).reduce(_ + _).cast("long")
    val hi = (32 until 60).map(i =>
      when(col(s"b$i") > 0, math.pow(2, i - 32)).otherwise(0.0)).reduce(_ + _).cast("long")
    bitsums.select(col("doc_id"), array(lo, hi).as("words"))
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
    val docs = simhashWordsDf(spark, dir)
    val lo = col("words").getItem(0)
    val hi = col("words").getItem(1)
    val banded = docs.select(col("doc_id"), col("words"),
      explode(array(
        struct(lit(0).as("band"), lo.bitwiseAND(0x7FFF).as("bits")),
        struct(lit(1).as("band"), shiftright(lo, 15).bitwiseAND(0x7FFF).as("bits")),
        struct(lit(2).as("band"), hi.bitwiseAND(0x7FFF).as("bits")),
        struct(lit(3).as("band"), shiftright(hi, 15).bitwiseAND(0x7FFF).as("bits")))).as("b"))
      .select(col("doc_id"), col("words"), col("b.band").as("band"), col("b.bits").as("bits"))
    val bounded = boundBuckets(banded, col("band"), col("bits"))
    val a = bounded.select(col("doc_id").as("id1"), col("words").as("w1"), col("band"), col("bits"))
    val b = bounded.select(col("doc_id").as("id2"), col("words").as("w2"), col("band"), col("bits"))
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
       |), bounded AS (
       |  SELECT * FROM banded QUALIFY ${boundBucketsSql("band, bits")}
       |)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::BIGINT AS hamming
       |FROM bounded a JOIN bounded b
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
  /** Minimum number of shared rare shingles for a pair to become a
    * candidate. With a highly repetitive corpus single shared rare
    * shingles produce millions of junk candidates; >=3 shared ones
    * keep every real near-dup (which shares hundreds) while cutting
    * the candidate set by orders of magnitude.
    */
  val NgramMinCommon = 3

  def ngramJaccard(spark: SparkSession, dir: String,
                   dfCap: Int = 20, threshold: Double = 0.3): DataFrame = {
    val posting = shinglePosting(spark, dir)
    val rare = posting.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") >= 2)
      .select(col("h"))
    val rarePosting = posting.join(rare, "h")
    val cand = rarePosting.select(col("h"), col("doc_id").as("id1"))
      .join(rarePosting.select(col("h"), col("doc_id").as("id2")), "h")
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= NgramMinCommon)
      .select(col("id1"), col("id2"))
    verifyJaccard(cand, posting)
      .filter(col("jaccard") >= (threshold * 1e4).toLong)
      .orderBy(col("id1"), col("id2"))
  }

  def ngramJaccardSql(dfCap: Int = 20, threshold: Double = 0.3): String =
    s"""WITH docs AS ($shinglesSqlCte),
       |$postingSqlCte,
       |rare AS (
       |  SELECT h FROM posting GROUP BY h HAVING COUNT(*) <= $dfCap AND COUNT(*) >= 2
       |), rp AS (
       |  SELECT p.doc_id, p.h FROM posting p JOIN rare USING (h)
       |), cand AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2
       |  FROM rp a JOIN rp b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $NgramMinCommon
       |),
       |${verifySqlTail((threshold * 1e4).toLong)}""".stripMargin

  // ---- embedding cosine near-dup ----

  /** Embedding near-duplicate candidates: pairs inside the same
    * random-hyperplane LSH bucket, ranked by exact cosine, top-k.
    * The bucket key bounds the pair space to ~n^2/2^planes; at scale
    * more planes (or multi-probe) tighten it further.
    */
  def embeddingPairs(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val planes = VectorSearch.lshPlanes(64)
    val e = boundBuckets(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
        .withColumn("bucket", VectorSearch.lshBucket(col("emb"), planes)),
      col("bucket"))
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
       |  QUALIFY ${boundBucketsSql("bucket")}
       |)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |  ${fxSql(VectorSearch.cosineSql("a.emb", "b.emb"), 6)} AS cosine
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |ORDER BY cosine DESC, id1, id2
       |LIMIT $k""".stripMargin
  }
}
