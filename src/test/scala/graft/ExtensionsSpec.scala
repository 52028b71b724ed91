package graft

import graft.operators.{DocOps, HybridSearch}
import graft.sources.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

class ExtensionsSpec extends GraftSuite {

  test("SQL functions cosine_sim / dot_prod register via extensions") {
    TestSpark.withExtensionsSession { s2 =>
      val r = s2.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "dot_prod(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 11.0)
    }
  }

  test("the full native-kernel surface registers as SQL functions") {
    TestSpark.withExtensionsSession { s2 =>
      // every SQL call must equal its DataFrame/kernel twin
      val txt = "Spark Vector engines stream spark vector data"
      val r = s2.sql(
        s"""SELECT simhash64('$txt') AS sh,
           |  gram_fingerprint('$txt') AS fp,
           |  repetition_stats('$txt') AS rs,
           |  term_freqs('$txt') AS tf,
           |  shingles('$txt', 2) AS sg,
           |  mock_embed('$txt', 8) AS me,
           |  byte_features(encode('$txt', 'utf-8')) AS bf""".stripMargin).head
      import org.apache.spark.unsafe.types.UTF8String
      val u = UTF8String.fromString(txt)
      assert(r.getSeq[Long](r.fieldIndex("sh")) ==
        graft.functions.expressions.SimHashWords.compute(u).toLongArray().toSeq)
      assert(r.getSeq[Long](r.fieldIndex("fp")) ==
        graft.functions.expressions.GramFingerprint.compute(u).toLongArray().toSeq)
      assert(r.getSeq[Long](r.fieldIndex("rs")) ==
        graft.functions.expressions.RepetitionStats.compute(u).toLongArray().toSeq)
      assert(r.getSeq[String](r.fieldIndex("sg")).contains("spark vector"))
      val me = r.getSeq[Double](r.fieldIndex("me"))
      assert(me.length == 8 &&
        math.abs(me.map(x => x * x).sum - 1.0) < 1e-9, "unit-normalized")
      assert(r.getSeq[Long](r.fieldIndex("bf")).nonEmpty)
      // constant-arg guard: a non-constant dim is a clear error, a
      // NULL constant too (not an NPE), and a foldable expression is
      // accepted like a bare literal
      val err = intercept[Exception](
        s2.sql("SELECT mock_embed('x', CAST(rand()*4 AS INT))").head)
      assert(err.getMessage.contains("constant"))
      val errNull = intercept[Exception](s2.sql("SELECT shingles('x', NULL)").head)
      assert(errNull.getMessage.contains("constant"))
      assert(s2.sql("SELECT mock_embed('x', 2+6) AS e").head
        .getSeq[Double](0).length == 8)
    }
  }

  test("media content kernels register as SQL functions and match their kernel twins") {
    TestSpark.withExtensionsSession { s2 =>
      import graft.functions.expressions.{FrameHashes, MediaAHash, ParseMediaHeader, PcmEnergy, SynthMedia}
      import org.apache.spark.unsafe.types.UTF8String
      val payload = "media kernel sql surface check payload bytes"
      val bmp = SynthMedia.compute(payload.getBytes("UTF-8"),
        UTF8String.fromString("image"))
      val hx = bmp.map("%02x".format(_)).mkString
      val r = s2.sql(
        s"""SELECT parse_media(unhex('$hx')) AS pm,
           |  media_ahash(unhex('$hx')) AS ah,
           |  pcm_energy(unhex('$hx')) AS pe,
           |  frame_hashes(unhex('$hx')) AS fh""".stripMargin).head
      assert(r.getSeq[Long](r.fieldIndex("pm")) ==
        ParseMediaHeader.compute(bmp).toLongArray().toSeq)
      assert(r.getLong(r.fieldIndex("ah")) == MediaAHash.compute(bmp))
      assert(r.getSeq[Long](r.fieldIndex("pe")) ==
        PcmEnergy.compute(bmp).toLongArray().toSeq)
      assert(r.getSeq[Long](r.fieldIndex("fh")) ==
        FrameHashes.compute(bmp).toLongArray().toSeq)
    }
  }

  test("CapResultLimit optimizer rule caps literal limits above the ceiling") {
    TestSpark.withExtensionsSession { s2 =>
      import s2.implicits._
      val df = (1 to 500).toDF("x").orderBy(col("x"))
      assert(df.limit(400).count() == 400)           // rule inert w/o conf
      s2.conf.set(graft.plans.CapResultLimit.ConfKey, "100")
      try {
        assert(df.limit(400).count() == 100)         // capped
        assert(df.limit(50).count() == 50)           // below ceiling untouched
      } finally s2.conf.unset(graft.plans.CapResultLimit.ConfKey)
    }
  }

  test("MinSimilarityThreshold rule filters sub-threshold scores under tagged top-k sorts") {
    TestSpark.withExtensionsSession { s2 =>
      import org.apache.spark.sql.functions.when
      // range-backed (not a LocalRelation) so ConvertToLocalRelation
      // cannot fold the inserted Filter away before we inspect the plan
      val base = s2.range(1, 5).select(col("id").as("doc_id"),
        when(col("id") === 1, 500L).when(col("id") === 2, 1500L)
          .when(col("id") === 3, 2500L).otherwise(900L).as("v"))
      val tagged = base.select(col("doc_id"),
        col("v").as("score", graft.plans.ScoreTag.metadata))
      val topk = tagged.orderBy(col("score").desc).limit(10)
      assert(topk.count() == 4)                      // rule inert w/o conf
      s2.conf.set(graft.plans.MinSimilarityThreshold.ConfKey, "1000")
      try {
        val guarded = tagged.orderBy(col("score").desc).limit(10)
        assert(guarded.collect().map(_.getLong(0)).toSeq == Seq(3L, 2L))
        val optimized = guarded.queryExecution.optimizedPlan.toString
        assert(optimized.contains(">= 1000.0"), s"no threshold filter in:\n$optimized")
        // non-score sorts are untouched
        assert(tagged.orderBy(col("doc_id").desc).limit(10).count() == 4)
        // a NON-graft query ordering by its own column that merely
        // happens to be named "score" carries no tag — untouched
        val foreign = base.select(col("doc_id"), col("v").as("score"))
        assert(foreign.orderBy(col("score").desc).limit(10).count() == 4)
        // the real operator surface IS tagged: a graft search sorts on
        // a tagged score, so the rule fires on it
        val opPlan = graft.operators.Bm25.search(s2, sf)
          .queryExecution.optimizedPlan.toString
        assert(opPlan.contains(">= 1000.0"), s"operator sort untagged:\n$opPlan")
        // malformed conf value degrades to rule-inert, never throws out
        // of the optimizer
        s2.conf.set(graft.plans.MinSimilarityThreshold.ConfKey, "not-a-number")
        assert(tagged.orderBy(col("score").desc).limit(10).count() == 4)
      } finally s2.conf.unset(graft.plans.MinSimilarityThreshold.ConfKey)
    }
  }

  test("sparse vectors: per-doc relative frequencies sum to ~1") {
    import org.apache.spark.sql.functions._
    val sums = graft.operators.Bm25.sparseVectors(spark, sf)
      .groupBy(col("doc_id")).agg(sum(col("weight")).as("s")).collect()
    // weights are fixed-point 1e6; rounding drift stays tiny
    assert(sums.forall(r => math.abs(r.getAs[Long]("s") - 1000000L) < 200))
  }

  test("normalized fusion bounds branch scores to [0,1] weights") {
    val rows = HybridSearch.normalized(spark, sf).collect()
    assert(rows.length == 20)
    // max possible fused score = sum of weights = 1.0
    assert(rows.forall(r => r.getAs[Long]("score") <= 1000000L))
  }

  test("cursor scroll seeks past the cursor without OFFSET") {
    val rows = DocOps.scroll(spark, sf, cursor = 199, pageSize = 50).collect()
    assert(rows.length == 50)
    assert(rows.head.getAs[Long]("doc_id") == 200)
    val plan = DocOps.scroll(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(doc_id,199)"), s"seek not pushed:\n$plan")
  }

  test("bucketed posting table serves BM25 with no exchange on the term aggregate") {
    import graft.operators.Bm25
    dropHard("posting_bucketed", "posting_bucketed_dels")
    Bm25.buildPostingTable(spark, sf, "posting_bucketed")
    try {
      // identical scores from the materialized index
      val fromTable = Bm25.searchFromTable(spark, "posting_bucketed").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
      val direct = Bm25.search(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
      assert(fromTable == direct)
      // bucketing by term removes the shuffle before the per-term agg
      val plan = spark.table("posting_bucketed")
        .groupBy(col("term")).count()
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected bucket-pruned agg plan:\n$plan")
    } finally dropHard("posting_bucketed", "posting_bucketed_dels")
  }

  test("upsert keeps incoming rows over stored rows; compact bounds files per lang") {
    val storeDir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    Ingest.ingestDocuments(spark, sf, storeDir)
    val store = spark.read.parquet(storeDir)
    val n0 = store.count()
    // re-upsert a batch overlapping the store: same contents, new ids
    val batch = graft.Tables.documents(spark, sf)
      .withColumn("doc_id", col("doc_id") + 10000L)
    val merged = Ingest.upsert(store, batch)
    assert(merged.count() == n0, "upsert must not grow the store for duplicate content")
    // incoming rows won: every surviving id is from the new batch
    assert(merged.filter(col("doc_id") < 10000L).count() == 0)

    val compactDir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    Ingest.compact(spark, storeDir, compactDir, filesPerPartition = 1)
    val langDirs = new java.io.File(compactDir).listFiles().filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    langDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"expected 1 file in ${d.getName}, got ${files.length}")
    }
    assert(spark.read.parquet(compactDir).count() == n0)
  }

  test("JSONL interchange round-trips the documents table exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = graft.Tables.documents(spark, sf)
    Ingest.exportJsonl(docs, out)
    // gzip'd part files, schema-pinned read, no inference pass
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".json.gz")))
    val back = Ingest.importJsonl(spark, out)
    assert(back.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val orig = docs.collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == orig, "round trip altered rows")
    // a corrupt line is QUARANTINED: dropped, never an all-null row,
    // and never a job failure
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "bad.json"),
      "{not json at all".getBytes("UTF-8"))
    val withBad = Ingest.importJsonl(spark, out)
    assert(withBad.count() == orig.size, "corrupt line leaked or dropped good rows")
    assert(withBad.filter(col("doc_id").isNull).count() == 0, "all-null ghost row admitted")
  }

  test("incremental posting maintenance: upsert/delete visible, probe shuffle-free, compaction folds the log") {
    import graft.operators.Bm25
    import spark.implicits._
    dropHard("posting_inc", "posting_inc_dels", "posting_inc_compacting", "posting_inc_retired")
    Bm25.buildPostingTable(spark, sf, "posting_inc")
    try {
      val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val newId = docs.agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0) + 1L
      // upsert: replace doc 1's text, add a brand-new doc; delete doc 2
      val batch = Seq(
        (1L, "spark spark vector window stream join"),
        (newId, "stream window join vector spark")).toDF("doc_id", "text")
      Bm25.addDocuments(spark, "posting_inc", batch, gen = 1L)
      Bm25.removeDocuments(spark, "posting_inc", Seq(2L), gen = 1L)

      // scores from the maintained index == direct BM25 over the
      // equivalently patched corpus — no rebuild happened
      def topk(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
      val patched = docs.filter(!col("doc_id").isin(1L, 2L)).unionByName(batch)
      val expected = topk(Bm25.searchDocs(spark, patched))
      assert(topk(Bm25.searchFromTable(spark, "posting_inc")) == expected)

      // probe side after maintenance: the live view adds only a
      // BroadcastExchange for the tombstone log — zero shuffles over
      // the bucketed scan
      val livePlan = Bm25.livePostings(spark, "posting_inc")
        .filter(col("term").isin("spark", "vector"))
        .groupBy(col("term")).count()
        .queryExecution.executedPlan.toString
      assert(!livePlan.contains("Exchange hashpartitioning"),
        s"maintained probe gained a shuffle:\n$livePlan")

      // compaction folds the log: same results, physically-removed dead
      // rows, empty log, bucket spec intact (still shuffle-free agg)
      val liveRows = Bm25.livePostings(spark, "posting_inc").count()
      Bm25.compactPostingTable(spark, "posting_inc")
      assert(topk(Bm25.searchFromTable(spark, "posting_inc")) == expected)
      assert(spark.table("posting_inc").count() == liveRows)
      assert(spark.table(Bm25.deleteLogTable("posting_inc")).isEmpty)
      val compactPlan = spark.table("posting_inc")
        .groupBy(col("term")).count()
        .queryExecution.executedPlan.toString
      assert(!compactPlan.contains("Exchange"),
        s"bucket spec lost in compaction:\n$compactPlan")
    } finally dropHard("posting_inc", "posting_inc_dels", "posting_inc_compacting", "posting_inc_retired")
  }

  test("posting stats surface tracks add/remove/compaction and clear empties the index") {
    import graft.operators.Bm25
    import spark.implicits._
    dropHard("posting_stats", "posting_stats_dels", "posting_stats_compacting", "posting_stats_retired")
    Bm25.buildPostingTable(spark, sf, "posting_stats")
    try {
      def stats() = Bm25.postingStats(spark, "posting_stats").head
      val s0 = stats()
      assert(s0.getAs[Long]("n_docs") == Tables.documents(spark, sf).count())
      assert(s0.getAs[Long]("n_terms") > 0 && s0.getAs[Long]("n_posting_rows") > 0)
      assert(s0.getAs[Double]("avgdl") > 0.0)
      assert(s0.getAs[Long]("est_bytes") > s0.getAs[Long]("n_posting_rows") * 20L)

      val newId = s0.getAs[Long]("n_docs") + 1000L
      Bm25.addDocuments(spark, "posting_stats",
        Seq((newId, "posting stats surface doc")).toDF("doc_id", "text"), gen = 1L)
      val s1 = stats()
      assert(s1.getAs[Long]("n_docs") == s0.getAs[Long]("n_docs") + 1)
      assert(s1.getAs[Long]("n_posting_rows") == s0.getAs[Long]("n_posting_rows") + 4)

      // kills doc 1 (gen 0) and the gen-1 addition alike
      Bm25.removeDocuments(spark, "posting_stats", Seq(1L, newId), gen = 1L)
      val s2 = stats()
      assert(s2.getAs[Long]("n_docs") == s0.getAs[Long]("n_docs") - 1)

      // compaction rewrites files, never the stats
      Bm25.compactPostingTable(spark, "posting_stats")
      assert(stats().toSeq == s2.toSeq)

      Bm25.clearPostingTable(spark, "posting_stats")
      val s4 = stats()
      assert(Seq("n_docs", "n_terms", "n_posting_rows", "est_bytes")
        .forall(s4.getAs[Long](_) == 0L))
      assert(s4.getAs[Double]("avgdl") == 0.0)
    } finally dropHard("posting_stats", "posting_stats_dels", "posting_stats_compacting", "posting_stats_retired")
  }

  test("snapshot isolates a store state from later appends (backup/checkpoint)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val store = java.nio.file.Files.createTempDirectory("graft_snap_store").toString
    val snap = java.nio.file.Files.createTempDirectory("graft_snap_manifest").toString
    Ingest.ingestDocuments(spark, sf, store)
    val before = spark.read.parquet(store).count()
    Ingest.snapshot(spark, store, snap)
    // later micro-batch appends new files to the live store
    spark.read.parquet(store).limit(1)
      .withColumn("doc_id", lit(900001L))
      .withColumn("text", lit("zz snapshot isolation test doc"))
      .withColumn("content_hash", graft.functions.TextFunctions.hash60(col("text")))
      .write.mode("append").partitionBy("lang").parquet(store)
    assert(spark.read.parquet(store).count() == before + 1)
    // the snapshot still reads the exact pre-append file set, with
    // partition columns intact
    val snapDf = Ingest.readSnapshot(spark, snap)
    assert(snapDf.count() == before)
    assert(snapDf.columns.contains("lang"))
    assert(snapDf.filter(col("doc_id") === 900001L).isEmpty)
  }

  test("ingest dedups by content hash and partitions by lang") {
    val out = java.nio.file.Files.createTempDirectory("graft_store").toString
    Ingest.ingestDocuments(spark, sf, out)
    val written = spark.read.parquet(out)
    assert(written.count() == written.select(col("content_hash")).distinct().count())
    // partition pruning works: per-lang read touches one directory
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("lang=")))
    assert(written.filter(col("lang") === "en").count() > 0)
  }
}
