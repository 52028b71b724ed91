package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the events stream.
  *
  * The batch twins live in graft.operators.Analytics (eventsWindow /
  * eventsSession) and are the oracle-checked versions; these are the
  * same computations expressed as incremental streaming plans — the
  * shape a production ingest (Kafka/file source) would run. Tested by
  * feeding the events parquet through a MemoryStream-equivalent file
  * source and comparing against the batch results.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)

  final case class SessionOut(user_id: Long, n_events: Long, sum_value: Double)

  /** Tumbling 1-hour window aggregation with a 10-minute watermark —
    * identical semantics to Analytics.eventsWindow once the stream is
    * drained (append mode emits a window when the watermark passes).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization with explicit state: a session closes
    * after 30 minutes of inactivity (processing-time analogue of the
    * batch lag/cumsum version). Demonstrates
    * flatMapGroupsWithState-driven custom state at scale: state is
    * one (lastTs, count, sum) triple per user — O(users), not
    * O(events).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Double, Long), SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[(Long, Long, Double, Long)]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var (lastTs, n, sum, closedCount) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0.0, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            if (lastTs != Long.MinValue && t - lastTs > 1800 && n > 0) {
              out += SessionOut(userId, n, sum)
              n = 0L; sum = 0.0; closedCount += 1
            }
            n += 1; sum += e.value; lastTs = t
          }
          state.update((lastTs, n, sum, closedCount))
          out.iterator
      }
  }

  /** File-source streaming read of an events directory with the
    * events schema; used by tests to drive the pipelines with the
    * driver-generated parquet.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a streaming source needs a declared schema; probe the footer with
    // a batch read so either driver data generation (nanos-as-long or
    // micros-NTZ — see Tables.events) streams correctly
    def schemaWith(tsDdl: String) =
      s"event_id BIGINT, ts $tsDdl, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    spark.read.parquet(dir).schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        spark.readStream.schema(schemaWith("BIGINT")).parquet(dir)
          // integer DIV: see Tables.events — double division drifts ±1µs
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        spark.readStream.schema(schemaWith("TIMESTAMP_NTZ")).parquet(dir)
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        spark.readStream.schema(schemaWith("TIMESTAMP")).parquet(dir)
    }
  }

  /** Streaming dedup-on-ingest: keep the FIRST document per content
    * hash within the watermark horizon — the incremental form of the
    * batch content-hash dedup in graft.sources.Ingest (reference
    * lib.rs add_document skips already-present content). State is one
    * hash per distinct content, evicted when the watermark passes —
    * bounded memory at any stream rate; duplicates arriving later
    * than the horizon are handled by the periodic batch dedup job
    * (the standard lambda split).
    *
    * Input needs (ts TIMESTAMP, text STRING, ...); output adds
    * content_hash and drops in-horizon duplicates.
    */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Decontaminate-on-ingest: drop arriving documents that share any
    * [[graft.operators.Curation.DecontN]]-token shingle with the
    * held-out eval set — the streaming twin of
    * [[graft.operators.Curation.decontaminate]]. Benchmark eval sets
    * are small and static by nature, so the gate is a pure MAP:
    * one-pass [[graft.functions.expressions.ShingleHashes]] signature
    * extraction + `arrays_overlap` against the eval hash set riding
    * the plan as a broadcast literal. No join, no streaming state, no
    * watermark — the filter scales with batch size only. (At an eval
    * set too big for a literal, the same stateless shape holds with a
    * Bloom-filter broadcast: membership turns probabilistic, which
    * for decontamination only ever over-removes.)
    */
  def decontaminateStream(docs: DataFrame, evalShingles: Array[Long]): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val hashes = column(graft.functions.expressions.ShingleHashes(
      expression(col("text")), graft.operators.Curation.DecontN,
      graft.operators.Dedup.P))
    docs
      .withColumn("sh", hashes)
      .filter(!arrays_overlap(col("sh"), lit(evalShingles)))
      .drop("sh")
  }

  /** Curate-on-ingest: the streaming composition of every batch
    * [[graft.operators.Curation.curateCorpus]] gate that is
    * stream-expressible, in the batch pipeline's own precedence —
    * watermark-horizon exact dedup ([[dedupStream]] state), then the
    * three STATELESS per-document gates: eval-shingle contamination
    * ([[decontaminateStream]] broadcast literal), Gopher repetition
    * and the logistic quality margin, both reusing the batch
    * operators' exact column formulas (extracted helpers, so the
    * thresholds cannot drift between tiers). The near-dup-cluster
    * gate is deliberately absent: minhash clustering is a
    * corpus-global iterative computation, which is exactly the
    * periodic batch job of the lambda split that already catches
    * later-than-horizon exact duplicates. State stays one hash per
    * in-horizon distinct content; everything else is a map — the
    * stream sustains any rate the sink sustains.
    */
  def curateStream(docs: DataFrame, evalShingles: Array[Long]): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.operators.Curation
    val st = column(graft.functions.expressions.RepetitionStats(
      expression(col("text"))))
    val withSt = decontaminateStream(dedupStream(docs), evalShingles)
      .withColumn("rep_st", st)
    val (dupTok, topTf, _) = Curation.repetitionRatioCols(col("rep_st"))
    withSt
      .withColumn("dup_token_ratio", dupTok)
      .withColumn("top_tf_ratio", topTf)
      .filter(!(col("dup_token_ratio") > Curation.DupTokenMax ||
                col("top_tf_ratio") > Curation.TopTfMax))
      .filter(Curation.qualityZ(col("text")) >= 0.0)
      .drop("rep_st", "dup_token_ratio", "top_tf_ratio")
  }

  /** The eval-set shingle hashes for [[decontaminateStream]], from the
    * same split + sketch the batch operator uses.
    */
  def evalShingleHashes(spark: SparkSession, dir: String): Array[Long] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val hashes = column(graft.functions.expressions.ShingleHashes(
      expression(col("text")), graft.operators.Curation.DecontN,
      graft.operators.Dedup.P))
    graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % graft.operators.Curation.EvalMod === 0)
      .select(explode(hashes).as("h")).distinct()
      .collect().map(_.getLong(0)).sorted
  }

  /** Replay probe shared by the index-maintenance sinks: has
    * generation `gen` already landed in the layout at `path`? Reads a
    * gen-only projection with the equality pushed to the scan — footer
    * min/max stats prune the base build (gen is constant 0 there) and
    * every earlier generation's files, so the per-batch probe costs
    * file listing + a handful of row groups, not a full-table read. A
    * layout built before the `gen` column existed is all base rows:
    * treated as gen-0, so no appended generation can be present
    * (instead of an AnalysisException on the missing column).
    */
  private def generationPresent(layout: DataFrame, gen: Long): Boolean =
    layout.columns.contains("gen") &&
      !layout.select(col("gen")).filter(col("gen") === gen).isEmpty

  /** Streaming ingest → incremental BM25 index maintenance: each
    * micro-batch of (doc_id, text) rows appends its postings to the
    * bucketed posting table at generation baseGen + batchId via
    * [[graft.operators.Bm25.addDocuments]] — the streaming form of the
    * reference's add_document index path (sparse.rs:71: every insert
    * patches the inverted index immediately). foreachBatch is the
    * idiomatic sink here because a bucketed saveAsTable append is a
    * batch-transactional side effect Structured Streaming cannot
    * express as a direct streaming write; batchId-derived generations
    * make the sink idempotent under foreachBatch's at-least-once
    * replay: an append job either commits fully or not at all (the
    * file-output commit protocol is job-atomic), so a replayed batch
    * is detected by its generation already being present and skipped —
    * effectively-once maintenance with the single-writer
    * monotonic-generation contract intact. Probe-side plans on the
    * maintained table stay Exchange-free (see Bm25.livePostings) — the
    * stream never forces an index rebuild.
    */
  def indexStream(docs: DataFrame, tableName: String,
                  baseGen: Long = 1L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val gen = baseGen + batchId
        if (!generationPresent(spark.table(tableName), gen))
          graft.operators.Bm25.addDocuments(
            spark, tableName,
            batch.select(col("doc_id"), col("text")), gen = gen)
      }
      .start()

  /** Streaming maintenance of the persisted LSH vector index
    * (query.rs:282 save_index + lib.rs add_document, incremental
    * form): each micro-batch of (vec_id, embedding) rows is signed
    * with the SAME hyperplane family as the base build and appended
    * into the bucket-partitioned layout — new vectors land in the
    * directories probes already dynamic-prune to, so serving needs no
    * rebuild and no reader coordination (parquet appends are
    * job-atomic new files). Same effectively-once contract as
    * [[indexStream]]: batchId-derived generations, replays detected
    * by generation presence and skipped.
    */
  /** Streaming maintenance of the persisted PQ codes layout: each
    * micro-batch is encoded against the SAVED codebook (read back per
    * batch — one row, KB-scale) and its codes appended; the serving
    * path's coarse ADC pass picks new vectors up with no rebuild.
    * Codebook drift is the operator's call (reference rebuild_index
    * contract): codes are exact for whatever codebook is live, and a
    * periodic rebuildIndexes refreshes both together.
    */
  def pqIndexStream(vecs: DataFrame, path: String,
                    baseGen: Long = 1L): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val gen = baseGen + batchId
        import graft.operators.VectorSearch.{PqM, PqSubDim}
        import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
        if (!generationPresent(spark.read.parquet(path), gen)) {
          val books = spark.read.parquet(path + "_books")
          batch
            .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
            .crossJoin(broadcast(books))
            .select(col("vec_id") +: lit(gen).as("gen") +: (0 until PqM).map { m =>
              graft.sources.VectorIndex.nearestCentroidCol(
                slice(col("emb"), m * PqSubDim + 1, PqSubDim),
                col(s"book$m")).cast("int").as(s"code$m")
            }: _*)
            .write.mode("append").parquet(path)
        }
      }
      .start()

  /** Streaming maintenance of the persisted IVF cell layout: each
    * micro-batch is routed through the SAVED two-level centroid
    * relation (coarse argmin, then fine argmin within the coarse
    * cell — identical assignment to the base build, reconstructed
    * from `<path>_centroids`, KB-scale) and appended into the cell
    * directory probes already dynamic-prune to. Centroid drift is the
    * operator's call, exactly as with [[pqIndexStream]]'s codebook:
    * assignments are exact for whatever centroids are live, and
    * `VectorIndex.rebuildIfNeeded` refreshes layout + centroids
    * together once appended generations trip the heuristic. Same
    * effectively-once generation contract as [[indexStream]].
    */
  def ivfIndexStream(vecs: DataFrame, path: String, baseGen: Long = 1L,
                     stride: Int = graft.operators.VectorSearch.IvfStride)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val gen = baseGen + batchId
        def nearest(emb: org.apache.spark.sql.Column,
                    cents: org.apache.spark.sql.Column) =
          graft.sources.VectorIndex.nearestCentroidCol(emb, cents)
        if (!generationPresent(spark.read.parquet(path), gen)) {
          val fine = spark.read.parquet(path + "_centroids")
          val coarseArr = fine
            .filter(col("cid") %
              (stride.toLong * graft.operators.VectorSearch.IvfCoarse) === 0)
            .agg(collect_list(struct(col("cid"), col("cemb"))).as("carr"))
          val fineByCoarse = fine.groupBy(col("ccid"))
            .agg(collect_list(struct(col("cid"), col("cemb"))).as("fcents"))
          batch
            .select(col("vec_id"), col("embedding"),
              col("embedding").cast("array<double>").as("emb"), lit(gen).as("gen"))
            .crossJoin(broadcast(coarseArr))
            .withColumn("ccid", nearest(col("emb"), col("carr")))
            .join(broadcast(fineByCoarse), Seq("ccid"))
            .select(col("vec_id"), col("embedding"), col("gen"),
              nearest(col("emb"), col("fcents")).cast("int").as("cell"))
            .repartition(col("cell"))
            .write.mode("append").partitionBy("cell").parquet(path)
        }
      }
      .start()

  /** Streaming maintenance of the persisted IVF-PQ codes layout:
    * each micro-batch is routed through the SAVED centroids (the
    * [[ivfIndexStream]] cell assignment) AND encoded through the
    * SAVED codebook (the [[pqIndexStream]] codes), appended into the
    * cell directories the probe dynamic-prunes to — every persisted
    * layout keeps its generation-keyed, replay-safe upkeep path.
    * Pair with the flat-store append for the same vectors: the
    * serving rescore reads full vectors by id from the flat table
    * (see annIvfPqFromIndex's contract note), so index upkeep and
    * store ingest are two halves of one logical write.
    */
  def ivfPqIndexStream(vecs: DataFrame, path: String, baseGen: Long = 1L,
                       stride: Int = graft.operators.VectorSearch.IvfStride)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val gen = baseGen + batchId
        import graft.operators.VectorSearch.{PqM, PqSubDim}
        def nearest(emb: org.apache.spark.sql.Column,
                    cents: org.apache.spark.sql.Column) =
          graft.sources.VectorIndex.nearestCentroidCol(emb, cents)
        if (!generationPresent(spark.read.parquet(path), gen)) {
          val fine = spark.read.parquet(path + "_centroids")
          val books = spark.read.parquet(path + "_books")
          val coarseArr = fine
            .filter(col("cid") %
              (stride.toLong * graft.operators.VectorSearch.IvfCoarse) === 0)
            .agg(collect_list(struct(col("cid"), col("cemb"))).as("carr"))
          val fineByCoarse = fine.groupBy(col("ccid"))
            .agg(collect_list(struct(col("cid"), col("cemb"))).as("fcents"))
          batch
            .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
            .crossJoin(broadcast(coarseArr))
            .withColumn("ccid", nearest(col("emb"), col("carr")))
            .join(broadcast(fineByCoarse), Seq("ccid"))
            .crossJoin(broadcast(books))
            .select(col("vec_id") +: lit(gen).as("gen") +:
              nearest(col("emb"), col("fcents")).cast("int").as("cell") +:
              (0 until PqM).map { m =>
                nearest(slice(col("emb"), m * PqSubDim + 1, PqSubDim),
                  col(s"book$m")).cast("int").as(s"code$m")
              }: _*)
            .repartition(col("cell"))
            .write.mode("append").partitionBy("cell").parquet(path)
        }
      }
      .start()

  /** Streaming maintenance of the persisted kNN-GRAPH layout — the
    * last rebuild-only layout gains the generation-keyed upkeep path
    * every other index has. Each micro-batch's vectors get their
    * neighbor lists computed INCREMENTALLY (reference query.rs
    * add_document: search the existing index for the new point's
    * neighbors, never rebuild) via
    * [[graft.operators.VectorSearch.knnForProbes]]: resident layout ∪
    * batch as candidates, batch as probes — bucket-blocked with the
    * same plane family and salt subdivision as the base build, so a
    * batch appends in O(batch × bucket) work at any corpus size, and
    * batch vectors can neighbor each other (two clones arriving
    * together find one another). Rows land as (vec_id, embedding,
    * neighbors, gen); [[graft.sources.PointServe.Graph.refresh]]
    * folds them in and back-links reverse edges resident-side. Same
    * effectively-once generation contract as [[indexStream]].
    */
  def knnGraphIndexStream(vecs: DataFrame, path: String,
                          baseGen: Long = 1L): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val gen = baseGen + batchId
        import graft.operators.VectorSearch
        if (!generationPresent(spark.read.parquet(path), gen)) {
          val newVecs = batch
            .select(col("vec_id"), col("embedding"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val asEmb = newVecs
              .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
            val cands = spark.read.parquet(path)
              .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
              .unionByName(asEmb)
            val probes = asEmb.select(col("vec_id").as("query_id"), col("emb").as("qv"))
            val adj = VectorSearch.knnForProbes(cands, probes)
              .groupBy(col("query_id"))
              .agg(sort_array(collect_list(struct(col("rank"), col("vec_id"))))
                .as("ranked"))
              .select(col("query_id").as("vec_id"),
                expr("transform(ranked, e -> e.vec_id)").as("neighbors"))
            newVecs
              .join(adj.hint("shuffle_hash"), Seq("vec_id"), "left")
              .withColumn("neighbors",
                coalesce(col("neighbors"), expr("array()").cast("array<bigint>")))
              .withColumn("gen", lit(gen))
              .write.mode("append").parquet(path)
          } finally newVecs.unpersist()
        }
      }
      .start()

  /** Streaming maintenance of the persisted MinHash band layout
    * ([[graft.sources.VectorIndex.buildMinhashIndex]]; reference
    * sparse.rs:71 add_document — the signature index is maintained,
    * never rebuilt per batch): each micro-batch of (doc_id, text)
    * rows is shingled and banded with the SAME permutation family as
    * the base build; band rows append into the (band, bkt)
    * directories incremental-dedup probes already prune to, and the
    * doc-level shingle sketches append into the companion `_sh`
    * relation so verification covers the new docs too. Same
    * effectively-once contract as [[indexStream]]: batchId-derived
    * generations, replays detected and skipped. The `_sh` append runs
    * BEFORE the band append — the probed main layout's generation
    * marker is the commit point, so a crash between the two jobs
    * leaves orphan sketches (harmless: joined only via candidates),
    * never bands whose verify side is missing.
    */
  def minhashIndexStream(docs: DataFrame, path: String,
                         baseGen: Long = 1L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val gen = baseGen + batchId
        import graft.operators.Dedup
        import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
        if (!generationPresent(spark.read.parquet(path), gen)) {
          // the base build's persisted sub-bucket modulus: appending
          // under any other value would land rows in directories the
          // probe never prunes to
          val bktMod = spark.read.parquet(path + "_meta")
            .head.getAs[Long]("bkt_mod")
          val sh = batch
            .select(col("doc_id"),
              column(graft.functions.expressions.ShingleHashes(
                expression(col("text")), 3, Dedup.P)).as("sh"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (!generationPresent(spark.read.parquet(path + "_sh"), gen))
              sh.select(col("doc_id"), col("sh"), lit(gen).as("gen"))
                .write.mode("append").parquet(path + "_sh")
            Dedup.minhashBands(sh)
              .withColumn("bkt", pmod(col("band_key"), lit(bktMod)).cast("int"))
              .withColumn("gen", lit(gen))
              .repartition(col("band"), col("bkt"))
              // same band_key clustering as the base build: appended
              // files keep row-group min/max stats probe-tight
              .sortWithinPartitions(col("band"), col("bkt"), col("band_key"))
              .write.mode("append").partitionBy("band", "bkt").parquet(path)
          } finally sh.unpersist()
        }
      }
      .start()

  def vectorIndexStream(vecs: DataFrame, path: String,
                        baseGen: Long = 1L): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val gen = baseGen + batchId
        val planes = graft.operators.VectorSearch.lshPlanes(
          64, graft.operators.VectorSearch.AnnLshPlanes)
        if (!generationPresent(spark.read.parquet(path), gen))
          batch
            .select(col("vec_id"), col("embedding"), lit(gen).as("gen"))
            .withColumn("bucket", graft.operators.VectorSearch.lshBucket(
              col("embedding").cast("array<double>"), planes).cast("int"))
            .repartition(col("bucket"))
            .write.mode("append").partitionBy("bucket").parquet(path)
      }
      .start()
}
