package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed fact-table store — the §4 scale lever wired into the
  * query path.
  *
  * At 100 TB the dominant cost in every TPC-H-shaped anchor is the
  * fact-fact shuffle: lineitem ⋈ orders repartitions BOTH corpora on
  * l_orderkey/o_orderkey for every query that joins them. Bucketing
  * both facts by order key once at ingest (the classic warehouse
  * layout; reference storage/mod.rs keeps per-shard clustered
  * segments for the same reason) makes that join — and every
  * order-keyed self-join and aggregate above it — exchange-free
  * forever after: the scan itself reports
  * HashPartitioning(orderkey, buckets), so Catalyst elides the
  * Exchange under joins keyed on the bucket column and under any
  * aggregate whose grouping keys contain it.
  *
  * [[ensureBucketedFacts]] builds the layout (idempotent per source
  * dir); [[bucketedOrNone]] is the switch [[graft.Tables]] consults on
  * every fact read — bucketed when a layout built from the SAME
  * source dir is registered (and `spark.graft.store.bucketed` is not
  * "off"), raw parquet otherwise. Results are identical either way
  * (same rows, different physical layout); the q5/q9/q21 `_bucketed`
  * driver twins run the UNMODIFIED query bodies through this switch
  * against the raw twins' oracle SQL, proving it end-to-end.
  *
  * Bucket count: 32 locally (one per core at local[32]); at cluster
  * scale pick ~2-4× executor count so each bucket file stays well
  * under `maxPartitionBytes` — the layout is rebuilt by the same call
  * with a different `buckets`.
  */
object StoreLayout {

  /** Session conf: "auto" (default — use the bucketed layout when one
    * built from the requested dir is registered) or "off" (always raw
    * parquet; the raw driver twins pin this during plan build so the
    * raw-vs-bucketed bench comparison stays honest).
    */
  val ConfKey = "spark.graft.store.bucketed"

  /** Table property recording the source dir a layout was built from
    * — the guard that a layout is never served for a different SF.
    */
  val DirProp = "graft.sf.dir"

  val DefaultBuckets = 32

  /** fact name → (catalog table, bucket column, in-file sort columns).
    * lineitem/orders bucket on the order key — the fact-fact join key;
    * events buckets on user_id with a (user_id, ts, event_id) in-file
    * sort: every per-user window (sessionize, as-of, funnel, markov,
    * retention cohorts) requires exactly that distribution+ordering,
    * so the bucketed scan feeds WindowExec with no exchange — the
    * dominant shuffle of the whole events family at scale.
    */
  private val facts: Map[String, (String, String, Seq[String])] = Map(
    "lineitem" -> (("graft_lineitem_bkt", "l_orderkey", Seq("l_orderkey"))),
    "orders"   -> (("graft_orders_bkt", "o_orderkey", Seq("o_orderkey"))),
    "events"   -> (("graft_events_bkt", "user_id", Seq("user_id", "ts", "event_id"))))

  /** catalog table → source dir, memoized (the catalog round-trip is
    * paid once per JVM per table; ensure() updates it directly).
    */
  private val builtFor = scala.collection.concurrent.TrieMap.empty[String, String]

  private def registeredDir(spark: SparkSession, tbl: String): Option[String] =
    builtFor.get(tbl).orElse {
      if (!spark.catalog.tableExists(tbl)) None
      else {
        val dir = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
          .properties.get(DirProp)
        dir.foreach(builtFor(tbl) = _)
        dir
      }
    }

  /** Build (or reuse) the bucketed lineitem/orders layout for `dir`.
    * Idempotent: a registered layout built from the same dir is kept;
    * anything else (absent, or built from another dir) is rewritten.
    */
  def ensureBucketedFacts(spark: SparkSession, dir: String,
                          buckets: Int = DefaultBuckets): Unit = synchronized {
    facts.foreach { case (fact, (tbl, key, sortCols)) =>
      if (!registeredDir(spark, tbl).contains(dir)) {
        // a prior JVM's in-memory catalog died but its managed files
        // survived in the warehouse — saveAsTable refuses to CREATE
        // over an existing location, so reclaim the orphan first
        // (never reached when the table IS registered for this dir)
        if (!spark.catalog.tableExists(tbl)) {
          val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
          val orphan = new java.io.File(wh, tbl)
          if (orphan.exists()) {
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) f.listFiles().foreach(rm)
              f.delete(): Unit
            }
            rm(orphan)
          }
        }
        // repartition on the bucket key with numPartitions == buckets:
        // repartition and bucketing share the same murmur3-pmod hash,
        // so each bucket gets exactly ONE file — required for the scan
        // to report its sortBy ordering (multi-file buckets forfeit
        // it), which is what keeps the downstream merge join sort-free.
        // events goes through the normalizing raw loader so the stored
        // ts column is already epoch-exact TimestampType — the switch
        // then serves it without re-normalizing.
        val src =
          if (fact == "events") graft.Tables.eventsRaw(spark, dir)
          else spark.read.parquet(s"$dir/$fact.parquet")
        src
          .repartition(buckets, org.apache.spark.sql.functions.col(key))
          .write
          .mode("overwrite")
          .bucketBy(buckets, key)
          .sortBy(sortCols.head, sortCols.tail: _*)
          .saveAsTable(tbl)
        spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('$DirProp' = '$dir')")
        builtFor(tbl) = dir
      }
    }
  }

  /** Drop the bucketed layout (test hygiene / layout migration). */
  def dropBucketedFacts(spark: SparkSession): Unit = synchronized {
    facts.values.foreach { case (tbl, _, _) =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      builtFor.remove(tbl)
    }
  }

  /** The switch: Some(bucketed relation) iff a layout built from
    * `dir` is registered for `fact` and the session hasn't pinned the
    * store off.
    */
  def bucketedOrNone(spark: SparkSession, dir: String, fact: String): Option[DataFrame] =
    facts.get(fact).flatMap { case (tbl, _, _) =>
      if (spark.conf.get(ConfKey, "auto") == "off") None
      else if (registeredDir(spark, tbl).contains(dir)) Some(spark.table(tbl))
      else None
    }

  /** Run `body` with the bucketed store pinned off — used by the raw
    * driver twins so their PLAN BUILD reads raw parquet even when a
    * bucketed layout is registered (plan construction reads the conf;
    * execution of the already-built plan is unaffected by restore).
    */
  def withRawStore[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, "off")
    try body finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None    => spark.conf.unset(ConfKey)
    }
  }
}
