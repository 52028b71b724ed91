package graft

import org.apache.spark.sql.functions._

/** Bucketed store layout: the §4 claim that fact-fact joins are
  * co-located by pre-partitioning, proven on the executed plan — a
  * bucketed lineitem ⋈ orders join must plan ZERO exchanges below the
  * join, while the identical join over the raw parquet shuffles both
  * sides. Broadcast and AQE are disabled inside the test so the
  * shuffle structure is what's compared (at 100 TB neither side of a
  * fact-fact join broadcasts anyway).
  */
class StoreLayoutSpec extends GraftSuite {

  test("bucketed fact tables join co-located, raw parquet shuffles both sides") {
    dropHard("li_bucketed", "ord_bucketed")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val buckets = 8
      Tables.lineitem(spark, sf).write
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf).write
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      def revenueByPriority(li: org.apache.spark.sql.DataFrame,
                            o: org.apache.spark.sql.DataFrame) =
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
               OracleNum.fx(sum(col("l_quantity"))).as("qty"))

      val bucketed = revenueByPriority(
        spark.table("li_bucketed"), spark.table("ord_bucketed"))
      // pin the store switch off: another suite may have registered
      // the graft_*_bkt layout for sf, and this test's raw side must
      // be genuinely raw for the shuffle-count contrast to hold
      val raw = sources.StoreLayout.withRawStore(spark)(revenueByPriority(
        Tables.lineitem(spark, sf), Tables.orders(spark, sf)))

      // identical results either way (sorted here, not in the plan —
      // a global orderBy would add a range Exchange to both counts)
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.head.toString)
      assert(sorted(bucketed).toSeq == sorted(raw).toSeq)

      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

      // bucketed: the ONLY exchange is the tiny post-join aggregate;
      // the join reads co-located buckets directly
      assert(exchanges(bucketed) == 1,
        s"bucketed join should not shuffle:\n${bucketed.queryExecution.executedPlan}")
      // raw parquet: both join sides shuffle + the aggregate
      assert(exchanges(raw) == 3,
        s"raw join should shuffle both sides:\n${raw.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      dropHard("li_bucketed", "ord_bucketed")
    }
  }

  test("the Tables switch serves the bucketed store: q5/q9/q12/q21 drop their fact-fact exchanges, rows unchanged") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      sources.StoreLayout.ensureBucketedFacts(spark, sf)

      def shuffles(df: DataFrame): Int =
        df.queryExecution.executedPlan.collect { case _: ShuffleExchangeLike => 1 }.sum
      def rows(df: DataFrame): Seq[Seq[Any]] =
        df.collect().toSeq.map(_.toSeq)

      for ((name, q) <- Seq[(String, () => DataFrame)](
          "q5"  -> (() => operators.Analytics.q5(spark, sf)),
          "q9"  -> (() => operators.Analytics.q9(spark, sf)),
          "q21" -> (() => operators.Analytics.q21(spark, sf)),
          "q12" -> (() => operators.Analytics.q12(spark, sf)),
          // the per-user window family: bucketed events feed WindowExec
          // with no exchange (user_id distribution + in-file sort)
          "events_session" -> (() => operators.Analytics.eventsSession(spark, sf)))) {
        val bucketed = q() // switch is on: layout registered for sf
        val raw = sources.StoreLayout.withRawStore(spark)(q())
        // every order-keyed fact exchange is elided; ONLY the plans
        // differ — never the rows
        assert(shuffles(bucketed) < shuffles(raw),
          s"$name bucketed=${shuffles(bucketed)} raw=${shuffles(raw)}:\n" +
            bucketed.queryExecution.executedPlan)
        assert(rows(bucketed) == rows(raw), s"$name rows must not change with layout")
      }

      // the headline claim, pinned exactly: bucketed lineitem ⋈ orders
      // on the bucket key plans ZERO exchanges below the aggregate
      val join = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(shuffles(join) == 1, // the types-sized post-join aggregate only
        s"bucketed fact-fact join must not shuffle:\n${join.queryExecution.executedPlan}")

      // dir guard: a layout built from THIS dir is never served for
      // another dir — the switch falls back to that dir's raw parquet
      val other = "/root/testdata/sf0.01"
      assert(sources.StoreLayout.bucketedOrNone(spark, other, "lineitem").isEmpty)

      // conf pin: off disables the switch even with the layout present
      sources.StoreLayout.withRawStore(spark) {
        assert(sources.StoreLayout.bucketedOrNone(spark, sf, "lineitem").isEmpty)
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      sources.StoreLayout.dropBucketedFacts(spark)
    }
  }

  test("z-order layout prunes files for a non-lead-column box predicate; single-column sort cannot") {
    import org.apache.spark.sql.DataFrame
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
    val numFiles = 32
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
    sources.Ingest.zorderWrite(ev, Seq("user_id", "day"), zDir, numFiles)
    // the [[Ingest.compact]] shape generalized to N files: lead-column
    // range partitioning + in-file sort — the baseline layout
    ev.repartitionByRange(numFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(linDir)

    // footer-stat pruning, measured directly: a file is a CANDIDATE
    // for a box predicate iff its [min,max] interval overlaps the box
    // on every clustered column — exactly parquet's row-group skip rule
    // ~4 of the 30 uniform days — a narrow box on the NON-lead column
    val (dayLo, dayHi) = (13L, 16L)
    def candidates(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("day")).as("dlo"), max(col("day")).as("dhi"))
        .filter(col("dhi") >= dayLo && col("dlo") <= dayHi)
        .count()
    def files(dir: String): Long =
      spark.read.parquet(dir).select(input_file_name()).distinct().count()

    // layout must never change content: the filtered row sets agree
    def rows(dir: String): Set[Long] =
      spark.read.parquet(dir).filter(col("day").between(dayLo, dayHi))
        .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(rows(zDir) == rows(linDir))

    // single-column sort: every file spans the full day range — zero
    // pruning for a day predicate. z-order: day bits are interleaved
    // into the file order, so a ~1/10 day box must skip files.
    assert(candidates(linDir) == files(linDir),
      "lead-column layout should have no day pruning (that is the point)")
    assert(candidates(zDir) <= files(zDir) / 2,
      s"z-order should skip at least half the files for a narrow day box: " +
        s"${candidates(zDir)} of ${files(zDir)} candidates")
  }
}
