package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan and timed
  * noop-write execution for the named `SparkEntry.queries` entries
  * (all queries when no names are given). Same session shape as
  * [[Bench]] so the plans match what the benchmark executes.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt -batch "runMain graft.Explain dedup_ngram filter_nested_ops"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-pass job/stage/task census: at local scale most warm time is
    // scheduling floor, so the stage count IS the cost model — print it
    // next to the timing so plan work targets the real lever
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    names.foreach { n =>
      val tb0 = System.nanoTime()
      var df = SparkEntry.queries(n)(spark, sfDir)
      println(f"[explain-build] $n build1 ${(System.nanoTime() - tb0) / 1e9}%.3f s")
      // second build: the bench calls fn() fresh every pass, so the
      // WARM build cost (driver jobs at construction + re-planning) is
      // part of every measured pass — surface it separately
      if (!sys.env.contains("SPARK_GRAFT_EXPLAIN_NOTIME")) {
        val tb1 = System.nanoTime()
        df = SparkEntry.queries(n)(spark, sfDir)
        println(f"[explain-build] $n build2 ${(System.nanoTime() - tb1) / 1e9}%.3f s")
      }
      println(s"==== $n ====")
      df.explain("formatted")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_LOGICAL")) {
        println(s"---- $n analyzed ----")
        println(df.queryExecution.analyzed.treeString)
        println(s"---- $n optimized ----")
        println(df.queryExecution.optimizedPlan.treeString)
      }
      // plan-only mode: skip the timed executions (used when capturing
      // plans while other load shares the host — timings would be noise)
      if (!sys.env.contains("SPARK_GRAFT_EXPLAIN_NOTIME")) {
        (1 to 2).foreach { i =>
          jobs.set(0); stages.set(0); tasks.set(0)
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // listener events land asynchronously; settle before reading
          Thread.sleep(250)
          println(f"[explain-timing] $n pass$i $dt%.3f s jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
        }
        // the static plan above is AQE's INITIAL plan; the executed form
        // (isFinalPlan=true, AQEShuffleReads applied, runtime-elided
        // exchanges gone) is what actually ran — print it on demand so
        // exchange-count claims can be checked against reality
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN_FINAL")) {
          // drive THIS QueryExecution (the noop write above plans its
          // own), so the adaptive plan below is the finalized one
          df.queryExecution.toRdd.foreach(_ => ())
          println(s"---- $n executed ----")
          println(df.queryExecution.executedPlan.toString)
        }
      }
    }
    spark.stop()
  }
}
