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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"==== $n ====")
      df.explain("formatted")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_LOGICAL")) {
        println(s"---- $n analyzed ----")
        println(df.queryExecution.analyzed.treeString)
        println(s"---- $n optimized ----")
        println(df.queryExecution.optimizedPlan.treeString)
      }
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[explain-timing] $n pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
