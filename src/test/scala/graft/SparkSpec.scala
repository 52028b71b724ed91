package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** Run `f` with a session that has GraftExtensions installed.
    * Builds a NEW session (sharing the JVM's SparkContext) instead of
    * getOrCreate — which would silently return the shared
    * extension-less session when another suite ran first — and never
    * stops the shared context.
    */
  def withExtensionsSession[T](f: SparkSession => T): T = {
    val priorDefault = SparkSession.getDefaultSession
    val priorActive  = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s2) finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      priorDefault.foreach(SparkSession.setDefaultSession)
      priorActive.foreach(SparkSession.setActiveSession)
    }
  }
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = TestSpark.sf

  /** Drop tables from the catalog AND delete their warehouse
    * locations — a killed previous JVM leaves orphan directories the
    * in-memory catalog no longer knows, which fail the next CTAS with
    * LOCATION_ALREADY_EXISTS.
    */
  def dropHard(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), n)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }
}
