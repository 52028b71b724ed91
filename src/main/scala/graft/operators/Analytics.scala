package graft.operators

import graft.{OracleNum, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan/filter/aggregate/join/window anchors on the TPC-H-ish tables.
  *
  * These exercise the relational core every reference query path rides
  * on (grape-vector-db filters + scroll + stats are all scans/aggs
  * underneath). Plans are audited to keep filters pushed to parquet and
  * dimension joins broadcast.
  */
object Analytics {
  import OracleNum.{fx, fxSql}

  /** Pricing-summary aggregation (TPC-H Q1 shape): map-side partial
    * aggregation, no join, single shuffle on the 2 low-cardinality keys.
    */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        fx(sum(col("l_quantity"))).as("sum_qty"),
        fx(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        fx(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        fx(avg(col("l_quantity"))).as("avg_qty"),
        fx(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${fxSql("SUM(l_quantity)")} AS sum_qty,
       |  ${fxSql("SUM(l_extendedprice)", 2)} AS sum_base_price,
       |  ${fxSql("SUM(l_extendedprice * (1.0 - l_discount))", 2)} AS sum_disc_price,
       |  ${fxSql("AVG(l_quantity)")} AS avg_qty,
       |  ${fxSql("AVG(l_discount)")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority top-k (TPC-H Q3 shape): two joins then a
    * revenue top-10. At scale: orders/customer shuffle-join on keys,
    * top-k is TakeOrderedAndProject (per-partition heaps, no global
    * sort).
    */
  def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir)
    val li   = Tables.lineitem(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(fx(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${fxSql("SUM(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** Multi-way join with broadcast dimension tables (TPC-H Q5 shape).
    * region/nation/supplier/customer are broadcast; only the
    * lineitem-orders fact join shuffles.
    */
  def q5(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val n  = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(fx(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${fxSql("SUM(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** Tumbling-window aggregation over the events table (1-hour
    * windows). Same shape as the Structured Streaming pipeline in
    * graft.streaming — this is the batch/oracle-checkable twin.
    */
  def eventsWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           fx(sum(col("value"))).as("sum_value"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("w_start"), col("event_type"))
  }

  val eventsWindowSql: String =
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
       |  COUNT(*) AS n_events,
       |  ${fxSql("SUM(value)")} AS sum_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Gap-based sessionization: a session break is >30 min of user
    * inactivity. lag + conditional cumsum over a per-user window —
    * one shuffle on user_id, linear within partition.
    */
  def eventsSession(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           fx(sum(col("value"))).as("sum_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  val eventsSessionSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR FLOOR(epoch(ts)) - FLOOR(epoch(lag(ts) OVER w)) > 1800
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sessions AS (
       |  SELECT user_id, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM marked
       |)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
       |  ${fxSql("SUM(value)")} AS sum_value
       |FROM sessions
       |GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin
}
