package graft

import graft.operators.Analytics

class AnalyticsSpec extends GraftSuite {

  test("q1 aggregates lineitem into flag/status groups") {
    val rows = Analytics.q1(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0)
    // deterministic order by (flag, status)
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("q3 returns top-10 revenue orders, descending") {
    val rows = Analytics.q3(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("revenue")).toSeq
    assert(revs == revs.sortBy(-_))
  }

  test("q5 yields one row per nation with revenue") {
    val rows = Analytics.q5(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall(_.getAs[Long]("revenue") > 0))
  }

  test("events_window buckets by hour and type") {
    val df = Analytics.eventsWindow(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000)
  }

  test("events_session splits on 30-min gaps") {
    val rows = Analytics.eventsSession(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000)
    assert(rows.forall(_.getAs[Long]("session_seq") >= 1))
  }
}
