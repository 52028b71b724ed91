package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions.{col, count, datediff, lit, row_number}

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

  test("q1_rollup subtotals are consistent at every grouping level") {
    val rows = Analytics.q1Rollup(spark, sf).collect()
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
    val leaf = rows.filter(r => key(r)._1 != "ALL" && key(r)._2 != "ALL")
    val flagTotals = rows.filter(r => key(r)._1 != "ALL" && key(r)._2 == "ALL")
    val grand = rows.filter(r => key(r) == ("ALL", "ALL"))
    assert(grand.length == 1 && leaf.nonEmpty && flagTotals.nonEmpty)
    val leafSum = leaf.map(_.getAs[Long]("count_order")).sum
    assert(grand.head.getAs[Long]("count_order") == leafSum)
    flagTotals.foreach { ft =>
      val expect = leaf.filter(r => key(r)._1 == key(ft)._1)
        .map(_.getAs[Long]("count_order")).sum
      assert(ft.getAs[Long]("count_order") == expect, s"subtotal for ${key(ft)._1}")
    }
  }

  test("q_antijoin keeps exactly the customers with no urgent order") {
    val urgentCust = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val nCust = Tables.customer(spark, sf).count()
    val expected = nCust - Tables.customer(spark, sf)
      .filter(col("c_custkey").isin(urgentCust.toSeq: _*)).count()
    val rows = Analytics.custWithoutOrders(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == expected)
  }

  test("q_semijoin and q_antijoin partition the customer base") {
    val withU = Analytics.custWithUrgent(spark, sf).collect()
      .map(_.getAs[Long]("n_customers")).sum
    val withoutU = Analytics.custWithoutOrders(spark, sf).collect()
      .map(_.getAs[Long]("n_customers")).sum
    assert(withU + withoutU == Tables.customer(spark, sf).count())
    assert(withU > 0)
  }

  test("events_retention cohorts account for every event; offset 0 is each cohort's peak") {
    val rows = Analytics.eventsRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000)
    assert(rows.forall(_.getAs[Long]("week_offset") >= 0))
    // a user is by definition active in their cohort week, so each
    // cohort has an offset-0 row and no later offset exceeds it
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, cohort) =>
      val byOffset = cohort.map(r => r.getAs[Long]("week_offset") -> r.getAs[Long]("n_active")).toMap
      assert(byOffset.contains(0L))
      assert(byOffset.values.max == byOffset(0L))
    }
  }

  test("events_rolling daily series: totals conserved, ma7 tracks the trailing window") {
    val rows = Analytics.eventsRolling(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000)
    // recompute ma7/delta from the daily series per type
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val series = rs.sortBy(_.getAs[Long]("day"))
      series.zipWithIndex.foreach { case (r, i) =>
        val window = series.slice(math.max(0, i - 6), i + 1).map(_.getAs[Long]("n_events"))
        val expMa = math.floor(window.sum.toDouble / window.length * 10000 + 0.5).toLong
        assert(r.getAs[Long]("ma7") == expMa, s"ma7 at index $i")
        val expDelta = if (i == 0) 0L
          else r.getAs[Long]("n_events") - series(i - 1).getAs[Long]("n_events")
        assert(r.getAs[Long]("delta") == expDelta, s"delta at index $i")
      }
    }
  }

  test("events_anomaly flags exactly the >2-sigma days, via exact integer moments") {
    val rows = Analytics.eventsAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("is_anomaly") == 1L),
      "test corpus must contain at least one anomalous day")
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val counts = rs.map(_.getAs[Long]("n_events"))
      val n = counts.length.toLong
      val s = counts.sum
      val q = counts.map(c => c * c).sum
      rs.foreach { r =>
        val c = r.getAs[Long]("n_events")
        val dev = n * c - s
        val want = if (dev * dev > 4L * (n * q - s * s)) 1L else 0L
        assert(r.getAs[Long]("is_anomaly") == want,
          s"flag mismatch for $t day ${r.getAs[Long]("day")}")
      }
    }
  }

  test("events_distinct matches a driver-side exact recount; HLL twin within 5%") {
    val exact = Analytics.eventsDistinct(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long"))
      .collect().groupBy(_.getString(0))
    assert(exact.keySet == raw.keySet)
    raw.foreach { case (tpe, rows) =>
      val e = exact(tpe)
      assert(e.getAs[Long]("n_users") == rows.map(_.getLong(1)).distinct.length.toLong)
      assert(e.getAs[Long]("n_days") == rows.map(_.getLong(2)).distinct.length.toLong)
      assert(e.getAs[Long]("n_events") == rows.length.toLong)
    }
    val sketch = Analytics.eventsDistinctSketch(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(sketch.keySet == exact.keySet)
    exact.foreach { case (tpe, e) =>
      val s = sketch(tpe)
      assert(s.getAs[Long]("n_events") == e.getAs[Long]("n_events"))
      Seq("n_users", "n_days").foreach { c =>
        val (ev, sv) = (e.getAs[Long](c), s.getAs[Long](c))
        assert(math.abs(sv - ev) <= math.max(1L, (0.05 * ev).toLong),
          s"$tpe.$c: sketch $sv vs exact $ev")
      }
    }
  }

  test("events_quantiles percentiles are ordered and bracket the data") {
    val rows = Analytics.eventsQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000)
    rows.foreach { r =>
      val (p50, p90, p99) =
        (r.getAs[Long]("p50"), r.getAs[Long]("p90"), r.getAs[Long]("p99"))
      assert(p50 <= p90 && p90 <= p99)
      assert(p50 >= 0)
    }
  }

  test("events_quantiles_sketch percentiles land in the exact rank bracket") {
    def byType(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[String]("event_type") -> r).toMap
    val exact = byType(Analytics.eventsQuantiles(spark, sf).collect())
    val sketch = byType(Analytics.eventsQuantilesSketch(spark, sf).collect())
    assert(sketch.keySet == exact.keySet)
    // raw per-type values, to bound the sketch by order statistics
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    def fx(v: Double) = math.floor(v * 10000 + 0.5).toLong
    exact.foreach { case (tpe, e) =>
      val s = sketch(tpe)
      // group keys, counts and means are exact in both forms
      assert(s.getAs[Long]("n_events") == e.getAs[Long]("n_events"))
      assert(s.getAs[Long]("avg_value") == e.getAs[Long]("avg_value"))
      // GK at accuracy 10000 has zero rank error at this group size but
      // returns an actual DATA value where quantile_cont interpolates:
      // the sketch must land inside the ±1-rank order-statistic bracket
      // around the target rank p*(n-1).
      val v = vals(tpe)
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (name, p) =>
        val rank = p * (v.length - 1)
        val lo = fx(v(math.max(0, math.floor(rank).toInt - 1)))
        val hi = fx(v(math.min(v.length - 1, math.ceil(rank).toInt + 1)))
        val sv = s.getAs[Long](name)
        assert(sv >= lo && sv <= hi, s"$tpe.$name: sketch $sv outside [$lo,$hi]")
      }
    }
  }

  test("events_topn: bounded TopKAgg ranking equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val out = Analytics.eventsTopn(spark, sf).collect()
    // exactly n rows per type, ranks 1..n, counts non-increasing
    out.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L), tpe)
      val ns = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n_events"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"$tpe not sorted")
    }
    // the heap-aggregate result IS the row_number window's result
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n_events").desc, col("user_id"))
    val windowed = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("event_type"), col("rank"), col("user_id"), col("n_events"))
      .orderBy(col("event_type"), col("rank"))
      .collect().toSeq.map(_.toSeq)
    assert(out.toSeq.map(_.toSeq) == windowed,
      "TopKAgg plan must reproduce the window plan's rows exactly")
  }

  test("events_wau equals a driver-side recount of 7-day distinct actives") {
    val out = Analytics.eventsWau(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ud = Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._2)
    assert(out.keySet == byDay.keySet)
    out.foreach { case (d, (dau, wau)) =>
      assert(dau == byDay(d).length.toLong, s"day $d dau")
      val expectedWau = ud.collect {
        case (u, ad) if ad >= d - 6 && ad <= d => u
      }.distinct.length.toLong
      assert(wau == expectedWau, s"day $d wau")
      assert(wau >= dau, s"day $d: trailing distinct can't undercut the day's own")
    }
  }

  test("events_wau_sketch cardinalities land within 5% of exact") {
    val exact = Analytics.eventsWau(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sketch = Analytics.eventsWauSketch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sketch.keySet == exact.keySet)
    sketch.foreach { case (d, (dau, wau)) =>
      val (ed, ew) = exact(d)
      assert(math.abs(dau - ed) <= math.max(1L, (0.05 * ed).toLong), s"day $d dau")
      assert(math.abs(wau - ew) <= math.max(1L, (0.05 * ew).toLong), s"day $d wau")
    }
  }

  test("events_resample fills gaps with zeros and carries the last active day") {
    import spark.implicits._
    val daily = Seq(("a", 1L, 3L), ("a", 2L, 1L), ("a", 5L, 2L),
                    ("b", 10L, 7L)).toDF("event_type", "day", "n")
    val out = Analytics.resampleDaily(daily).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 1L, 3L, 0L, 1L),
      ("a", 2L, 1L, 0L, 2L),
      ("a", 3L, 0L, 1L, 2L),
      ("a", 4L, 0L, 1L, 2L),
      ("a", 5L, 2L, 0L, 5L),
      ("b", 10L, 7L, 0L, 10L)))
    // the real corpus series: contiguous per type, totals conserved
    val full = Analytics.eventsResample(spark, sf).collect()
    full.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val days = rows.map(_.getLong(1)).sorted
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
        s"$tpe calendar not contiguous")
    }
    val total = Tables.events(spark, sf).count()
    assert(full.map(_.getLong(2)).sum == total, "gap filling must not change mass")
  }

  test("moneySum is invariant under partitioning (the double SUM is not guaranteed to be)") {
    import graft.OracleNum
    val li = Tables.lineitem(spark, sf)
      .select((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("m"))
    def total(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(OracleNum.moneySum(col("m")).as("s")).head.getDecimal(0)
    val one = total(li.coalesce(1))
    // different partition counts → different merge orders; the decimal
    // sum must not move by an ulp
    Seq(3, 7, 32).foreach { p =>
      assert(total(li.repartition(p)).compareTo(one) == 0, s"drifted at $p partitions")
    }
  }

  test("q6 is a single-row predicate-gated revenue scan with full pushdown") {
    val df = Analytics.q6(spark, sf)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("revenue") > 0)
    // pushdown is the whole point of this plan: all three predicates
    // must appear INSIDE the scan's PushedFilters list (the label
    // alone always prints, even when the list is empty)
    val plan = df.queryExecution.executedPlan.toString()
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pushed.contains(c), s"$c not in PushedFilters [$pushed]")
    }
  }

  test("q8 shares sum to 1 within rounding per order year") {
    val rows = Analytics.q8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (yr, nr) =>
      val s = nr.map(_.getAs[Long]("share")).sum
      // each share is floor-rounded at 1e-6: the sum can fall short by
      // at most one ulp per nation
      assert(s <= 1000000L + nr.length && s > 1000000L - nr.length, s"year $yr share sum $s")
    }
  }

  test("q10 ranks returned-item revenue, top-20 descending") {
    val rows = Analytics.q10(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Long]("revenue")).toSeq
    assert(revs == revs.sortBy(-_))
    assert(rows.forall(_.getAs[Long]("n_items") > 0))
  }

  test("events_trend recovers an injected linear series exactly") {
    import spark.implicits._
    // ground truth: a perfect line c = 7 + 3*day must come back as
    // slope 3, intercept 7 exactly (the OLS of a perfect fit)
    val line = (0L until 40L).map(d => ("syn", d, 7L + 3L * d))
      .toDF("event_type", "day", "c")
    val syn = Analytics.trendFromDaily(line).collect()
    assert(syn.length == 1)
    assert(syn.head.getAs[Long]("slope") == 30000L, "slope 3.0 at fx4")
    assert(syn.head.getAs[Long]("intercept") == 70000L, "intercept 7.0 at fx4")
    // degenerate one-day series: zero OLS denominator must not divide
    val one = Seq(("one", 5L, 42L)).toDF("event_type", "day", "c")
    val deg = Analytics.trendFromDaily(one).collect()
    assert(deg.head.getAs[Long]("slope") == 0L)
    assert(deg.head.getAs[Long]("intercept") == 420000L, "intercept = the mean")
    val rows = Analytics.eventsTrend(spark, sf).collect()
    assert(rows.nonEmpty)
    // real-corpus sanity: moments re-derived driver-side
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def fx4(x: Double): Long = math.floor(x * 10000L + 0.5).toLong
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val s = daily.filter(_._1 == t)
      val n = s.length.toLong
      val (sd, sc) = (s.map(_._2).sum, s.map(_._3).sum)
      val sdc = s.map(x => BigInt(x._2) * x._3).sum
      val sd2 = s.map(x => BigInt(x._2) * x._2).sum
      val den = BigInt(n) * sd2 - BigInt(sd) * BigInt(sd)
      val slope = if (den == 0) 0.0
        else (BigInt(n) * sdc - BigInt(sd) * BigInt(sc)).toDouble / den.toDouble
      assert(r.getAs[Long]("n_days") == n && r.getAs[Long]("n_events") == sc, s"$t moments")
      assert(r.getAs[Long]("slope") == fx4(slope), s"$t slope")
      assert(r.getAs[Long]("intercept") ==
        fx4(sc.toDouble / n - slope * (sd.toDouble / n)), s"$t intercept")
    }
  }

  test("events_markov transition mass and shares are consistent") {
    val rows = Analytics.eventsMarkov(spark, sf).collect()
    assert(rows.nonEmpty)
    // each user's timeline contributes (events-1) transitions
    val perUser = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect().map(_.getAs[Long]("n"))
    assert(rows.map(_.getAs[Long]("n_transitions")).sum == perUser.map(_ - 1).sum)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (p, rs) =>
      val shares = rs.map(_.getAs[Long]("share_bp"))
      assert(shares.sum <= 10000L && shares.sum > 10000L - rs.length, s"$p shares")
    }
  }

  test("events_ab recomputes from driver-side cohort counts") {
    val rows = Analytics.eventsAb(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val users = ev.map(_._2).distinct
    val (nA, nB) = (users.count(_ % 2 == 0).toLong, users.count(_ % 2 == 1).toLong)
    def fx4(x: Double): Long = math.floor(x * 10000L + 0.5).toLong
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hit = ev.filter(_._1 == t).map(_._2).distinct
      val (xA, xB) = (hit.count(_ % 2 == 0).toLong, hit.count(_ % 2 == 1).toLong)
      assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) == ((nA, nB)), s"$t totals")
      assert((r.getAs[Long]("x_a"), r.getAs[Long]("x_b")) == ((xA, xB)), s"$t hits")
      val bigN = nA + nB
      val den = nA.toDouble * nB.toDouble * (xA + xB).toDouble * (bigN - xA - xB).toDouble
      val z2 = if (den > 0) {
        val d = (xA * nB - xB * nA).toDouble
        d * d * bigN.toDouble / den
      } else 0.0
      assert(r.getAs[Long]("z2") == fx4(z2), s"$t z2")
      assert(r.getAs[Long]("significant") == (if (fx4(z2) >= 38415L) 1L else 0L))
    }
  }

  test("q18 keeps exactly the >200-quantity orders, ranked by order value") {
    val rows = Analytics.q18(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Long]("sum_qty") > 200L * 10000L), "HAVING gate")
    val prices = rows.map(_.getAs[Long]("total_price")).toSeq
    assert(prices == prices.sortBy(-_))
    // gate agrees with a direct recount
    val expect = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(org.apache.spark.sql.functions.sum(col("l_quantity")).as("q"))
      .filter(col("q") > 200.0).count()
    assert(rows.length == math.min(20L, expect))
  }

  test("events_pivot conserves event mass across the type columns") {
    val rows = Analytics.eventsPivot(spark, sf).collect()
    assert(rows.nonEmpty)
    val typeCols = Seq("click", "error", "purchase", "signup", "view")
    val mass = rows.map(r => typeCols.map(c => r.getAs[Long](c)).sum).sum
    assert(mass == Tables.events(spark, sf).count())
    val days = rows.map(_.getAs[Long]("day")).toSeq
    assert(days == days.sorted)
  }

  test("events_cube planes are mutually consistent") {
    val rows = Analytics.eventsCube(spark, sf).collect()
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    val leaf = rows.filter(_.getAs[Long]("gid") == 0L)
    val byType = rows.filter(_.getAs[Long]("gid") == 1L)
    val byDow = rows.filter(_.getAs[Long]("gid") == 2L)
    assert(grand.length == 1 && leaf.nonEmpty && byType.nonEmpty && byDow.nonEmpty)
    val total = grand.head.getAs[Long]("n_events")
    assert(total == Tables.events(spark, sf).count())
    assert(leaf.map(_.getAs[Long]("n_events")).sum == total)
    assert(byType.map(_.getAs[Long]("n_events")).sum == total)
    assert(byDow.map(_.getAs[Long]("n_events")).sum == total)
    // rolled keys carry the sentinels, never null
    assert(byType.forall(_.getAs[Long]("dow") == -1L))
    assert(byDow.forall(_.getAs[String]("event_type") == "ALL"))
  }

  test("q12 conserves late-line mass across the priority arms") {
    import org.apache.spark.sql.functions.expr
    val rows = Analytics.q12(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 3) // one row per returnflag
    val modes = rows.map(_.getAs[String]("ship_mode")).toSeq
    assert(modes == modes.sorted)
    // independent recount: every 1996 line shipped >30d after its
    // order lands in exactly one arm of exactly one mode row
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val late = li.join(Tables.orders(spark, sf),
        li("l_orderkey") === col("o_orderkey") &&
        li("l_shipdate") > expr("o_orderdate + INTERVAL 30 DAYS")).count()
    val mass = rows.map(r => r.getAs[Long]("high_line_count") +
                             r.getAs[Long]("low_line_count")).sum
    assert(mass == late, s"q12 mass $mass != independent late-line count $late")
  }

  test("q2 winners attain the region-gated per-part minimum cost") {
    import org.apache.spark.sql.functions.min
    val rows = Analytics.q2(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // descending by balance, the displayed ranking key
    val bals = rows.map(_.getAs[Long]("s_acctbal_fx")).toSeq
    assert(bals == bals.sortBy(-_))
    // independent recount of the per-part min over the EUROPE-gated
    // derived costs: every winner row must sit exactly at it
    val ucost = OracleNum.fx(col("l_extendedprice") / col("l_quantity"), 4)
    val nEu = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
    val minByPart = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(ucost).as("cost_fx"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(nEu, col("s_nationkey") === col("n_nationkey"), "left_semi")
      .groupBy(col("l_partkey")).agg(min(col("cost_fx")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("mc")).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(r.getAs[Long]("cost_fx") == minByPart(pk), s"part $pk not at min")
    }
  }

  test("q20 suppliers each dominate a sliced part's 1996 shipments") {
    val rows = Analytics.q20(spark, sf).collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getString(0)).toSeq
    assert(names == names.sorted && names.distinct == names)
    // independent recount: each returned supplier holds >30% of some
    // small-part's 1996 quantity AND sits in the EUROPE region
    val slice = Tables.part(spark, sf)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val pairs = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(slice, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(OracleNum.fx(org.apache.spark.sql.functions.sum(col("l_quantity"))).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("q")))
    val totals = pairs.groupBy(_._1).map { case (pk, ps) => pk -> ps.map(_._3).sum }
    val dominators = pairs.collect {
      case (pk, sk, q) if q * 10L > totals(pk) * 3L => sk
    }.toSet
    val euSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf)
              .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
                    col("n_regionkey") === col("r_regionkey")),
            col("s_nationkey") === col("n_nationkey"))
      .collect().map(r => r.getAs[String]("s_name") ->
                          r.getAs[Long]("s_suppkey")).toMap
    names.foreach { n =>
      assert(euSupp.contains(n), s"$n not a EUROPE supplier")
      assert(dominators(euSupp(n)), s"$n dominates no sliced part")
    }
    assert(names.toSet == euSupp.filter(kv => dominators(kv._2)).keySet)
  }

  test("events_attribution balances first and last touches over non-purchase channels") {
    val rows = Analytics.eventsAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getAs[String]("touch_type")).toSet
    assert(!types.contains("purchase"), "purchase can never attribute itself")
    // every converting user with >=1 prior touch contributes exactly
    // one first-touch AND one last-touch credit
    assert(rows.map(_.getAs[Long]("n_first")).sum ==
           rows.map(_.getAs[Long]("n_last")).sum)
    assert(rows.map(_.getAs[Long]("n_first")).sum > 0)
  }

  test("events_path caps step count and ranks by support") {
    val rows = Analytics.eventsPath(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Analytics.PathTopN)
    val evTypes = Set("signup", "view", "click", "purchase", "error")
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.nonEmpty && steps.length <= Analytics.PathLen)
      steps.foreach(s => assert(evTypes.contains(s), s"unknown step $s"))
    }
    val counts = rows.map(_.getAs[Long]("n_sessions")).toSeq
    assert(counts == counts.sortBy(-_), "paths must rank by support desc")
    // total support never exceeds the session count
    val sessions = Analytics.eventsSession(spark, sf).count()
    assert(counts.sum <= sessions)
  }

  test("events_rfm scores are quintile-consistent in every dimension") {
    val rows = Analytics.eventsRfm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Long](c)
        assert(s >= 1L && s <= 5L, s"$c out of range: $s")
      }
      assert(r.getAs[Long]("recency_days") >= 0L)
    }
    // scores are monotone in their underlying dimension
    def monotone(dim: String, score: String): Unit = {
      val sorted = rows.sortBy(_.getAs[Long](dim))
      val scores = sorted.map(_.getAs[Long](score)).toSeq
      assert(scores == scores.sorted, s"$score not monotone in $dim")
    }
    monotone("frequency", "f_score")
    monotone("monetary_fx", "m_score")
    // recency: FEWER days since activity = HIGHER score
    val byRec = rows.sortBy(-_.getAs[Long]("recency_days"))
    val rs = byRec.map(_.getAs[Long]("r_score")).toSeq
    assert(rs == rs.sorted, "r_score not anti-monotone in recency_days")
  }

  test("events_histogram buckets partition each type's events exactly") {
    val rows = Analytics.eventsHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum == 1000L)
    rows.foreach { r =>
      val lo = r.getAs[Double]("lo")
      val loFx = math.floor(lo * 10000L + 0.5).toLong
      val hiFx = math.floor((lo + 25.0) * 10000L + 0.5).toLong
      assert(r.getAs[Long]("min_value") >= loFx, "min below bucket floor")
      assert(r.getAs[Long]("max_value") < hiFx, "max at/above bucket ceiling")
      assert(r.getAs[Long]("bucket") == math.floor(lo / 25.0).toLong)
    }
  }

  test("events_range_join pushes both type filters and forces no broadcast") {
    val df = Analytics.eventsRangeJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    // each side's event_type equality must reach its parquet scan
    assert("PushedFilters: \\[[^\\]]*event_type[^\\]]*\\]".r
      .findAllIn(plan).size >= 2, "type filters not pushed to both scans")
    import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, BROADCAST}
    val broadcasts = df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
    }.size
    assert(broadcasts == 0, "both range-join sides are event-volume-sized")
  }

  test("events_range_join matches the brute-force inequality join") {
    val rows = Analytics.eventsRangeJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("error_id"), r.getAs[Long]("purchase_id"),
        r.getAs[Long]("gap_us"))).toSet
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_id"), r.getAs[Long]("us")))
    val win = Analytics.RangeJoinWindowS * 1000000L
    val expect = (for {
      (ue, te, ide, use) <- ev if te == "error"
      (up, tp, idp, usp) <- ev if tp == "purchase" && up == ue
      if usp > use && usp <= use + win
    } yield (ide, idp, usp - use)).toSet
    assert(rows == expect)
    assert(rows.nonEmpty, "window wide enough to pair at spec SF")
  }

  test("events_debounce keeps exactly the events with a quiet prior gap") {
    val kept = Analytics.eventsDebounce(spark, sf).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("gap_us"))).toMap
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_id"), r.getAs[Long]("us")))
    val gap = Analytics.DebounceGapS * 1000000L
    val expect = ev.groupBy(t => (t._1, t._2)).values.flatMap { g =>
      val sorted = g.sortBy(t => (t._4, t._3))
      sorted.zipWithIndex.collect {
        case ((_, _, id, us), 0) => id -> -1L
        case ((_, _, id, us), i) if us - sorted(i - 1)._4 > gap =>
          id -> (us - sorted(i - 1)._4)
      }
    }.toMap
    assert(kept == expect)
    // the spec SF has no same-(user,type) burst inside 60s, so the
    // suppression arm is driven through a planted burst: four clicks
    // 10s apart then one 100s later -> only the first and last survive
    val tmp = java.nio.file.Files.createTempDirectory("debounce").toString
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    Seq(
      (1L, at(0L), 7L, "click", 1.0, "{}"),
      (2L, at(10L), 7L, "click", 1.0, "{}"),
      (3L, at(20L), 7L, "click", 1.0, "{}"),
      (4L, at(30L), 7L, "click", 1.0, "{}"),
      (5L, at(130L), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val burst = Analytics.eventsDebounce(spark, tmp).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("gap_us")))
    assert(burst.toSeq == Seq((1L, -1L), (5L, 100000000L)))
  }

  test("events_stickiness: MAU dominates DAU and the first day collapses to DAU") {
    val rows = Analytics.eventsStickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("mau") >= r.getAs[Long]("dau"))
      val bp = r.getAs[Long]("stickiness_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(bp == (10000L * r.getAs[Long]("dau")) / r.getAs[Long]("mau"))
    }
    // day 0 has no history: its trailing-28 window is exactly its DAU
    val d0 = rows.find(_.getAs[Long]("day") == 0L)
    d0.foreach(r => assert(r.getAs[Long]("mau") == r.getAs[Long]("dau")))
  }

  test("events_user_overlap matches a brute-force audience Jaccard") {
    val rows = Analytics.eventsUserOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    val tu = graft.Tables.events(spark, sf).select("event_type", "user_id")
      .distinct().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
    val audiences = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = audiences.keys.toSeq.sorted
    val expect = (for {
      i <- types.indices; j <- (i + 1) until types.length
      a = audiences(types(i)); b = audiences(types(j))
      common = (a & b).size if common > 0
    } yield (types(i), types(j)) ->
        (a.size.toLong, b.size.toLong, common.toLong,
          10000L * common / (a.size + b.size - common))).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("t1"), r.getAs[String]("t2"))
      val (n1, n2, common, bp) = expect(k)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2, k)
      assert(r.getAs[Long]("n_common") == common && r.getAs[Long]("jaccard_bp") == bp, k)
    }
  }
}
