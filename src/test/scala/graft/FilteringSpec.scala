package graft

import graft.operators.Filtering
import graft.operators.Filtering._
import org.apache.spark.sql.functions.col

class FilteringSpec extends GraftSuite {

  test("compile handles every comparison operator") {
    val df = Tables.orders(spark, sf)
    assert(df.filter(compile(Cmp("o_orderstatus", Eq, "O"))).count() > 0)
    assert(df.filter(compile(Cmp("o_orderstatus", Ne, "O"))).count() > 0)
    assert(df.filter(compile(Cmp("o_totalprice", Gt, 1e9))).count() == 0)
    assert(df.filter(compile(Cmp("o_orderpriority", Like, "%URGENT%"))).count() > 0)
    assert(df.filter(compile(Cmp("o_orderstatus", In, Seq("O", "F")))).count() > 0)
    assert(df.filter(compile(Cmp("o_orderkey", IsNull, null))).count() == 0)
  }

  test("logical composition AND/OR/NOT") {
    val df = Tables.orders(spark, sf)
    val both = df.filter(compile(AndF(Seq(
      Cmp("o_orderstatus", Eq, "O"), Cmp("o_totalprice", Ge, 1000.0))))).count()
    val either = df.filter(compile(OrF(Seq(
      Cmp("o_orderstatus", Eq, "O"), Cmp("o_totalprice", Ge, 1000.0))))).count()
    val neg = df.filter(compile(NotF(Cmp("o_orderstatus", Eq, "O")))).count()
    assert(both <= either)
    assert(neg == df.count() - df.filter(compile(Cmp("o_orderstatus", Eq, "O"))).count())
  }

  test("comparison predicates are pushed to the parquet scan") {
    val plan = Filtering.filterComparison(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(o_totalprice") || plan.contains("IsNotNull")),
      s"expected pushed filters in plan:\n$plan")
  }

  test("geo within-radius keeps only close customers and computes distance") {
    val rows = Filtering.filterGeo(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("dist_km") <= 5000L * 1000))
    assert(rows.length < Tables.customer(spark, sf).count())
  }

  test("json-path filter extracts nested values") {
    val rows = Filtering.filterNested(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("k") >= 50))
  }

  test("sql where passthrough filters lineitem") {
    val rows = Filtering.filterSqlWhere(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("qty") >= 45L * 10000))
  }

  test("bounding box keeps only in-box coordinates") {
    val rows = Filtering.filterBBox(spark, sf).collect()
    assert(rows.nonEmpty)
    // fixed-point 1e2: box is [-30,30] lat x [-90,90] lon
    assert(rows.forall { r =>
      val lat = r.getAs[Long]("lat"); val lon = r.getAs[Long]("lon")
      lat >= -3000 && lat <= 3000 && lon >= -9000 && lon <= 9000
    })
  }

  test("fuzzy text filter matches tokens within edit distance") {
    val rows = Filtering.filterFuzzy(spark, sf).collect()
    assert(rows.nonEmpty)
    // every hit has a token within 2 edits of "sprak" ("spark" qualifies)
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    docs.foreach { r =>
      val toks = r.getString(1).toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .split(" ").filter(t => t.length > 1 && !graft.functions.TextFunctions.StopWords.contains(t))
      val expected = toks.exists(t => lev(t, "sprak") <= 2)
      assert(ids.contains(r.getLong(0)) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("nested-operator arms: array length, has-key, has-value, contains") {
    val rows = Filtering.filterNestedOps(spark, sf).collect()
    assert(rows.nonEmpty)
    // predicate set reduces to k%3==0 (2 tags) AND k%2==0 (value "even")
    // AND k%5!=0 (no "extra" key); status "even" contains "ev" is implied
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      assert(k % 3 == 0 && k % 2 == 0 && k % 5 != 0, s"k=$k")
    }
  }

  test("compileShared factors the probed JSON column once across all arms") {
    val opt = Filtering.filterNestedOps(spark, sf).queryExecution.optimizedPlan.toString
    // the derived JSON doc must survive as a single factored common
    // expression (not be re-inlined into each of the 4 arms by filter
    // pushdown): its construction literal appears exactly once
    assert(opt.contains("_common_expr"), s"With factoring dissolved:\n$opt")
    val constructions = "\\Q{\"tags\": \\E".r.findAllIn(opt).size
    assert(constructions == 1, s"expected 1 shared construction, got $constructions:\n$opt")
  }

  test("compileSharedParsed matches compileShared arm-for-arm") {
    import Filtering._
    import org.apache.spark.sql.functions._
    // richer tree than the operator's own: OR branches, a JsonCmp on a
    // two-segment path and one on a top-level scalar
    val f = OrF(Seq(
      AndF(Seq(
        ArrayLen("j", "tags", Eq, 2),
        NotF(ObjectHasKey("j", "meta", "extra")),
        JsonCmp("j", "meta.k", Ge, 50))),
      AndF(Seq(
        ObjectHasValue("j", "meta", "odd"),
        NestedContains("j", "meta.status", "od")))))
    val k = coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(-1L))
    val tags = when(col("k") % 3 === 0,
        concat(lit("[\""), col("event_type"), lit("\",\"hot\"]")))
      .otherwise(concat(lit("[\""), col("event_type"), lit("\"]")))
    val meta = concat(
      lit("{\"k\": "), col("k").cast("string"),
      lit(", \"status\": \""),
      when(col("k") % 2 === 0, lit("even")).otherwise(lit("odd")), lit("\""),
      when(col("k") % 5 === 0, lit(", \"extra\": \"1\"")).otherwise(lit("")),
      lit("}"))
    val j = concat(lit("{\"tags\": "), tags, lit(", \"meta\": "), meta, lit("}"))
    def ids(pred: org.apache.spark.sql.Column): Set[Long] =
      Tables.events(spark, sf).withColumn("k", k).filter(pred)
        .select("event_id").collect().map(_.getLong(0)).toSet
    val viaString = ids(compileShared(f, "j", j))
    val viaParsed = ids(compileSharedParsed(f, "j", j))
    assert(viaParsed.nonEmpty && viaParsed == viaString)
  }

  test("point-in-polygon: ray casting agrees with a reference check") {
    import Filtering._
    val poly = DemoPolygon
    def inside(lat: Double, lon: Double): Boolean = {
      var c = 0
      poly.indices.foreach { i =>
        val (y1, x1) = poly(i); val (y2, x2) = poly((i + 1) % poly.size)
        if (((y1 > lat) != (y2 > lat)) &&
          lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1) c += 1
      }
      c % 2 == 1
    }
    val rows = Filtering.filterPolygon(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lat = r.getAs[Long]("lat") / 100.0; val lon = r.getAs[Long]("lon") / 100.0
      assert(inside(lat, lon), s"($lat,$lon) flagged inside but reference check disagrees")
    }
    // and a known-outside corner is excluded
    assert(!inside(89.0, 179.0))
  }

  test("array-contains + text-search filter arms compose") {
    val rows = Filtering.filterArrayText(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
    docs.foreach { d =>
      val t = d.getString(1).toLowerCase
      val expected = t.split(" ").contains("spark") && t.contains("vector")
      assert(ids.contains(d.getLong(0)) == expected, s"doc ${d.getLong(0)}")
    }
  }
}
