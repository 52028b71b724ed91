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
