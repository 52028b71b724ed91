package graft

import graft.functions.expressions.TopKAgg.topK
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TopKAggSpec extends GraftSuite {
  import spark.implicits._

  private def ranked(rows: Seq[(Long, Double, Long)], k: Int): Map[Long, Seq[Long]] =
    rows.toDF("g", "score", "id")
      .repartition(7) // force multiple partial buffers through merge()
      .groupBy($"g").agg(topK($"score", $"id", k).as("tk"))
      .collect()
      .map(r => r.getAs[Long]("g") ->
        r.getSeq[Row](r.fieldIndex("tk")).map(_.getAs[Long]("id")).toSeq)
      .toMap

  test("keeps k best by score desc with id asc tie-break across merges") {
    val rows = (1L to 100L).map(i => (i % 2, (i % 10).toDouble, i))
    val out = ranked(rows, 3)
    // group 1: odd ids; best score 9.0 held by ids 9,19,...,99 → tie-break min ids
    assert(out(1L) == Seq(9L, 19L, 29L))
    // group 0: even ids; best score 8.0 on ids 8,18,...,98
    assert(out(0L) == Seq(8L, 18L, 28L))
  }

  test("groups smaller than k return all members, ordered") {
    val out = ranked(Seq((0L, 1.0, 10L), (0L, 3.0, 11L)), 5)
    assert(out(0L) == Seq(11L, 10L))
  }

  test("exactly k members come back fully ordered") {
    val out = ranked(Seq((0L, 1.0, 1L), (0L, 2.0, 2L), (0L, 3.0, 3L)), 3)
    assert(out(0L) == Seq(3L, 2L, 1L))
  }
}
