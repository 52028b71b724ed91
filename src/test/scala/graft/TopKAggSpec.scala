package graft

import graft.functions.expressions.TopKAgg.{topK, topKLong}
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

  private def rankedLong(rows: Seq[(Long, Long, Long)], k: Int): Map[Long, Seq[(Long, Long)]] =
    rows.toDF("g", "score", "id")
      .repartition(7)
      .groupBy($"g").agg(topKLong($"score", $"id", k).as("tk"))
      .collect()
      .map(r => r.getAs[Long]("g") ->
        r.getSeq[Row](r.fieldIndex("tk"))
          .map(e => (e.getAs[Long]("score"), e.getAs[Long]("id"))).toSeq)
      .toMap

  test("topKLong ranks exactly above 2^53 where double scores collapse") {
    // 2^53 and 2^53+1 are the canonical pair a double cannot tell apart:
    // both round to 9007199254740992.0, so the double-scored heap would
    // fall back to the id tie-break and rank id=1 first — wrongly.
    val big = 1L << 53
    val rows = Seq((0L, big, 1L), (0L, big + 1L, 2L), (0L, big - 1L, 3L))
    val out = rankedLong(rows, 3)
    assert(out(0L) == Seq((big + 1L, 2L), (big, 1L), (big - 1L, 3L)))
    // sanity: the double path really cannot make this distinction
    assert(big.toDouble == (big + 1L).toDouble)
  }

  test("topKLong keeps k best with id asc tie-break across merges") {
    val rows = (1L to 100L).map(i => (i % 2, i % 10, i))
    val out = rankedLong(rows, 3)
    assert(out(1L).map(_._2) == Seq(9L, 19L, 29L))
    assert(out(0L).map(_._2) == Seq(8L, 18L, 28L))
  }
}
