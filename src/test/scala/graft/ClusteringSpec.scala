package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

/** Deterministic k-means: the distributed assignment is re-derived
  * brute-force on the collected sf0.001 embeddings (quantize → init →
  * two Lloyd rounds with floored integer means), so every centroid
  * update and tie-break is checked against the obvious sequential
  * implementation.
  */
class ClusteringSpec extends GraftSuite {

  private def bruteKmeans(): Map[Long, (Long, Long)] = {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).map(v => math.floor(v * Clustering.QScale + 0.5).toLong).toArray)
      .sortBy(_._1)
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def assign(cent: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      vecs.map { case (id, q) =>
        val (c, d) = cent.map { case (cid, ce) => (cid, dist(q, ce)) }
          .minBy { case (cid, dd) => (dd, cid) }
        id -> (c, d)
      }.toMap
    var cent: Seq[(Long, Array[Long])] =
      vecs.take(Clustering.KmeansK).zipWithIndex.map { case ((_, q), i) => (i.toLong, q) }
    for (_ <- 1 until Clustering.KmeansIters) {
      val asg = assign(cent)
      cent = asg.groupBy(_._2._1).toSeq.map { case (c, members) =>
        val qs = members.keys.map(id => vecs.find(_._1 == id).get._2).toSeq
        c -> Array.tabulate(qs.head.length)(i =>
          math.floor(qs.map(_(i)).sum.toDouble / qs.size).toLong)
      }.sortBy(_._1)
    }
    assign(cent)
  }

  test("embed_kmeans matches the sequential Lloyd twin exactly") {
    val got = Clustering.embedKmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = bruteKmeans()
    assert(got.size == exp.size)
    val diff = got.filter { case (id, v) => exp(id) != v }
    assert(diff.isEmpty, s"first mismatches: ${diff.take(5)}")
  }

  test("embed_kmeans covers every vector and uses several clusters") {
    val rows = Clustering.embedKmeans(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n)
    val used = rows.map(_.getLong(1)).distinct
    assert(used.forall(c => c >= 0 && c < Clustering.KmeansK))
    assert(used.length > 1, "degenerate single-cluster assignment")
  }
}
