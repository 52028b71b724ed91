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

  test("embed_outliers flags exactly the >2-sigma distances, exact BigInt twin") {
    val asg = Clustering.embedKmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val moments = asg.groupBy(_._2).map { case (c, ms) =>
      val n = BigInt(ms.length)
      val s = ms.map(m => BigInt(m._3)).sum
      val q = ms.map(m => BigInt(m._3) * BigInt(m._3)).sum
      c -> ((n, s, q))
    }
    val exp = asg.map { case (id, c, d) =>
      val (n, s, q) = moments(c)
      val dev = n * BigInt(d) - s
      id -> (if (dev * dev > 4 * (n * q - s * s)) 1L else 0L)
    }.toMap
    val got = Clustering.embedOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == asg.length)
    // cluster and dist pass through the kmeans assignment unchanged
    assert(got.map(g => (g._1, g._2, g._3)).toSet == asg.toSet)
    val bad = got.filter(g => exp(g._1) != g._4)
    assert(bad.isEmpty, s"flag mismatches: ${bad.take(5).toSeq}")
    // both classes must be populated at test scale or the spec is vacuous
    assert(got.exists(_._4 == 1L) && got.exists(_._4 == 0L))
  }

  test("label_noise flags exactly the planted mislabel on a separated corpus") {
    import spark.implicits._
    // three tight, well-separated clusters in 64-dim (the knn-graph
    // signature dimension); vec 7 carries a flipped label
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val id = (c * 20 + i).toLong
      val emb = Array.tabulate(64) { j =>
        val base = if (j == c * 3) 10.0 else 0.0
        base + 0.01 * (((i * 31 + j * 17) % 7) - 3)
      }
      val label = if (id == 7L) 2L else c.toLong
      (id, emb, label)
    }
    val vecs = rows.toDF("vec_id", "emb", "label")
    val got = operators.Clustering.labelNoiseFromVecs(vecs, 5).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.size == 60)
    val (lab7, maj7, agree7, n7, noisy7) = got(7L)
    assert(lab7 == 2L && maj7 == 0L && agree7 == 0L && n7 == 5L && noisy7 == 1L,
      s"planted mislabel row: ${got(7L)}")
    val clean = got - 7L
    assert(clean.forall { case (_, (l, m, a, n, f)) =>
      f == 0L && m == l && n == 5L && a >= 4L  // vec 7 may sit among neighbors
    }, s"unexpected clean-row flags: ${clean.filterNot { case (_, (l, m, a, n, f)) =>
      f == 0L && m == l && n == 5L && a >= 4L }.take(5)}")
  }

  test("cluster_topics labels every populated cluster with descending in-cluster terms") {
    val asg = Clustering.embedKmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docTerms = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.replaceAll("[^a-z0-9 ]", "").split(" ").toSet)
      .toMap
    val rows = Clustering.clusterTopics(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byCluster = rows.groupBy(_._1)
    assert(byCluster.keySet == asg.values.toSet, "one topic group per populated cluster")
    byCluster.foreach { case (c, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length), s"ranks 1..k in cluster $c")
      assert(rs.length == Clustering.TopicsK)
      val ordered = rs.sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"scores non-increasing in cluster $c")
      // every reported term occurs in at least one of the cluster's docs
      val members = asg.collect { case (id, cc) if cc == c => id }.toSet
      rs.foreach { case (_, _, term, _) =>
        assert(members.exists(id => docTerms(id).contains(term)),
          s"term '$term' not found in cluster $c docs")
      }
    }
  }

  test("embed_stats re-derives from a driver-side integer recount") {
    val s = Clustering.embedStats(spark, sf).head
    val embs = Tables.embeddings(spark, sf).collect()
      .map(_.getSeq[Float](1).map(v => math.floor(v * 1000.0 + 0.5).toLong).toArray)
    val sqns = embs.map(_.map(x => x * x).sum)
    assert(s.getAs[Long]("n_vecs") == embs.length.toLong)
    assert(s.getAs[Long]("sum_sq_norm") == sqns.sum)
    assert(s.getAs[Long]("min_sq_norm") == sqns.min)
    assert(s.getAs[Long]("max_sq_norm") == sqns.max)
    val dim = embs.head.length
    val meanSq = (0 until dim).map { d =>
      val m = embs.map(_(d)).sum / embs.length // JVM long div == `div`
      m * m
    }.sum
    assert(s.getAs[Long]("mean_vec_sq") == meanSq)
    // near-random unit-ish embeddings: the anisotropy proxy must sit
    // far below the average squared norm
    assert(s.getAs[Long]("mean_vec_sq") <
      s.getAs[Long]("sum_sq_norm") / s.getAs[Long]("n_vecs") / 10L)
  }

  test("persisted kNN edge layout equals the recomputed graph bit-for-bit") {
    import graft.sources.VectorIndex
    val layout = VectorIndex.knnEdges(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("score"))).sorted.toSeq
    val recompute = graft.operators.VectorSearch.annKnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("score"))).sorted.toSeq
    assert(layout == recompute,
      s"layout rows ${layout.size} != recompute ${recompute.size} or content drift")
    // the graph consumers read the layout, not the banded build: the
    // executed plan scans the knn_edges directory
    val plan = Clustering.graphPagerankTop(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_vindex_knn_edges"),
      s"pagerank does not ride the edge layout:\n${plan.take(2000)}")
  }

  test("graph_pagerank conserves damped mass over the kNN graph") {
    val rows = Clustering.graphPagerank(spark, sf).collect()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(rows.length == n, "every embedded vector keeps a rank row")
    // base mass floor: (1-d) of a ppm unit, exactly 150000 for
    // never-pointed-at nodes; DIV truncation only ever loses mass, so
    // total stays at or under the ppm invariant
    rows.foreach(r => assert(r.getAs[Long]("rank_ppm") >= 150000L))
    val total = rows.map(_.getAs[Long]("rank_ppm")).sum
    assert(total <= 1000000L * n, "integer PageRank cannot create mass")
    assert(total >= 150000L * n)
    // hubs exist: the kNN graph is not regular enough to flatline
    val ranks = rows.map(_.getAs[Long]("rank_ppm"))
    assert(ranks.max > ranks.min, "expected rank spread over the graph")

    // the hub-discovery entry: the global top-k of the same ranks,
    // total-ordered, and planned as TakeOrdered — never a corpus Sort
    val top = Clustering.graphPagerankTop(spark, sf)
    val topRows = top.collect()
    assert(topRows.length == math.min(Clustering.PrTopK, n).toInt)
    val pairs = topRows.map(r => (r.getAs[Long]("rank_ppm"), r.getAs[Long]("vec_id"))).toSeq
    assert(pairs == pairs.sortBy(p => (-p._1, p._2)))
    val expected = rows.map(r => (r.getAs[Long]("rank_ppm"), r.getAs[Long]("vec_id")))
      .sortBy(p => (-p._1, p._2)).take(pairs.length).toSeq
    assert(pairs == expected, "top-k must agree with the full ranking")
    val exec = top.queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered plan:\n$exec")
    val globalSorts = exec.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty,
      s"corpus-sized global Sort crept back into the plan:\n$exec")
  }

  test("embed_coreset medoids are each cluster's closest member and populations add up") {
    val asg = Clustering.embedKmeans(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"), r.getAs[Long]("dist")))
    val core = Clustering.embedCoreset(spark, sf).collect()
    assert(core.nonEmpty)
    assert(core.map(_.getAs[Long]("n_members")).sum == asg.length)
    core.foreach { r =>
      val c = r.getAs[Long]("cluster")
      val members = asg.filter(_._2 == c)
      assert(members.nonEmpty)
      // argmin with (dist, vec_id) tie-break
      val best = members.minBy(m => (m._3, m._1))
      assert(r.getAs[Long]("medoid_id") == best._1, s"cluster $c medoid")
      assert(r.getAs[Long]("dist") == best._3, s"cluster $c dist")
      assert(r.getAs[Long]("n_members") == members.length, s"cluster $c size")
    }
  }
}
