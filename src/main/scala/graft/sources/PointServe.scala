package graft.sources

import graft.operators.VectorSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-JVM point-query serving over the persisted ANN layouts — the
  * serving tier the reference runs as its whole engine (grape-vector-db
  * src/index.rs:95-260 serves sub-millisecond lookups from an
  * in-memory HNSW graph; src/embedded.rs is the single-node embedded
  * mode). graft's batch tier answers ANN queries as Spark jobs, which
  * carry a ~0.15-1s scheduling floor no plan can remove; this module
  * closes that gap for POINT lookups: load a persisted layout ONCE
  * (one Spark job), then answer queries in plain JVM microseconds with
  * ZERO Spark jobs (spec-asserted via a job listener).
  *
  * The batch and serving tiers share one source of truth — the same
  * partitioned parquet layouts [[VectorIndex]] builds and the
  * streaming paths maintain — and the serving math replicates the
  * batch kernels loop-for-loop (sequential accumulation order
  * included), so served results are BIT-IDENTICAL to the batch twins:
  * PointServeSpec asserts equality against [[VectorIndex.annLshFromIndex]]
  * / `annIvfFromIndex` / `annPqFromIndex` row sets.
  *
  * Memory contracts (what each index holds resident):
  *  - LSH / IVF: vec_id + full vector per row — the embedded
  *    single-node shape, exactly what the reference engine keeps in
  *    memory. A 100 TB corpus does not fit one node any more than it
  *    fits the reference; there the layout's bucket/cell directories
  *    shard across serving nodes, each loading its partitions (the
  *    partition column IS the shard key).
  *  - PQ: vec_id + M codes (~25x compressed — the shape that makes a
  *    large corpus servable from memory) + the one-row codebook. The
  *    exact-rescore stage needs original vectors, which the codes
  *    layout deliberately omits: the caller plugs a `vectorLookup`
  *    (in embedded mode a heap map; at scale the KV/feature-store
  *    tier) or gets ADC-ranked results unrescored — the same
  *    approximate/exact split as the batch twin.
  */
object PointServe {

  /** One served hit; `score` is the fx4 fixed-point BIGINT the batch
    * twins emit (cosine for LSH/IVF, exact squared-L2 for PQ rescore).
    */
  final case class Hit(rank: Int, vecId: Long, score: Long)

  private def fx4(x: Double): Long = math.floor(x * 10000L + 0.5).toLong

  /** [[graft.functions.expressions.CosineSim]] loop, Array[Double] form. */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = a(i); val yi = b(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  /** Sequential squared L2 (VectorFunctions.l2DistanceSq order). */
  private def l2Sq(a: Array[Double], b: Array[Double], aOff: Int, len: Int,
                   bOff: Int): Double = {
    var dist = 0.0
    var i = 0
    while (i < len) {
      val d = a(aOff + i) - b(bOff + i)
      dist += d * d
      i += 1
    }
    dist
  }

  /** [[graft.functions.expressions.HyperplaneSig]] loop. */
  private def signature(v: Array[Double], planes: Array[Array[Int]]): Long = {
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val plane = planes(j)
      val n = math.min(v.length, plane.length)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v(d) * plane(d).toDouble; d += 1 }
      if (dot > 0.0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Rank candidates exactly like the batch twins: score DESC (or dist
    * ASC via negation), vec_id ASC, take k, rank 1..k.
    */
  private def topK(cands: Iterator[(Long, Long)], k: Int,
                   ascending: Boolean = false): Seq[Hit] = {
    val ord = if (ascending) Ordering.by[(Long, Long), (Long, Long)](c => (c._2, c._1))
              else Ordering.by[(Long, Long), (Long, Long)](c => (-c._2, c._1))
    // bounded selection: a k-sized priority queue over the candidate
    // stream (the serving analog of TopKAgg's bounded map-side heap)
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)
    cands.foreach { c =>
      heap.enqueue(c)
      if (heap.size > k) heap.dequeue()
    }
    heap.toSeq.sorted(ord).zipWithIndex
      .map { case ((id, s), i) => Hit(i + 1, id, s) }
  }

  /** LSH point index: bucket → members with full vectors resident.
    * Query math mirrors [[VectorIndex.annLshFromIndex]] exactly:
    * signature on the same deterministic plane family, XOR multi-probe
    * mask set, fx4 cosine, (score DESC, vec_id ASC) ranking.
    */
  final class Lsh private[PointServe] (
      buckets: java.util.HashMap[Int, Array[(Long, Array[Double])]],
      planes: Array[Array[Int]], masks: Array[Long]) {

    def query(qv: Array[Double], k: Int = 5, excludeId: Long = -1L): Seq[Hit] = {
      val qbucket = signature(qv, planes).toInt
      val cands = masks.iterator.flatMap { m =>
        val b = buckets.get(qbucket ^ m.toInt)
        if (b == null) Iterator.empty
        else b.iterator.filter(_._1 != excludeId)
          .map { case (id, emb) => (id, fx4(cosine(emb, qv))) }
      }
      topK(cands, k)
    }

    def size: Int = {
      var n = 0
      buckets.values().forEach(a => n += a.length)
      n
    }
  }

  /** Load the LSH layout into memory (builds it first if absent). One
    * Spark job here; zero afterwards.
    */
  def loadLsh(spark: SparkSession, dir: String,
              radius: Int = VectorSearch.LshProbeRadius): Lsh = {
    val path = VectorIndex.lshIndexReady(spark, dir)
    val rows = spark.read.parquet(path)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("bucket"))
      .collect()
    val buckets = new java.util.HashMap[Int, Array[(Long, Array[Double])]]()
    rows.groupBy(_.getInt(2)).foreach { case (b, rs) =>
      buckets.put(b, rs.map(r =>
        (r.getLong(0), r.getSeq[Double](1).toArray)))
    }
    new Lsh(buckets,
      VectorSearch.lshPlanes(64, VectorSearch.AnnLshPlanes),
      VectorSearch.lshProbeMasks(VectorSearch.AnnLshPlanes, radius))
  }

  /** IVF point index: fine-centroid table + cell → members resident.
    * Query math mirrors [[VectorIndex.annIvfFromIndex]]: nearest
    * [[VectorSearch.IvfProbeCoarse]] coarse centroids by (L2, cid),
    * nprobe nearest fine cells inside them, fx4 cosine over the probed
    * cells, (score DESC, vec_id ASC) top-k.
    */
  final class Ivf private[PointServe] (
      cells: java.util.HashMap[Int, Array[(Long, Array[Double])]],
      fine: Array[(Long, Array[Double], Long)], // (cid, cemb, ccid)
      stride: Int) {

    def query(qv: Array[Double], k: Int = 20, excludeId: Long = -1L,
              nprobe: Int = VectorSearch.IvfNprobe): Seq[Hit] = {
      val coarseMod = stride.toLong * VectorSearch.IvfCoarse
      val qcoarse = fine.iterator.filter(_._1 % coarseMod == 0)
        .map { case (cid, cemb, _) => (cid, l2Sq(cemb, qv, 0, math.min(cemb.length, qv.length), 0)) }
        .toSeq.sortBy { case (cid, d) => (d, cid) }
        .take(VectorSearch.IvfProbeCoarse).map(_._1).toSet
      val probeCells = fine.iterator.filter(f => qcoarse.contains(f._3))
        .map { case (cid, cemb, _) => (cid, l2Sq(cemb, qv, 0, math.min(cemb.length, qv.length), 0)) }
        .toSeq.sortBy { case (cid, d) => (d, cid) }
        .take(nprobe).map(_._1.toInt)
      val cands = probeCells.iterator.flatMap { c =>
        val members = cells.get(c)
        if (members == null) Iterator.empty
        else members.iterator.filter(_._1 != excludeId)
          .map { case (id, emb) => (id, fx4(cosine(emb, qv))) }
      }
      topK(cands, k)
    }
  }

  def loadIvf(spark: SparkSession, dir: String): Ivf = {
    val path = VectorIndex.ivfIndexReady(spark, dir)
    val rows = spark.read.parquet(path)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("cell"))
      .collect()
    val cells = new java.util.HashMap[Int, Array[(Long, Array[Double])]]()
    rows.groupBy(_.getInt(2)).foreach { case (c, rs) =>
      cells.put(c, rs.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)))
    }
    val fine = spark.read.parquet(path + "_centroids")
      .select(col("cid"), col("cemb"), col("ccid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    new Ivf(cells, fine, VectorSearch.IvfStride)
  }

  /** PQ point index: codes + codebook resident (no vectors — the
    * compressed serving shape). Query mirrors
    * [[VectorIndex.annPqFromIndex]]: per-query ADC table, coarse
    * (adc_dist ASC, vec_id ASC) top-[[VectorSearch.PqCoarseK]], then
    * exact-L2 rescore through `vectorLookup` when provided — with a
    * lookup the result set is bit-identical to the batch twin; without
    * one the fx4 ADC ranking is returned as-is (approximate tier).
    */
  final class Pq private[PointServe] (
      ids: Array[Long], codes: Array[Array[Int]],
      books: Array[Array[Array[Double]]]) { // m -> cid -> subvector

    import VectorSearch.{PqM, PqSubDim}

    def query(qv: Array[Double], k: Int = 20, excludeId: Long = -1L,
              coarseK: Int = VectorSearch.PqCoarseK,
              vectorLookup: Long => Option[Array[Double]] = _ => None): Seq[Hit] = {
      val adc = Array.tabulate(PqM, books(0).length) { (m, c) =>
        l2Sq(qv, books(m)(c), m * PqSubDim, PqSubDim, 0)
      }
      val coarse = topK(
        ids.iterator.zip(codes.iterator).filter(_._1 != excludeId).map {
          case (id, code) =>
            var dist = 0.0
            var m = 0
            while (m < PqM) { dist += adc(m)(code(m)); m += 1 }
            (id, fx4(dist))
        }, coarseK, ascending = true)
      val rescored = coarse.flatMap(h => vectorLookup(h.vecId).map(emb =>
        (h.vecId, fx4(l2Sq(emb, qv, 0, math.min(emb.length, qv.length), 0)))))
      if (rescored.isEmpty) coarse.take(k).zipWithIndex.map {
        case (h, i) => Hit(i + 1, h.vecId, h.score)
      }
      else topK(rescored.iterator, k, ascending = true)
    }
  }

  def loadPq(spark: SparkSession, dir: String): Pq = {
    import VectorSearch.PqM
    val path = VectorIndex.pqIndexReady(spark, dir)
    val codeCols = (0 until PqM).map(m => col(s"code$m"))
    val rows = spark.read.parquet(path)
      .select(col("vec_id") +: codeCols: _*).collect()
    val ids = rows.map(_.getLong(0))
    val codes = rows.map(r => Array.tabulate(PqM)(m => r.getInt(m + 1)))
    // books parquet: one row of PqM array<struct<cid,cemb>> columns;
    // codes index cid-sorted order (annPqFromIndex array_sorts), and
    // cids are the dense 0..PqK-1 range by construction
    val bookRow = spark.read.parquet(path + "_books")
      .select((0 until PqM).map(m => col(s"book$m")): _*).collect()(0)
    val books = Array.tabulate(PqM) { m =>
      bookRow.getSeq[org.apache.spark.sql.Row](m)
        .sortBy(_.getLong(0))
        .map(_.getSeq[Double](1).toArray).toArray
    }
    new Pq(ids, codes, books)
  }
}
