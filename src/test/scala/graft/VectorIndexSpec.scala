package graft

import graft.operators.VectorSearch
import graft.sources.VectorIndex

/** The persisted ANN layouts (save_index / load_index / rebuild_index
  * re-expression) must serve bit-identical results to their scan-side
  * twins, and their probe plans must dynamic-partition-prune the
  * corpus scan — the property that makes the layout an index at
  * 100 TB (only probed bucket/cell directories are read).
  */
class VectorIndexSpec extends GraftSuite {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString + "/idx"
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("LSH index serves the exact annLsh results with a partition-pruned scan") {
    val path = tmpDir("graft_lsh_idx")
    VectorIndex.buildLshIndex(spark, sf, path)
    val served = VectorIndex.annLshFromIndex(spark, path, VectorIndex.queryBatch(spark, sf, 8))
    assert(rows(served) == rows(VectorSearch.annLsh(spark, sf)))
    // the bucket equi-join must reach the scan as a dynamic partition
    // pruning filter (file-level prune to the probed buckets)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP on bucket join:\n$plan")
    // the layout is partitioned by bucket
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.matches("bucket=\\d+")))
  }

  test("IVF index serves the exact annIvf results with a partition-pruned scan") {
    val path = tmpDir("graft_ivf_idx")
    VectorIndex.buildIvfIndex(spark, sf, path)
    val served = VectorIndex.annIvfFromIndex(spark, path, VectorIndex.queryBatch(spark, sf, 1))
    assert(rows(served) == rows(VectorSearch.annIvf(spark, sf)))
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP on cell join:\n$plan")
  }

  test("PQ codes layout serves the exact annPq results without storing vectors") {
    val path = tmpDir("graft_pq_idx")
    VectorIndex.buildPqIndex(spark, sf, path)
    val served = VectorIndex.annPqFromIndex(spark, sf, path,
      VectorIndex.queryBatch(spark, sf, 1))
    assert(rows(served) == rows(VectorSearch.annPq(spark, sf)))
    // the layout holds vec_id + one code column per subspace and NO
    // embeddings — the ~25x compression is the point of the index
    val schema = spark.read.parquet(path).schema.fieldNames.toSet
    assert(schema == (Set("vec_id") ++ (0 until VectorSearch.PqM).map(m => s"code$m")),
      s"unexpected layout schema: $schema")
  }

  test("rebuild overwrites the layout in place (rebuild_index contract)") {
    val path = tmpDir("graft_lsh_rebuild")
    VectorIndex.buildLshIndex(spark, sf, path)
    val first = rows(VectorIndex.annLshFromIndex(spark, path, VectorIndex.queryBatch(spark, sf, 8)))
    VectorIndex.buildLshIndex(spark, sf, path) // rebuild over existing
    assert(rows(VectorIndex.annLshFromIndex(spark, path, VectorIndex.queryBatch(spark, sf, 8))) == first)
  }

  test("staged rebuildIndexes swaps live layouts and leaves no stray directories") {
    val lsh = VectorIndex.indexPath(sf, "lsh")
    val before = rows(VectorIndex.annLshIndexed(spark, sf)) // build-if-missing
    VectorIndex.rebuildIndexes(spark, sf)                   // forced staged swap
    assert(rows(VectorIndex.annLshIndexed(spark, sf)) == before)
    assert(rows(VectorIndex.annIvfIndexed(spark, sf)) ==
      rows(graft.operators.VectorSearch.annIvf(spark, sf)))
    // no staging/old/broken residue next to the live layouts
    val parent = new java.io.File(lsh).getParentFile
    val stray = parent.listFiles().map(_.getName)
      .filter(n => n.startsWith(new java.io.File(lsh).getName + ".") ||
        n.contains(".stage-") || n.contains(".old-") || n.contains(".broken-"))
    assert(stray.isEmpty, s"stray index dirs left: ${stray.toSeq}")
  }
}
