package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as Catalyst column expressions.
  *
  * Everything here compiles to Spark's higher-order functions
  * (`zip_with`/`aggregate`/`transform`), which run inside whole-stage
  * codegen — no Scala UDF boxing on the hot path. All math is done in
  * DOUBLE with strictly sequential left-to-right accumulation so the
  * DuckDB oracle (list ops cast to DOUBLE[]) produces bit-identical
  * sums.
  *
  * Mirrors the scalar kernels of the reference engine
  * (grape-vector-db src/quantization.rs:195 cosine_similarity_manual,
  * src/sparse.rs:58 dot_product) re-expressed as distributed column
  * ops.
  */
object VectorFunctions {

  /** Cast a FLOAT array column to DOUBLE for stable math. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential dot product: sum_i a_i * b_i (native codegen'd
    * expression; see expressions.DotProd).
    */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(expressions.DotProd(expression(a), expression(b)))
  }

  /** Interpreted HOF dot product, kept as the reference semantics the
    * native expression must match.
    */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Squared L2 distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity; 0.0 when either side has zero norm (reference
    * behavior, quantization.rs:204). Native fused-loop expression —
    * one whole-stage-codegen pass over both arrays.
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(expressions.CosineSim(expression(a), expression(b)))
  }

  /** Interpreted HOF cosine, kept as the reference semantics the
    * native expression must match (see VectorFunctionsSpec).
    */
  def cosineSimilarityHof(a: Column, b: Column): Column = {
    val dot = dotProductHof(a, b)
    val na  = l2Norm(a)
    val nb  = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Binary quantization (reference quantization.rs:86 sign-threshold
    * bits): the vector becomes an array of 32-bit words, word w bit i
    * set iff v_{32w+i} > threshold. 32-bit words keep every
    * intermediate below 2^32, so the identical sum-of-powers packing
    * is exact in both Spark (double pow) and DuckDB (BIGINT shifts) —
    * no signed-64 overflow at bit 63.
    */
  def packSignBits(v: Column, dim: Int, threshold: Double = 0.0): Column = {
    require(dim % 32 == 0, s"dim must be a multiple of 32, got $dim")
    val words = (0 until dim / 32).map { w =>
      aggregate(
        zip_with(slice(v, w * 32 + 1, 32), sequence(lit(0), lit(31)), (x, i) =>
          when(x > threshold, pow(lit(2.0), i)).otherwise(lit(0.0))),
        lit(0.0), (acc, x) => acc + x).cast("long")
    }
    array(words: _*)
  }

  /** Hamming distance between two packed sign-bit word arrays. */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Hamming similarity = 1 - d/dim (reference quantization.rs:144). */
  def hammingSimilarity(a: Column, b: Column, dim: Int): Column =
    lit(1.0) - hammingDistance(a, b).cast("double") / lit(dim.toDouble)
}
