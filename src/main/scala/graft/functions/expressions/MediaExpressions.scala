package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic STUB feature extractor over a binary media payload
  * (the Spark-side shape of a real embedding/feature kernel): an
  * 8-bin positional byte histogram, bin d = sum of unsigned byte
  * values at positions ≡ d (mod 8), computed in one codegen'd pass.
  *
  * A real extractor (image embedding, mel spectrogram) replaces the
  * loop body only — the column type, plan shape and partitioning are
  * identical. Exact integer output keeps the DuckDB oracle
  * (hex-substring byte extraction) bit-identical.
  */
case class ByteFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ByteFeatures.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ByteFeatures.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteFeatures {
  final val Bins = 8

  def compute(payload: Array[Byte]): GenericArrayData = {
    val sums = new Array[Long](Bins)
    var i = 0
    while (i < payload.length) {
      sums(i % Bins) += payload(i) & 0xffL
      i += 1
    }
    new GenericArrayData(sums)
  }
}

/** Deterministic mock embedding provider (reference src/embeddings.rs:222
  * MockEmbeddingProvider): dimension d vector with
  * v_i = fmod(byte(i mod len)/255 + i*0.01, 1) - 0.5, L2-normalized.
  * Double arithmetic on both engines (the DuckDB oracle replays the
  * identical fmod/normalize), computed in one codegen'd pass — the
  * batch "embedding provider" of this engine is a map over the corpus;
  * a real provider swaps the loop for a model call with the same
  * column contract.
  */
case class MockEmbedding(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MockEmbedding.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MockEmbedding.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MockEmbedding {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, dim: Int): GenericArrayData = {
    val bytes = text.getBytes
    val v = new Array[Double](dim)
    if (bytes.length > 0) {
      var i = 0
      while (i < dim) {
        v(i) = ((bytes(i % bytes.length) & 0xff) / 255.0 + i * 0.01) % 1.0 - 0.5
        i += 1
      }
      var norm = 0.0
      var j = 0
      while (j < dim) { norm += v(j) * v(j); j += 1 }
      norm = math.sqrt(norm)
      if (norm > 0.0) {
        var k = 0
        while (k < dim) { v(k) /= norm; k += 1 }
      }
    }
    new GenericArrayData(v)
  }
}
