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
