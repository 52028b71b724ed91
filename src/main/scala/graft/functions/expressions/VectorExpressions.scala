package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine similarity over two ArrayType(Double) columns.
  *
  * Spark's higher-order functions (aggregate/zip_with) are
  * CodegenFallback — every element crosses an interpreted lambda.
  * This native expression generates a single fused Java loop (dot and
  * both norms in one pass), keeping vector scoring inside whole-stage
  * codegen.
  *
  * Accumulation order is strictly sequential and the final formula is
  * dot / (sqrt(na) * sqrt(nb)) with a 0.0 guard for zero norms —
  * bit-identical to the HOF formulation and to the DuckDB oracle
  * (list_dot_product on DOUBLE[]), and matching the reference kernel
  * (grape-vector-db src/quantization.rs:195).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {


  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |double $sa = java.lang.Math.sqrt($na);
         |double $sb = java.lang.Math.sqrt($nb);
         |${ev.value} = ($sa == 0.0 || $sb == 0.0) ? 0.0 : $dot / ($sa * $sb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment for IVF index builds: given a vector
  * and the broadcast centroid list (array of struct(cid BIGINT,
  * cemb ARRAY<DOUBLE>)), return the cid minimizing sequential squared
  * L2, ties to the smaller cid — exactly the lexicographic
  * (dist, cid) argmin of the relational array_sort formulation
  * (spec-enforced parity), but one fused loop instead of an
  * interpreted per-centroid lambda plus a per-row sort.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(v: Any, c: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.expressions.NearestCentroid.compute($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  def compute(emb: ArrayData, cents: ArrayData): Long = {
    var bestDist = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    val n = cents.numElements()
    var i = 0
    while (i < n) {
      val s = cents.getStruct(i, 2)
      val cid = s.getLong(0)
      val cemb = s.getArray(1)
      val d = math.min(emb.numElements(), cemb.numElements())
      var dist = 0.0
      var j = 0
      while (j < d) {
        val diff = emb.getDouble(j) - cemb.getDouble(j)
        dist += diff * diff
        j += 1
      }
      if (dist < bestDist || (dist == bestDist && cid < bestCid)) {
        bestDist = dist
        bestCid = cid
      }
      i += 1
    }
    bestCid
  }
}

/** Fused dot product over two ArrayType(Double) columns; same codegen
  * rationale as [[CosineSim]].
  */
case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression {


  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused random-hyperplane LSH signature: bit j of the result is the
  * sign of the projection of the vector onto plane j. The relational
  * form (one aggregate/zip_with HOF chain PER PLANE) crosses an
  * interpreted lambda per element per plane — 16 planes x 64 dims
  * made cold LSH banding the slowest map on the corpus (12.8s cold
  * at sf0.1); this is one generated nested loop inside whole-stage
  * codegen. Accumulation is d=0..dim-1 sequential with the +-1 plane
  * entry applied as a double multiply — bit-identical to the HOF
  * formulation and the DuckDB oracle's list_dot_product.
  *
  * Planes ride the expression node itself (driver-built literal
  * matrix, see VectorSearch.lshPlanes) and reach generated code via
  * addReferenceObj.
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Int]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private lazy val planeArr: Array[Array[Int]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], planeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planeArr, "int[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HyperplaneSig.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  def compute(v: ArrayData, planes: Array[Array[Int]]): Long = {
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val plane = planes(j)
      val n = math.min(v.numElements(), plane.length)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getDouble(d) * plane(d).toDouble; d += 1 }
      if (dot > 0.0) sig |= 1L << j
      j += 1
    }
    sig
  }
}
