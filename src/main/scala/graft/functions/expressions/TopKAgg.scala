package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs,
  * ordered by score DESC with id ASC tie-break.
  *
  * This is the scale-critical replacement for the
  * `row_number() OVER (PARTITION BY ...) <= k` pattern: a window
  * shuffles and sorts EVERY scored row, while this aggregate keeps a
  * k-bounded buffer map-side, so only numPartitions*k candidates per
  * group ever reach the exchange. Returns
  * array<struct<score double, id long>> sorted best-first.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]] {

  type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType), containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf

  /** (a beats b) under score DESC, id ASC. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Buf, e: (Double, Long)): Unit = {
    if (buf.length < k) {
      buf += e
      if (buf.length == k) buf.sortInPlace()(Ordering.fromLessThan(beats))
    } else if (beats(e, buf.last)) {
      // replace the current worst, restore order (k is small)
      buf(k - 1) = e
      var i = k - 1
      while (i > 0 && beats(buf(i), buf(i - 1))) {
        val t = buf(i); buf(i) = buf(i - 1); buf(i - 1) = t; i -= 1
      }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      insert(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.sortBy(e => (-e._1, e._2)).toArray
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Long-scored twin of [[TopKAgg]] for exact integer ranking: event
  * counts / fixed-point scores routed through TopKAgg's double slot
  * lose exactness above 2^53, so ranking and tie-breaks could diverge
  * from an integer-ordered `row_number` oracle at extreme volumes.
  * This variant keeps the score a Long end-to-end — bit-exact at any
  * BIGINT magnitude — with the same score-DESC/id-ASC order and the
  * same bounded map-side heap. Returns
  * array<struct<score long, id long>> sorted best-first.
  */
case class TopKLongAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]] {

  type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", LongType).add("id", LongType), containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf

  /** (a beats b) under score DESC, id ASC. */
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Buf, e: (Long, Long)): Unit = {
    if (buf.length < k) {
      buf += e
      if (buf.length == k) buf.sortInPlace()(Ordering.fromLessThan(beats))
    } else if (beats(e, buf.last)) {
      buf(k - 1) = e
      var i = k - 1
      while (i > 0 && beats(buf(i), buf(i - 1))) {
        val t = buf(i); buf(i) = buf(i - 1); buf(i - 1) = t; i -= 1
      }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      insert(buf, (s.asInstanceOf[Long], id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.sortBy(e => (-e._1, e._2)).toArray
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, id) => bb.putLong(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column API: top-k (score, id) pairs per group, best-first.
    * The score slot is a DOUBLE: integer scores are exact only below
    * 2^53 — route exact BIGINT ranking through [[topKLong]] instead.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(score), expression(id), k)
      .toAggregateExpression(isDistinct = false))

  /** Long-scored variant: exact at any BIGINT magnitude. */
  def topKLong(score: Column, id: Column, k: Int): Column =
    column(TopKLongAgg(expression(score), expression(id), k)
      .toAggregateExpression(isDistinct = false))
}
