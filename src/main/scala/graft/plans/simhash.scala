package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * SimHash as ONE aggregate (reference concept: near-dup fingerprinting;
 * the reference ships retractable/fused agg functions in
 * flink-table-runtime-blink .../functions/aggfunctions — this follows the
 * same fused-buffer idea on Spark's TypedImperativeAggregate).
 *
 * Folds 60-bit token hashes into a single 60-int vote vector per group:
 * bit b of the result is set iff more input hashes had bit b set than
 * clear. Replaces the previous 60 independent `sum(CASE)` aggregate
 * columns — one buffer, one tight update loop, and map-side partial
 * aggregation still applies (merge sums the vectors), so shuffle volume
 * per doc per partition is 60 ints either way but the per-row update cost
 * drops from 60 generated aggregate slots to one array walk.
 */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && bits >= 1 && bits <= 63)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires a BIGINT hash and 1 <= bits <= 63, got " +
        s"${child.dataType.catalogString}, bits=$bits")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 4)
    var i = 0
    while (i < bits) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](bits)
    var i = 0
    while (i < bits) { buf(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): SimHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}
