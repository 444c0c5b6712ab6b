package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash majority-vote as a single imperative aggregate.
  *
  * The declarative formulation is `bits` separate `sum(CASE WHEN (h>>b)&1=1
  * THEN 1 ELSE -1 END)` aggregate columns plus a final-projection
  * reassembly — 60 aggregate buffers and 60 CASE evaluations per token.
  * This [[TypedImperativeAggregate]] keeps ONE `long[bits]` vote buffer per
  * group: update is a single loop over the hash's bits, partial buffers
  * merge elementwise (map-side combine works exactly as with the column
  * formulation — the shuffle still carries `bits` longs per group), and
  * eval assembles the fingerprint directly (`bit b set iff votes(b) > 0`,
  * the same strict-majority rule as the declarative twin and the DuckDB
  * oracle).
  */
case class SimhashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bits > 0 && bits < 63, "fingerprint must stay sign-safe in a long")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buffer(b) += (((h >> b) & 1L) * 2L - 1L) // +1 for a set bit, -1 otherwise
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (buffer(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 8)
    var b = 0
    while (b < bits) { bb.putLong(buffer(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bits)
    var b = 0
    while (b < bits) { out(b) = bb.getLong(); b += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {
  /** Column-API entry: aggregate a long-hash column into the SimHash
    * fingerprint of the group.
    */
  def simhashAgg(hash: Column, bits: Int): Column =
    ColumnBridge.column(
      SimhashAgg(ColumnBridge.expression(hash), bits).toAggregateExpression())
}
