package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size membership bloom over the DISTINCT ELEMENTS of an array
  * (or map-key) column — the commit-time sidecar behind
  * `array_contains(tags, 'en')` FILE pruning. Zone maps stop at LIST/MAP
  * groups on purpose (repeated leaves have no scalar-bound semantics);
  * set membership is the predicate users actually run on them, and a
  * per-file bloom answers exactly that: bloom excludes the key ⇒ no row
  * of the file can satisfy the membership conjunct ⇒ the file drops at
  * planning time. Omission (old manifests, undeclared columns) means
  * cannot-exclude, the same soundness rule as every other zone.
  *
  * Hashing is pinned here and NOWHERE else — FNV-1a 64 over the
  * element's bytes (UTF-8 for strings, little-endian 8 bytes for
  * integral values widened to long), two bit positions by
  * Kirsch-Mitzenmacher double hashing with a splitmix64-mixed second
  * hash. The bytes land in manifests, so this must stay stable forever;
  * never swap the hash without a new segment key.
  */
object MemberBloom {

  /** Default filter size in BITS (1 KiB per file per column in the
    * manifest, ~1.4k chars base64). Sized for tag-style membership
    * columns — languages, topics, source labels — where a file holds
    * hundreds of distinct elements (n=500 → ~1.4% false-keep; n=2000 →
    * ~15%; saturation is merely no-pruning, never wrong results).
    * Override per table with `graft.member-bloom-bits`.
    */
  val DefaultBits = 8192

  def fnv64(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer — decorrelates the second probe position from
    * the first. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashUtf8(s: UTF8String): Long = fnv64(s.getBytes, 0, s.numBytes())

  def hashLong(v: Long): Long = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    fnv64(b, 0, 8)
  }

  private def pos(h: Long, bits: Int): Int = (((h % bits) + bits) % bits).toInt

  def set(bloom: Array[Byte], h: Long): Unit = {
    val bits = bloom.length * 8
    val p1 = pos(h, bits)
    val p2 = pos(mix(h), bits)
    bloom(p1 >>> 3) = (bloom(p1 >>> 3) | (1 << (p1 & 7))).toByte
    bloom(p2 >>> 3) = (bloom(p2 >>> 3) | (1 << (p2 & 7))).toByte
  }

  /** True unless the bloom POSITIVELY excludes the hashed element. */
  def mightContain(bloom: Array[Byte], h: Long): Boolean = {
    val bits = bloom.length * 8
    val p1 = pos(h, bits)
    val p2 = pos(mix(h), bits)
    ((bloom(p1 >>> 3) >> (p1 & 7)) & 1) == 1 &&
      ((bloom(p2 >>> 3) >> (p2 & 7)) & 1) == 1
  }

  /** Column-API entry: aggregate an ARRAY column's elements into one
    * bloom per group (pass `map_keys(col)` for MAP-key membership).
    */
  def memberBloomAgg(arr: Column, bits: Int = DefaultBits): Column =
    ColumnBridge.column(
      MemberBloomAgg(ColumnBridge.expression(arr), bits).toAggregateExpression())
}

/** One bloom buffer per group; update folds every non-null element of
  * the input array in, merge ORs partial buffers (map-side combine
  * ships `bits/8` bytes per group, independent of element count).
  * Null arrays and null elements contribute nothing: membership
  * predicates on them never evaluate TRUE, so skipping them is exact.
  */
case class MemberBloomAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(bits >= 64 && bits % 64 == 0, "bloom bits must be a multiple of 64")

  // resolved lazily: at construction the child may still be an
  // unresolved Column whose dataType is not yet known
  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"member_bloom_agg takes an array column, got $other")
  }
  private lazy val hashOf: (ArrayData, Int) => Long = elemType match {
    case StringType  => (a, i) => MemberBloom.hashUtf8(a.getUTF8String(i))
    case LongType    => (a, i) => MemberBloom.hashLong(a.getLong(i))
    case IntegerType => (a, i) => MemberBloom.hashLong(a.getInt(i).toLong)
    case ShortType   => (a, i) => MemberBloom.hashLong(a.getShort(i).toLong)
    case ByteType    => (a, i) => MemberBloom.hashLong(a.getByte(i).toLong)
    case other => throw new IllegalArgumentException(
      s"member_bloom_agg elements must be string or integral, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "member_bloom_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](bits / 8)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) MemberBloom.set(buffer, hashOf(arr, i))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): MemberBloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MemberBloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MemberBloomAgg =
    copy(child = newChildren.head)
}
