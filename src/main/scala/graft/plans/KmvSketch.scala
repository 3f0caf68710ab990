package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a custom
  * TypedImperativeAggregate (SURVEY §7.4: the engine-grade custom
  * aggregate path — mutable serialized buffer, partial/merge/final).
  * Estimator per Bar-Yossef et al., "Counting distinct elements in a
  * data stream" (RANDOM 2002) / Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations" (SIGMOD 2007):
  * E = (k−1)/U_(k) with U_(k) the kth smallest normalized hash.
  *
  * Unlike HLL (whose register layout is engine-specific, so
  * approx_count_distinct gets only a rows-only check), KMV over the
  * engine's md5-derived 60-bit hash is EXACTLY reproducible in SQL:
  * keep the k smallest distinct hashes; if fewer than k were seen the
  * count is exact, else estimate (k−1)·2^60 / kth-smallest. The buffer
  * (a bounded sorted set) is associative and commutative under merge, so
  * the result is partition-order independent — the property that lets a
  * 100 TB COUNT(DISTINCT) shuffle k·8 bytes per group instead of every
  * value.
  *
  * Input contract: a STRING column (callers cast; keeps the hash
  * definition identical to the DuckDB oracle's).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit = {
    while (buf.size() > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HashUtil.hex60md5(v.asInstanceOf[UTF8String])
      // only admit if it could be among the k smallest
      if (buf.size() < k || h < buf.last()) {
        buf.add(h)
        trim(buf)
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    trim(buf)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else (k - 1).toDouble * math.pow(2, 60) / buf.last().doubleValue()

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : KmvDistinct = copy(child = newChild)
}
