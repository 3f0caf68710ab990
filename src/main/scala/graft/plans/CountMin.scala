package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min frequency sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 55(1), 2005) as the engine's third custom
  * TypedImperativeAggregate: `graft_cm_count(token, 'probe')` estimates
  * how many input rows equal the probe string, with state bounded at
  * DEPTH×WIDTH counters (4×256 longs = 8 KB) no matter the input size.
  *
  * Like the KMV and histogram sketches — and unlike Space-Saving /
  * Misra-Gries, whose survivor sets depend on merge order — the buffer
  * is a counter matrix merged by element-wise addition (commutative,
  * associative), so a grouped frequency estimate is bit-identical under
  * any partitioning and shuffles 8 KB per group instead of every token.
  * All DEPTH row-buckets derive from ONE md5 digest per token — bucket j
  * is byte j of md5("cm_" + token) — so the hot path computes a single
  * hash per row (a one-entry thread-local memo additionally shares it
  * across the aggregate instances evaluating the same input row), and the
  * DuckDB oracle reproduces the EXACT estimate in SQL via hex substrings
  * of the same digest: estimate = min over rows j of (count of input
  * tokens colliding with the probe's bucket j). Estimates overcount
  * (never undercount); the standard (ε, δ) bounds apply with ε = e/256,
  * δ = e^-4.
  */
case class CmCount(
    child: Expression,
    probe: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  import CmCount.{DEPTH, WIDTH}

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cm_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cm_count: token column must be STRING, got " +
          child.dataType.sql)

  private val probeBuckets: Array[Int] = CmCount.buckets(probe)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](DEPTH * WIDTH)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bks = CmCount.bucketsCached(v.asInstanceOf[UTF8String].toString)
      var j = 0
      while (j < DEPTH) {
        buf(j * WIDTH + bks(j)) += 1
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var est = Long.MaxValue
    var j = 0
    while (j < DEPTH) {
      val c = buf(j * WIDTH + probeBuckets(j))
      if (c < est) est = c
      j += 1
    }
    est
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](DEPTH * WIDTH)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmCount =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmCount =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : CmCount = copy(child = newChild)
}

object CmCount {
  val DEPTH = 4
  val WIDTH = 256

  /** All DEPTH buckets of a token from ONE digest: bucket j is byte j of
    * md5("cm_" + token) — the same definition the DuckDB oracle spells
    * out as hex substrings of the same md5. */
  def buckets(token: String): Array[Int] = {
    val d = HashUtil.md5bytes("cm_" + token)
    Array.tabulate(DEPTH)(j => d(j) & 0xff)
  }

  // One-entry per-thread memo: the aggregate instances for different
  // probes all evaluate the same token of the same input row back to
  // back, so the digest is shared across instances without shared state.
  private val memo =
    ThreadLocal.withInitial[Array[AnyRef]](() => new Array[AnyRef](2))

  def bucketsCached(token: String): Array[Int] = {
    val m = memo.get()
    if (token.equals(m(0))) m(1).asInstanceOf[Array[Int]]
    else {
      val b = buckets(token)
      m(0) = token
      m(1) = b
      b
    }
  }

  def fromExprs(exprs: Seq[Expression]): CmCount = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_cm_count(token, probe) takes a column and a literal probe")
    val probe = exprs(1).eval() match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_cm_count: probe must be a STRING literal, got $other")
    }
    CmCount(exprs.head, probe)
  }
}
