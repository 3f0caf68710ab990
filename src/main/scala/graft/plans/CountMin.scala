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
  * The row hashes derive from the engine's md5 hex60 (`"cm" + row + "_" +
  * token`), so the DuckDB oracle reproduces the EXACT estimate in SQL:
  * estimate = min over rows j of (count of input tokens colliding with
  * the probe's bucket j). Estimates overcount (never undercount); the
  * standard (ε, δ) bounds apply with ε = e/256, δ = e^-4.
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

  private val probeBuckets: Array[Int] = CmCount.buckets(probe)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](DEPTH * WIDTH)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < DEPTH) {
        buf(j * WIDTH + CmCount.bucket(j, s)) += 1
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

  /** Row-j bucket of a token: hex60(md5("cm<j>_<token>")) mod WIDTH —
    * the same definition the DuckDB oracle spells out. */
  def bucket(j: Int, token: String): Int =
    (HashUtil.hex60md5(UTF8String.fromString(s"cm${j}_$token")) % WIDTH)
      .toInt

  def buckets(token: String): Array[Int] =
    Array.tabulate(DEPTH)(j => bucket(j, token))

  def fromExprs(exprs: Seq[Expression]): CmCount = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_cm_count(token, probe) takes a column and a literal probe")
    CmCount(exprs.head,
      exprs(1).eval().asInstanceOf[UTF8String].toString)
  }
}
