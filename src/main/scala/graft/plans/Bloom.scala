package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter (Bloom, "Space/time trade-offs in hash coding with
  * allowable errors", CACM 13(7), 1970) as the engine's fourth custom
  * TypedImperativeAggregate, paired with a scalar probe expression — the
  * classic broadcast-decontamination primitive: build an 8 KB filter over
  * the benchmark set's n-grams, broadcast it, and probe 100 TB of corpus
  * grams map-side with ZERO shuffle of the corpus (a semi-join would
  * shuffle or at least hash-probe per-row against a table; the bloom is
  * one AND-of-4-bit-tests per gram).
  *
  * Layout: M = 65536 bits (1024 longs), K = 4 bit positions per token,
  * position j = bytes 2j..2j+1 of md5("bf_" + token) big-endian — i.e.
  * hex chars 4j+1..4j+4 of the digest, so the DuckDB oracle reproduces
  * the EXACT filter (including its false positives) in SQL:
  * `CAST(concat('0x', substr(md5(concat('bf_', tok)), 4j+1, 4)) AS
  * BIGINT)`. The buffer merges by bitwise OR (commutative, associative),
  * so the filter is bit-identical under any partitioning.
  *
  * Reference anchor: the reference's pipeline has no decontamination
  * operator (SURVEY §2 north-star extension); Trino itself applies the
  * same idea as dynamic-filter bloom pushdown.
  */
case class BloomBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  import BloomUtil.{K, WORDS}

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_build"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_build: token column must be STRING, got " +
          child.dataType.sql)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](WORDS)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val d = HashUtil.md5bytes("bf_" + s)
      var j = 0
      while (j < K) {
        val bit = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
        buf(bit >>> 6) |= 1L << (bit & 63)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](WORDS)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : BloomBuild = copy(child = newChild)
}

object BloomUtil {
  val K = 4
  val WORDS = 1024 // 65536 bits = 8 KB

  /** All-K-bits-set membership test. Called from generated code. */
  def contains(filter: Array[Byte], token: UTF8String): Boolean = {
    val d = HashUtil.md5bytes("bf_" + token.toString)
    var j = 0
    while (j < K) {
      val bit = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
      // byte (bit >>> 3) of the big-endian long array: long w = bit >>> 6,
      // byte inside = 7 - ((bit >>> 3) & 7) because putLong is big-endian
      val byteIdx = ((bit >>> 6) << 3) + (7 - ((bit >>> 3) & 7))
      if ((filter(byteIdx) & (1 << (bit & 7))) == 0) return false
      j += 1
    }
    true
  }
}

/** `graft_bloom_contains(filter BINARY, token STRING)` — scalar membership
  * probe against a BloomBuild filter; codegen'd, NULL-propagating. */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains(filter BINARY, token STRING), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(f: Any, t: Any): Any =
    BloomUtil.contains(f.asInstanceOf[Array[Byte]], t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, t) => s"graft.plans.BloomUtil.contains($f, $t)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
