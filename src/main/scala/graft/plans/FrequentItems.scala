package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary (heavy hitters) as a fifth custom
  * TypedImperativeAggregate (Misra & Gries, "Finding repeated elements",
  * Sci. Comput. Program. 1982; merge rule from Agarwal et al.,
  * "Mergeable summaries", PODS 2012).
  *
  * Why next to [[CmCount]] and exact GROUP BY counting: Count-Min
  * answers POINT frequency queries but cannot enumerate the frequent
  * items without knowing them in advance; an exact per-group top-k
  * (`text_frequent_tokens`, `topk_per_group`) shuffles every (group,
  * term) pair. This summary holds at most `capacity` counters per group,
  * builds map-side (ObjectHashAggregate partial), and only the bounded
  * counter maps cross the exchange — the production shape for "top
  * terms per language over 100 TB", where the term universe is
  * unbounded but the answer is small.
  *
  * Contracts (spec-pinned in FrequentItemsSpec):
  *  - counts UNDERestimate: cnt <= true, and true - cnt <= N/(capacity+1)
  *    where N is the group's total item count — the classic MG bound,
  *    preserved under the Agarwal merge (union-sum, then subtract the
  *    (capacity+1)-st largest count and drop non-positive counters);
  *  - any item with true count > 2N/(capacity+1) is guaranteed present;
  *  - when capacity >= the group's distinct-item count no decrement ever
  *    fires and every count is EXACT — the regime the DuckDB oracle
  *    checks (the harness vocabulary is ~31 tokens, capacity 64);
  *  - output is array<struct<term,cnt>> sorted (cnt DESC, term ASC) —
  *    deterministic on any partitioning (merge is commutative up to the
  *    final sorted render; spec pins partition independence).
  * NULL inputs are skipped; an empty group yields an empty array.
  */
case class FrequentItemsAgg(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with BinaryLike[Expression] {

  // lazy so a bad capacity surfaces through checkInputDataTypes as a
  // clean analysis error, not a constructor throw during planning
  private lazy val capacity: Int = {
    require(capacityExpr.foldable,
      "graft_frequent_items: capacity must be a literal")
    val c = capacityExpr.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long    => Math.toIntExact(l.longValue())
      case other => throw new IllegalArgumentException(
        s"graft_frequent_items: capacity must be integral, got $other")
    }
    require(c > 0, s"graft_frequent_items: capacity must be > 0, got $c")
    c
  }

  override def left: Expression = child
  override def right: Expression = capacityExpr

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(
        s"graft_frequent_items: term column must be STRING, got " +
          child.dataType.sql)
    else if (!capacityExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(capacityExpr.dataType))
      TypeCheckFailure(
        "graft_frequent_items: capacity must be an integral literal, got " +
          capacityExpr.dataType.sql)
    else capacityExpr.eval() match {
      // value check at analysis time too: capacity 0 or negative must
      // fail the query cleanly, not throw from a lazy require during
      // executor-side update
      case null => TypeCheckFailure(
        "graft_frequent_items: capacity must not be NULL")
      case n: Number if n.longValue() <= 0 => TypeCheckFailure(
        s"graft_frequent_items: capacity must be > 0, got ${n.longValue()}")
      case _ => TypeCheckSuccess
    }
  }
  override def prettyName: String = "graft_frequent_items"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buf.get(k) match {
        case Some(c) => buf(k) = c + 1
        case None if buf.size < capacity => buf(k) = 1L
        case None =>
          // decrement-all eviction: O(capacity), amortized O(1) per
          // arrival (each decrement pays back an earlier increment)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Agarwal et al. merge: union-sum, then if over capacity subtract the
    * (capacity+1)-st largest count from every counter and drop the
    * non-positive ones — the summed buffer error bounds add, keeping
    * true - cnt <= N/(capacity+1) for the merged whole. */
  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > capacity) {
      val kth = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - kth)
      buf.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // tie-break equal counts by UTF8String (binary / UTF-8) order, the
    // collation DuckDB oracles sort by — java.lang.String would compare
    // UTF-16 code units and diverge on supplementary-plane terms
    val sorted = buf.toArray
      .map { case (t, c) => (UTF8String.fromString(t), c) }
      .sortWith { case ((t1, c1), (t2, c2)) =>
        c1 > c2 || (c1 == c2 && t1.compareTo(t2) < 0)
      }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      // length-prefixed UTF-8 (not writeUTF, whose 16-bit length field
      // throws on terms over 65535 encoded bytes)
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) =
        in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FrequentItemsAgg =
    copy(child = newLeft, capacityExpr = newRight)
}

object FrequentItemsAgg {
  /** SQL builder: graft_frequent_items(term, capacity). */
  def fromExprs(exprs: Seq[Expression]): FrequentItemsAgg = {
    require(exprs.length == 2,
      "graft_frequent_items(term, capacity) takes 2 arguments")
    FrequentItemsAgg(exprs.head, exprs(1))
  }
}
