package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.roaringbitmap.longlong.Roaring64Bitmap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** 64-bit twin of [[BitmapAggBase]] (graft.plans.BitmapSketch): exact,
  * mergeable distinct over the FULL BIGINT key space via
  * [[Roaring64Bitmap]] — the ART-based (adaptive radix trie over
  * 48-bit prefixes → 16-bit Roaring leaves) 64-bit implementation from
  * the RoaringBitmap longlong package, which ships inside Spark's own
  * RoaringBitmap dependency (Chambi et al., SPE 2016).
  *
  * Deliberately NOT `Roaring64NavigableMap`: under this exact
  * deserialize→or merge sequence (the TypedImperativeAggregate partial
  * path), 1.3.0's NavigableMap variant returns a stale cached
  * cardinality after `or` across sign-boundary buckets — reproduced
  * during round 9 (merge of {MIN_VALUE,-1,0} with {1} reported
  * cardinality 3 until a serialize round-trip rebuilt the cache). The
  * ART variant is exact under a 200k-key mixed-sign serialize+merge
  * fuzz against a HashSet truth set (Bitmap64Spec pins the same
  * contract in-plan).
  *
  * Why a twin rather than a replacement: the 32-bit family's containers
  * are ~2× denser for keys that fit (harness ids do), so it remains the
  * right choice when the key domain is provably narrow; this family is
  * the 100 TB default, where user/event id spaces routinely exceed 2³¹
  * and `Math.toIntExact` in the 32-bit path fails loudly by design.
  * Same three-aggregate shape:
  *  - `graft_bitmap_distinct64(key)`   → BIGINT exact distinct;
  *  - `graft_bitmap_build64(key)`      → BINARY serialized partial;
  *  - `graft_bitmap_union_count64(bm)` → BIGINT cardinality of the OR
  *    of serialized partials (re-aggregation level, no fact rescan).
  *
  * Nulls are ignored (COUNT(DISTINCT) semantics). Any integral input
  * widens losslessly to long — there is no out-of-range case.
  *
  * Reference scope: the reference demo's distinct workloads
  * (reference/local_demo_setup/localTrinoTest.ipynb:1184,1475) run over
  * id columns; this family keeps those answers exact AND incremental at
  * id cardinalities beyond the 32-bit family's contract.
  */
abstract class Bitmap64AggBase
  extends TypedImperativeAggregate[Roaring64Bitmap]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Roaring64Bitmap =
    new Roaring64Bitmap()

  override def merge(buf: Roaring64Bitmap,
      other: Roaring64Bitmap): Roaring64Bitmap = {
    buf.or(other)
    buf
  }

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = {
    buf.runOptimize()
    val bos = new ByteArrayOutputStream()
    buf.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  protected def addKey(buf: Roaring64Bitmap, v: Any): Unit = v match {
    case l: java.lang.Long    => buf.addLong(l.longValue())
    case i: java.lang.Integer => buf.addLong(i.longValue())
    case s: java.lang.Short   => buf.addLong(s.longValue())
    case b: java.lang.Byte    => buf.addLong(b.longValue())
    case other => throw new IllegalArgumentException(
      s"graft bitmap64 aggregates take an integral key, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (inputTypeOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expected ${expectedInputSql}, got " +
          child.dataType.sql)

  protected def inputTypeOk: Boolean =
    Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(child.dataType)
  protected def expectedInputSql: String = "an integral key"
}

/** `graft_bitmap_distinct64(key)` — single-level exact distinct count
  * over 64-bit keys. */
case class Bitmap64Distinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Bitmap64AggBase {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct64"

  override def update(buf: Roaring64Bitmap,
      input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) addKey(buf, v)
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = buf.getLongCardinality

  override def withNewMutableAggBufferOffset(newOffset: Int): Bitmap64Distinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Bitmap64Distinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : Bitmap64Distinct = copy(child = newChild)
}

/** `graft_bitmap_build64(key)` — emit the serialized partial 64-bit
  * bitmap for storage (e.g. one per ingest partition), later OR-merged
  * by [[Bitmap64UnionCount]]. */
case class Bitmap64Build(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Bitmap64AggBase {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_build64"

  override def update(buf: Roaring64Bitmap,
      input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) addKey(buf, v)
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = serialize(buf)

  override def withNewMutableAggBufferOffset(newOffset: Int): Bitmap64Build =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Bitmap64Build =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : Bitmap64Build = copy(child = newChild)
}

/** `graft_bitmap64_and_count(a, b)` — exact cardinality of the
  * INTERSECTION of two serialized 64-bit partial bitmaps (Trino's
  * `intersection_cardinality(setdigest, setdigest)` analog, exact
  * instead of sketched): the audience-overlap primitive. With
  * per-segment bitmaps persisted once ([[Bitmap64Build]]), every
  * pairwise overlap is a few-MB bitmap AND — the fact table is never
  * rescanned or reshuffled, and the O(segments²) pair matrix costs
  * segments², not rows². NULL if either side is NULL. */
case class Bitmap64AndCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap64_and_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes two BINARY serialized bitmaps from " +
          s"graft_bitmap_build64, got ${left.dataType.sql}, " +
          right.dataType.sql)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64AndCount.andCount(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.Bitmap64AndCount.andCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Bitmap64AndCount =
    copy(left = newLeft, right = newRight)
}

object Bitmap64AndCount {
  /** Static kernel shared by interpreted eval and generated code. */
  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    def de(bytes: Array[Byte]): Roaring64Bitmap = {
      val bm = new Roaring64Bitmap()
      bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
      bm
    }
    val bm = de(a)
    bm.and(de(b))
    bm.getLongCardinality
  }
}

/** `graft_bitmap64_andnot_count(a, b)` — exact |A \ B| over two
  * serialized 64-bit partials: the CHURN direction of the set algebra
  * ([[Bitmap64AndCount]] is retention's AND; this is "in yesterday's
  * bitmap but not today's"). Same few-MB-operands posture: with
  * per-day bitmaps persisted, every day-over-day churn/new/retained
  * decomposition is three bitmap ops, no fact rescan. NULL if either
  * side is NULL. */
case class Bitmap64AndNotCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap64_andnot_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes two BINARY serialized bitmaps from " +
          s"graft_bitmap_build64, got ${left.dataType.sql}, " +
          right.dataType.sql)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64AndNotCount.andNotCount(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.Bitmap64AndNotCount.andNotCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Bitmap64AndNotCount =
    copy(left = newLeft, right = newRight)
}

object Bitmap64AndNotCount {
  /** Static kernel shared by interpreted eval and generated code. */
  def andNotCount(a: Array[Byte], b: Array[Byte]): Long = {
    def de(bytes: Array[Byte]): Roaring64Bitmap = {
      val bm = new Roaring64Bitmap()
      bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
      bm
    }
    val bm = de(a)
    bm.andNot(de(b))
    bm.getLongCardinality
  }
}

/** `graft_bitmap_union_count64(bm)` — OR serialized 64-bit partials and
  * return the exact cardinality of the union. */
case class Bitmap64UnionCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Bitmap64AggBase {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_union_count64"

  override protected def inputTypeOk: Boolean = child.dataType == BinaryType
  override protected def expectedInputSql: String =
    "a BINARY serialized partial from graft_bitmap_build64"

  override def update(buf: Roaring64Bitmap,
      input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.or(deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = buf.getLongCardinality

  override def withNewMutableAggBufferOffset(newOffset: Int): Bitmap64UnionCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Bitmap64UnionCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : Bitmap64UnionCount = copy(child = newChild)
}
