package graft.plans

import java.nio.ByteBuffer

import org.roaringbitmap.RoaringBitmap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact distinct counting over integer keys via compressed bitmaps
  * (RoaringBitmap, Chambi et al., "Better bitmap performance with Roaring
  * bitmaps", SPE 2016 — the library Spark itself uses for shuffle-block
  * tracking, so it ships on every executor classpath).
  *
  * Why this exists next to COUNT(DISTINCT) and the KMV/HLL sketches
  * (SURVEY §2.4): COUNT(DISTINCT) is exact but not mergeable — Spark
  * expands it to a two-shuffle distinct+aggregate, and a precomputed
  * per-day count can never be combined into a month. An HLL sketch is
  * mergeable but approximate. A bitmap over the key space is BOTH: union
  * is exact, associative and commutative, and a billion-key bitmap
  * compresses to a few MB of runs. That makes it the production pattern
  * for incremental exact distinct at 100 TB: build one bitmap per
  * (group × ingest partition) ONCE, store it, and answer any
  * distinct-count over any partition range with a cheap OR — no rescan
  * of the fact data.
  *
  * Three aggregates share the [[RoaringBitmap]] buffer:
  *  - `graft_bitmap_distinct(key)`  → BIGINT exact distinct (one level);
  *  - `graft_bitmap_build(key)`     → BINARY serialized partial bitmap;
  *  - `graft_bitmap_union_count(b)` → BIGINT cardinality of the OR of
  *    serialized partials (the re-aggregation level).
  *
  * Input contract: an integral key that fits in 32 bits (harness keys
  * do; the full-BIGINT family in [[Bitmap64Sketch]] swaps in
  * Roaring64Bitmap, same shape). Out-of-range keys fail loudly rather
  * than alias. Nulls are
  * ignored, matching COUNT(DISTINCT col).
  *
  * Reference scope: Trino ships the same idea as its qdigest/setdigest
  * types; the reference demo (reference/local_demo_setup/
  * localTrinoTest.ipynb) runs plain distinct aggregation over the
  * federated tables — this is the scale path for those same answers.
  */
abstract class BitmapAggBase
  extends TypedImperativeAggregate[RoaringBitmap]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  override def merge(buf: RoaringBitmap, other: RoaringBitmap): RoaringBitmap = {
    buf.or(other)
    buf
  }

  override def serialize(buf: RoaringBitmap): Array[Byte] = {
    buf.runOptimize()
    val bb = ByteBuffer.allocate(buf.serializedSizeInBytes())
    buf.serialize(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(ByteBuffer.wrap(bytes))
    bm
  }

  protected def addKey(buf: RoaringBitmap, v: Any): Unit = v match {
    case i: java.lang.Integer => buf.add(i.intValue())
    case l: java.lang.Long    => buf.add(Math.toIntExact(l.longValue()))
    case s: java.lang.Short   => buf.add(s.intValue())
    case b: java.lang.Byte    => buf.add(b.intValue())
    case other => throw new IllegalArgumentException(
      s"graft bitmap aggregates take an integral key, got $other")
  }
}

/** `graft_bitmap_distinct(key)` — single-level exact distinct count. */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BitmapAggBase {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"

  override def update(buf: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) addKey(buf, v)
    buf
  }

  override def eval(buf: RoaringBitmap): Any = buf.getLongCardinality

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : BitmapDistinct = copy(child = newChild)
}

/** `graft_bitmap_build(key)` — emit the serialized partial bitmap, to be
  * stored (e.g. one per day) and later OR-merged by
  * [[BitmapUnionCount]]. */
case class BitmapBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BitmapAggBase {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_build"

  override def update(buf: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) addKey(buf, v)
    buf
  }

  override def eval(buf: RoaringBitmap): Any = serialize(buf)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : BitmapBuild = copy(child = newChild)
}

/** `graft_bitmap_union_count(bm)` — OR serialized partial bitmaps and
  * return the exact cardinality of the union. */
case class BitmapUnionCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BitmapAggBase {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_union_count"

  override def update(buf: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) buf.or(deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def eval(buf: RoaringBitmap): Any = buf.getLongCardinality

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : BitmapUnionCount = copy(child = newChild)
}
