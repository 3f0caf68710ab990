package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Fixed-bucket histogram quantile sketch as a second custom
  * TypedImperativeAggregate (alongside [[KmvDistinct]]): equi-width bucket
  * counts over a caller-declared [lo, hi) range, with the quantile read
  * off the cumulative histogram by linear interpolation inside the
  * containing bucket — the classic mergeable-histogram approach of
  * Ben-Haim & Tom-Tov, "A streaming parallel decision tree algorithm"
  * (JMLR 11, 2010), restricted to FIXED bucket boundaries.
  *
  * Why fixed boundaries instead of the adaptive centroids of t-digest /
  * KLL: adaptive sketches are merge-order dependent, so two runs of the
  * same query on a cluster can disagree. With fixed buckets the buffer is
  * a plain count vector — merge is element-wise addition (commutative,
  * associative), so the result is bit-identical regardless of partitioning
  * AND exactly reproducible by the DuckDB oracle in SQL (GROUP BY bucket +
  * window cumsum + the same interpolation). At 100 TB a grouped quantile
  * shuffles `buckets`·8 bytes per group instead of every value — the same
  * partial/merge/final contract as any built-in aggregate.
  *
  * Semantics: values are clamped into [0, buckets-1] (outliers land in the
  * edge buckets — callers pick bounds wide enough that this is the tail).
  * Quantile q reads target rank t = q·N; the estimate is
  * `lo + w·(bi + (t − cumBefore)/count_bi)` for the first non-empty bucket
  * whose cumulative count reaches t. NULL input rows are skipped; an
  * empty group yields NULL.
  */
case class HistQuantile(
    child: Expression,
    lo: Double,
    hi: Double,
    buckets: Int,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(buckets > 0 && hi > lo && q >= 0.0 && q <= 1.0,
    s"graft_hist_quantile: need buckets>0, hi>lo, 0<=q<=1 " +
      s"(got lo=$lo hi=$hi buckets=$buckets q=$q)")

  private val w = (hi - lo) / buckets

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hist_quantile"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      var bi = math.floor((x - lo) / w).toInt
      if (bi < 0) bi = 0
      if (bi > buckets - 1) bi = buckets - 1
      buf(bi) += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < buckets) { n += buf(i); i += 1 }
    if (n == 0L) return null
    val target = q * n
    var cum = 0L
    i = 0
    while (i < buckets) {
      val c = buf(i)
      if (c > 0 && cum + c >= target) {
        // same expression shape as the oracle SQL — do not refactor the
        // arithmetic (double evaluation order is part of the contract)
        return lo + w * (i + (target - cum) / c)
      }
      cum += c
      i += 1
    }
    // q=1 with target exactly N lands here only via rounding; the last
    // non-empty bucket's upper edge is the right answer
    i = buckets - 1
    while (buf(i) == 0L) i -= 1
    lo + w * (i + 1)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buckets)
    var i = 0
    while (i < buckets) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](buckets)
    var i = 0
    while (i < buckets) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantile =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantile =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : HistQuantile = copy(child = newChild)
}

object HistQuantile {
  /** SQL builder: graft_hist_quantile(x, lo, hi, buckets, q) — the four
    * parameters must be foldable literals. */
  def fromExprs(exprs: Seq[Expression]): HistQuantile = {
    require(exprs.length == 5,
      "graft_hist_quantile(x, lo, hi, buckets, q) takes 5 arguments")
    def num(e: Expression, what: String): Double = {
      require(e.foldable, s"graft_hist_quantile: $what must be a literal")
      e.eval() match {
        case d: java.lang.Double => d
        case i: java.lang.Integer => i.toDouble
        case l: java.lang.Long => l.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other =>
          throw new IllegalArgumentException(
            s"graft_hist_quantile: $what must be numeric, got $other")
      }
    }
    HistQuantile(exprs.head, num(exprs(1), "lo"), num(exprs(2), "hi"),
      num(exprs(3), "buckets").toInt, num(exprs(4), "q"))
  }
}
