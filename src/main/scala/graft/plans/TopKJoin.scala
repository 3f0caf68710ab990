package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Whole-operator Catalyst extension (SURVEY.md §7.4 path (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`): a cosine top-k join
  * that never materializes the scored cross product.
  *
  * The standard formulation (cross join → window rank) writes
  * |corpus|×|queries| scored rows before the rank limit prunes them;
  * Spark's WindowGroupLimit prunes per partition but still materializes
  * and sorts each partition's scores. This operator instead keeps a
  * bounded top-k buffer per query inside each corpus partition and emits
  * only k·|queries| rows per partition. A final exact rank over that
  * reduced set (done by the caller) yields results identical to the
  * brute-force plan — same left-to-right dot-product fold, same
  * (sim DESC, c_id ASC) comparator — so the DuckDB oracle is unchanged.
  *
  * Children contract: corpus rows are (c_id BIGINT, embedding
  * ARRAY<FLOAT>, nrm DOUBLE); queries likewise (q_id, embedding, nrm).
  * The query side is collected + broadcast (the small side by
  * construction).
  */
case class CosineTopKJoin(corpus: LogicalPlan, queries: LogicalPlan, k: Int,
    override val output: Seq[Attribute] = CosineTopKJoin.freshOutput())
    extends BinaryNode {
  // output is a constructor param (not a val recomputed per instance) so
  // expression IDs survive the optimizer's copy()s — fresh IDs per copy
  // would orphan downstream references

  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = queries

  // these attributes ORIGINATE here (they are not child passthroughs);
  // without this CheckAnalysis rejects the plan as missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): LogicalPlan =
    copy(corpus = newLeft, queries = newRight)
}

object CosineTopKJoin {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("q_id", LongType, nullable = false)(),
    AttributeReference("c_id", LongType, nullable = false)(),
    AttributeReference("cos_sim", DoubleType, nullable = false)())
}

case class CosineTopKJoinExec(corpus: SparkPlan, queries: SparkPlan, k: Int,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  override def left: SparkPlan = corpus
  override def right: SparkPlan = queries

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): SparkPlan =
    copy(corpus = newLeft, queries = newRight)

  /** strictly-better under (sim DESC, c_id ASC) — the exact comparator
    * the final rank and the oracle use. */
  @inline private def better(s1: Double, id1: Long, s2: Double,
      id2: Long): Boolean =
    s1 > s2 || (s1 == s2 && id1 < id2)

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val qCollected = queries.executeCollect().map { r =>
      (r.getLong(0), r.getArray(1).toFloatArray(), r.getDouble(2))
    }
    val bc = sparkContext.broadcast(qCollected)
    val types = output.map(_.dataType).toArray
    corpus.execute().mapPartitions { it =>
      val qs = bc.value
      val nq = qs.length
      // per-query bounded buffers kept sorted best-first (k is small)
      val sims = Array.fill(nq)(new Array[Double](kk))
      val ids = Array.fill(nq)(new Array[Long](kk))
      val sizes = new Array[Int](nq)
      while (it.hasNext) {
        val row = it.next()
        val cid = row.getLong(0)
        val emb = row.getArray(1).toFloatArray()
        val nrm = row.getDouble(2)
        var qi = 0
        while (qi < nq) {
          val q = qs(qi)
          val qe = q._2
          // dimensions must agree — a silent min-length truncation would
          // produce a plausible-but-wrong similarity for a malformed row
          if (emb.length != qe.length)
            throw new IllegalArgumentException(
              s"CosineTopKJoin: embedding dim mismatch (corpus id=$cid " +
                s"has ${emb.length}, query id=${q._1} has ${qe.length})")
          var acc = 0.0
          var i = 0
          val n = emb.length
          while (i < n) { acc += emb(i).toDouble * qe(i).toDouble; i += 1 }
          val sim = acc / (q._3 * nrm)
          // a zero-norm vector yields NaN similarity: exclude it EXPLICITLY
          // (cosine is undefined there). Note the window-rank formulation
          // would sort NaN first — callers must filter zero norms upstream
          // if they need the two plans interchangeable on such data.
          val sz = sizes(qi)
          if (sim == sim &&
            (sz < kk || better(sim, cid, sims(qi)(sz - 1), ids(qi)(sz - 1)))) {
            var pos = if (sz < kk) sz else kk - 1
            // bubble the candidate up to its sorted position
            while (pos > 0 && better(sim, cid, sims(qi)(pos - 1),
                ids(qi)(pos - 1))) {
              sims(qi)(pos) = sims(qi)(pos - 1)
              ids(qi)(pos) = ids(qi)(pos - 1)
              pos -= 1
            }
            sims(qi)(pos) = sim
            ids(qi)(pos) = cid
            if (sz < kk) sizes(qi) = sz + 1
          }
          qi += 1
        }
      }
      val proj = UnsafeProjection.create(types)
      val outRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      (0 until nq).iterator.flatMap { qi =>
        (0 until sizes(qi)).iterator.map { r =>
          outRow.update(0, qs(qi)._1)
          outRow.update(1, ids(qi)(r))
          outRow.update(2, sims(qi)(r))
          proj(outRow).copy(): InternalRow
        }
      }
    }
  }
}

/** Planner strategy mapping the logical node to its physical operator. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ CosineTopKJoin(c, q, k, _) =>
      CosineTopKJoinExec(planLater(c), planLater(q), k, j.output) :: Nil
    case _ => Nil
  }
}
