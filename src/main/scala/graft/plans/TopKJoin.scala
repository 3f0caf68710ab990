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
  * ordering — INCLUDING the edge cases of the window formulation
  * (graft_dot ÷ norms under sim DESC NULLS LAST, c_id ASC):
  *   - NaN similarity (NaN embedding elements; zero norms when ANSI is
  *     off): Spark's double ordering treats NaN as the LARGEST value, so
  *     NaN candidates rank FIRST; the buffer comparator uses
  *     java.lang.Double.compare to match.
  *   - zero norm product under ANSI (the session default): ANSI Divide
  *     throws DIVIDE_BY_ZERO, so this operator throws too rather than
  *     silently differing from the plan it replaces.
  *   - NULL similarity (embedding-dimension mismatch, NULL embedding /
  *     norm, NULL array element — exactly when graft_dot yields NULL):
  *     ranked LAST (NULLS LAST); the buffer retains them only while
  *     fewer than k non-null candidates exist, like the window plan.
  *   - -0.0 is normalized to 0.0 before comparison (UnsafeRow writers do
  *     the same to the window plan's sort keys).
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

  // The node consumes EVERY child column even though it holds no
  // expressions over them. The default references (expression-derived)
  // would be empty, and ColumnPruning then plants `Project []` under
  // both children — the exec would read zero-field UnsafeRows
  // (baseObject=null) and SIGSEGV the JVM on the first getLong. This
  // was the round-3/4 `sbt test` crash: only plans with a sub-output
  // Project ABOVE the node (e.g. select("c_id","cos_sim")) triggered
  // pruning, which is why Verify (rewrite injected after the pruning
  // batch) and the all-column tests never hit it.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      corpus.output ++ queries.output)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): LogicalPlan =
    copy(corpus = newLeft, queries = newRight)
}

object CosineTopKJoin {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("q_id", LongType, nullable = false)(),
    AttributeReference("c_id", LongType, nullable = false)(),
    // cos_sim is nullable: a dim-mismatched or NULL-carrying pair scores
    // NULL (graft_dot parity), ranked last by the caller's NULLS LAST rank
    AttributeReference("cos_sim", DoubleType, nullable = true)())
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

  /** Fail fast (a clear exception, not a segfault) if a child does not
    * carry the documented (id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE)
    * shape — e.g. if an optimizer rule ever again prunes or reorders the
    * child columns out from under the raw field reads below. */
  private def requireChildShape(side: String, p: SparkPlan): Unit = {
    val t = p.output.map(_.dataType)
    // containsNull is intentionally not pinned: the parquet-scan corpus
    // reports ARRAY<FLOAT> with nullable elements while the typed media
    // pipeline's encoder derives containsNull=false for Array[Float] —
    // both are valid inputs (the row reads handle either)
    val embOk = t.length == 3 && (t(1) match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    require(t.length == 3 && t(0) == LongType && embOk && t(2) == DoubleType,
      s"CosineTopKJoinExec $side child must be (id BIGINT, " +
        s"embedding ARRAY<FLOAT>, nrm DOUBLE); got ${p.output.map(a =>
          s"${a.name}: ${a.dataType.simpleString}").mkString("[", ", ", "]")}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    requireChildShape("corpus", corpus)
    requireChildShape("queries", queries)
    val kk = k
    // pinned from the plan's own session, not the calling thread's
    // SQLConf.get — a cached RDD re-materialized from another session
    // must keep the semantics it was planned with
    val ansi = session.sessionState.conf.ansiEnabled
    import CosineTopKJoinExec.better
    // (q_id, embedding, norm, isNull) — isNull when the query row itself
    // can never score (NULL embedding/norm or NULL array element), the
    // same conditions under which graft_dot yields NULL
    val qCollected = queries.executeCollect().map { r =>
      var qnull = r.isNullAt(1) || r.isNullAt(2)
      var qe: Array[Float] = null
      if (!qnull) {
        val a = r.getArray(1)
        val n = a.numElements()
        qe = new Array[Float](n)
        var i = 0
        while (i < n && !qnull) {
          if (a.isNullAt(i)) qnull = true else qe(i) = a.getFloat(i)
          i += 1
        }
      }
      (r.getLong(0), qe, if (qnull) 0.0 else r.getDouble(2), qnull)
    }
    val bc = sparkContext.broadcast(qCollected)
    val types = output.map(_.dataType).toArray
    corpus.execute().mapPartitions { it =>
      val qs = bc.value
      val nq = qs.length
      // per-query bounded buffers kept sorted best-first (k is small)
      val sims = Array.fill(nq)(new Array[Double](kk))
      val ids = Array.fill(nq)(new Array[Long](kk))
      val nulls = Array.fill(nq)(new Array[Boolean](kk))
      val sizes = new Array[Int](nq)
      while (it.hasNext) {
        val row = it.next()
        val cid = row.getLong(0)
        val cNull = row.isNullAt(1) || row.isNullAt(2)
        val arr = if (cNull) null else row.getArray(1)
        val nrm = if (cNull) 0.0 else row.getDouble(2)
        var qi = 0
        while (qi < nq) {
          val q = qs(qi)
          val qe = q._2
          var isNull = cNull || q._4
          var sim = 0.0
          if (!isNull) {
            val n = arr.numElements()
            if (n != qe.length) {
              // dim mismatch scores NULL — graft_dot parity; the final
              // NULLS LAST rank surfaces it only when a query has fewer
              // than k well-formed candidates
              isNull = true
            } else {
              var acc = 0.0
              var i = 0
              while (i < n && !isNull) {
                if (arr.isNullAt(i)) isNull = true
                else acc += arr.getFloat(i).toDouble * qe(i).toDouble
                i += 1
              }
              if (!isNull) {
                val div = q._3 * nrm
                if (div == 0.0) {
                  // Spark's Divide on a zero divisor throws under ANSI
                  // and yields NULL otherwise (never IEEE Inf/NaN) —
                  // mirror both so the window plan this operator
                  // replaces stays result-identical in either mode
                  if (ansi) throw new ArithmeticException(
                    "[DIVIDE_BY_ZERO] Division by zero: cosine norm " +
                      "product is 0 — identical to the ANSI window plan " +
                      "this operator replaces (set spark.sql.ansi." +
                      "enabled=false for NULL-on-zero semantics)")
                  isNull = true
                } else {
                  // + 0.0 normalizes -0.0 (as UnsafeRow writers would);
                  // NaN inputs keep NaN and rank FIRST via the comparator
                  sim = acc / div + 0.0
                }
              }
            }
          }
          val sz = sizes(qi)
          if (sz < kk || better(isNull, sim, cid,
              nulls(qi)(sz - 1), sims(qi)(sz - 1), ids(qi)(sz - 1))) {
            var pos = if (sz < kk) sz else kk - 1
            // bubble the candidate up to its sorted position
            while (pos > 0 && better(isNull, sim, cid, nulls(qi)(pos - 1),
                sims(qi)(pos - 1), ids(qi)(pos - 1))) {
              sims(qi)(pos) = sims(qi)(pos - 1)
              ids(qi)(pos) = ids(qi)(pos - 1)
              nulls(qi)(pos) = nulls(qi)(pos - 1)
              pos -= 1
            }
            sims(qi)(pos) = sim
            ids(qi)(pos) = cid
            nulls(qi)(pos) = isNull
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
          outRow.update(2, if (nulls(qi)(r)) null else sims(qi)(r))
          proj(outRow).copy(): InternalRow
        }
      }
    }
  }
}

object CosineTopKJoinExec {
  /** strictly-better under (sim DESC NULLS LAST, c_id ASC) — the exact
    * ordering the final rank and the oracle use. Non-null beats null;
    * among non-nulls, java.lang.Double.compare matches Spark's double
    * ordering (NaN largest → ranks first under DESC). Lives on the
    * companion, NOT the exec: an instance method would make the
    * mapPartitions closure capture `this` and serialize the whole exec
    * node (child SparkPlans included) into every task — the reason
    * Spark's own execs copy fields to locals before closing over them. */
  @inline private[plans] def better(n1: Boolean, s1: Double, id1: Long,
      n2: Boolean, s2: Double, id2: Long): Boolean = {
    if (n1 != n2) n2
    else {
      val c = if (n1) 0 else java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && id1 < id2)
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
