package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

/** Optimizer rule (SURVEY §7.4: Rule[LogicalPlan] path): rewrite
  * "keep the first-ranked row per key" —
  *
  *   Filter(rn = 1, Window(rn ← row_number() OVER
  *     (PARTITION BY k ORDER BY o1 DESC, ..., on DESC), child))
  *
  * — into a max_by aggregation over a struct of the child's columns keyed
  * by a struct of the (all-descending) sort keys.
  *
  * Why it matters at scale: the window form shuffles and sorts EVERY row
  * of every key (WindowGroupLimit trims but still sorts within partitions
  * and shuffles one row per key per partition... as does the aggregate —
  * but the aggregate needs no sort at all and uses the hash-aggregate
  * partial/final machinery, so the per-partition state is one row per
  * key, unsorted). This is the dedup-latest-by-key semantics the
  * reference's pipeline relies on (SURVEY §2.4).
  *
  * Scoped conservatively: single row_number window expression, filter
  * exactly rn = 1 (or rn <= 1), non-empty partition keys that are plain
  * attributes, ALL sort directions descending (max_by's struct ordering
  * then matches row_number's), and a deterministic total order is the
  * caller's responsibility exactly as it is for the window form. Struct
  * comparison treats nulls as smallest, matching DESC NULLS LAST.
  */
object RewriteRankOneToMaxBy extends Rule[LogicalPlan] {

  private def isOne(e: Expression): Boolean = e match {
    case Literal(1, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      val rewritten = for {
        rnAttr <- cond match {
          case EqualTo(a: Attribute, l) if isOne(l) => Some(a)
          case LessThanOrEqual(a: Attribute, l) if isOne(l) => Some(a)
          case _ => None
        }
        alias <- w.windowExpressions match {
          case Seq(a @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _, _)), _))
            if a.exprId == rnAttr.exprId => Some(a)
          case _ => None
        }
        spec = alias.child.asInstanceOf[WindowExpression].windowSpec
        if spec.partitionSpec.nonEmpty &&
          spec.partitionSpec.forall(_.isInstanceOf[Attribute]) &&
          spec.orderSpec.nonEmpty &&
          spec.orderSpec.forall(_.direction == Descending) &&
          // struct comparison in max_by treats nulls as smallest — that is
          // DESC NULLS LAST. An explicit DESC NULLS FIRST window would pick
          // a different row when sort keys contain nulls, so leave it alone.
          spec.orderSpec.forall(_.nullOrdering == NullsLast) &&
          spec.orderSpec.forall(_.child.deterministic)
      } yield {
        val child = w.child
        val valueStruct = CreateStruct(child.output)
        val keyStruct = CreateStruct(spec.orderSpec.map(_.child))
        val aggAlias = Alias(
          MaxBy(valueStruct, keyStruct).toAggregateExpression(), "__graft_top")()
        val groupAttrs = spec.partitionSpec.map(_.asInstanceOf[Attribute])
        val agg = Aggregate(groupAttrs,
          (groupAttrs: Seq[NamedExpression]) :+ aggAlias, child)
        // restore the original output attributes (same exprIds) so the
        // rest of the plan is untouched; rn collapses to the literal 1
        val structRef = aggAlias.toAttribute
        val restored: Seq[NamedExpression] =
          child.output.zipWithIndex.map { case (a, i) =>
            Alias(GetStructField(structRef, i, Some(a.name)), a.name)(
              exprId = a.exprId)
          } :+ Alias(Literal(1), rnAttr.name)(exprId = rnAttr.exprId)
        Project(restored, agg)
      }
      rewritten.getOrElse(f)
  }
}

/** Optimizer rule (SURVEY §7.4: the declarative-to-custom-operator path):
  * recognize the brute-force cosine top-k pattern —
  *
  *   Filter(rank <= k, Window(rank ← row_number() OVER
  *     (PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC),
  *     Project(q_id, c_id, cos_sim ← graft_dot(e1,e2)/(n1*n2),
  *       Join(corpus, queries, cross/inner, no condition))))
  *
  * — and replace the join+project under the Window with the bounded
  * `CosineTopKJoin` partial top-k (graft.plans.TopKJoin). The Window+Filter
  * stay on top as the exact final rank over the k·partitions survivors, so
  * results are identical to the brute-force plan (same fold, same
  * comparator) while the |corpus|×|queries| scored cross product is never
  * materialized. Identity extends to the edge cases: the operator ranks
  * NaN similarities first and NULL-scoring pairs (dim mismatch, NULL
  * embedding/norm/element) last, exactly as the window plan orders
  * graft_dot's output under sim DESC NULLS LAST (see TopKJoin scaladoc). Users write the declarative form; the engine picks the
  * operator — the same contract Catalyst applies to its own joins.
  *
  * Guards are strict: exact (sim DESC NULLS LAST, id ASC NULLS FIRST)
  * order, BIGINT ids, ARRAY<FLOAT> embeddings, DOUBLE norms, each side
  * supplying exactly one of (id, embedding, norm). Anything else keeps the
  * window plan (which InferWindowGroupLimit still stages into partial
  * top-k).
  */
object RewriteCosineTopK extends Rule[LogicalPlan] {

  /** (rank attribute, k) from `rank <= k` / `rank < k+1` / `rank = 1`,
    * looking through the LONG cast users add for oracle dtype parity. */
  private def rankBound(cond: Expression): Option[(Attribute, Int)] = {
    def attr(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case Cast(a: Attribute, LongType, _, _) => Some(a)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(e, Literal(k: Int, IntegerType)) =>
        attr(e).map((_, k))
      case LessThanOrEqual(e, Literal(k: Long, LongType)) =>
        attr(e).map((_, k.toInt))
      case LessThan(e, Literal(k: Int, IntegerType)) => attr(e).map((_, k - 1))
      case LessThan(e, Literal(k: Long, LongType)) =>
        attr(e).map((_, k.toInt - 1))
      case EqualTo(e, Literal(1, IntegerType)) => attr(e).map((_, 1))
      case EqualTo(e, Literal(1L, LongType)) => attr(e).map((_, 1))
      case _ => None
    }
  }

  private def isLong(a: Attribute) = a.dataType == LongType
  private def isFloatArr(a: Attribute) = a.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def isDouble(a: Attribute) = a.dataType == DoubleType

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w @ Window(
        Seq(al @ Alias(WindowExpression(RowNumber(), spec), _)),
        _, _, Project(projList, Join(jl, jr, Inner | Cross, None, _)), _)) =>
      val rewritten = for {
        (rnAttr, k) <- rankBound(cond)
        if k >= 1 && rnAttr.exprId == al.exprId
        qId <- spec.partitionSpec match {
          case Seq(a: Attribute) if isLong(a) => Some(a)
          case _ => None
        }
        (simAttr, cId) <- spec.orderSpec match {
          case Seq(SortOrder(s: Attribute, Descending, NullsLast, _),
                   SortOrder(c: Attribute, Ascending, NullsFirst, _))
            if isDouble(s) && isLong(c) => Some((s, c))
          case _ => None
        }
        // the projection must be exactly (q_id, c_id, cos_sim) IN THAT
        // ORDER — the physical operator emits columns in that order, and
        // Window.output = child.output ++ rank must be unchanged
        if projList.map(_.toAttribute.exprId) ==
          Seq(qId.exprId, cId.exprId, simAttr.exprId)
        simDef <- projList.collectFirst {
          case a @ Alias(Divide(DotProduct(e1: Attribute, e2: Attribute),
              Multiply(n1: Attribute, n2: Attribute, _), _), _)
            if a.exprId == simAttr.exprId => (e1, e2, n1, n2)
        }
        (e1, e2, n1, n2) = simDef
        if Seq(e1, e2).forall(isFloatArr) && Seq(n1, n2).forall(isDouble)
        // split the four inputs by join side; q_id's side is the
        // (broadcast) query side, the other streams as the corpus
        qSide = if (jl.outputSet.contains(qId)) jl else jr
        cSide = if (jl.outputSet.contains(qId)) jr else jl
        if qSide.outputSet.contains(qId) && cSide.outputSet.contains(cId)
        qEmb <- Seq(e1, e2).find(qSide.outputSet.contains)
        cEmb <- Seq(e1, e2).find(cSide.outputSet.contains)
        qNrm <- Seq(n1, n2).find(qSide.outputSet.contains)
        cNrm <- Seq(n1, n2).find(cSide.outputSet.contains)
        if qEmb.exprId != cEmb.exprId && qNrm.exprId != cNrm.exprId
      } yield {
        val topk = CosineTopKJoin(
          Project(Seq(cId, cEmb, cNrm), cSide),
          Project(Seq(qId, qEmb, qNrm), qSide),
          k,
          // reuse the ORIGINAL attributes (same exprIds) so the Window,
          // Filter, and everything above resolve unchanged
          output = Seq(qId, cId, simAttr))
        f.copy(child = w.copy(child = topk))
      }
      rewritten.getOrElse(f)
  }
}

/** DETERMINISTIC TABLESAMPLE (reference surface: Trino's
  * `TABLESAMPLE BERNOULLI(p)` / `TABLESAMPLE SYSTEM(p)`, SQL-92
  * sampled scans): [[graft.sources.LakeViewSql.rewriteTablesample]]
  * lowers the Trino syntax to Spark `Sample` nodes stamped with the
  * OUT-OF-BAND [[graft.sources.LakeViewSql.TrinoSampleTag]] (r16
  * overloaded two fixed REPEATABLE seed values, making a user's
  * genuine `REPEATABLE (60477001)` indistinguishable from the
  * marker); this rule — running at ANALYZER POST-HOC time, because
  * tags survive analysis's makeCopy but not the optimizer's
  * case-class copy() in ColumnPruning — replaces tagged nodes with
  * the deterministic hash-based forms a data pipeline can reproduce
  * across runs,
  * engines and cluster sizes (rand()-seeded Sample cannot: its
  * outcome depends on partition layout):
  *
  *  - BERNOULLI(p): per-ROW sampling — `Filter(graft_hex60('tsmp_' ||
  *    key) % 1e6 < p·1e4)` on the relation's declared integral key,
  *    the exact portable-hash discipline of the corpus_sample_*
  *    kernels. Row semantics, full scan (as Trino documents for
  *    BERNOULLI). The key is the lake table's plain shard key when
  *    the leaf is a lake table; for ANY other relation (session
  *    parquet view, JDBC, …) the first
  *    `spark.graft.tablesample.keyColumns` entry present with an
  *    integral type — the declared-key convention that extends
  *    deterministic sampling beyond the lake. The list is empty
  *    unless the user opts in, and declared columns MUST be
  *    row-unique (see [[RewriteTrinoTablesample.bernoulliKey]]).
  *  - SYSTEM(p): per-SPLIT sampling — whole shards survive iff
  *    `hex60('tsys_<nShards>_<shard>') % 1e6 < p·1e4`, computed HERE
  *    from table metadata and pushed into the scan as a
  *    `graft.sample_shards` read option, so unsampled shards are
  *    never even planned (metadata-only, the Trino SYSTEM contract:
  *    sampling happens at split granularity for near-zero cost).
  *    Lake-only: split sampling needs split metadata, which only the
  *    lake scan declares.
  *
  * Refusal matrix (the Sample survives → vanilla Spark sampling, the
  * honest fallback for Trino's non-deterministic default): untagged
  * Samples (every user REPEATABLE seed); BERNOULLI with no declared
  * key on the leaf; SYSTEM over non-lake leaves or transform shard
  * keys; any non-commuting operator (join, aggregate) between Sample
  * and leaf. */
object RewriteTrinoTablesample extends Rule[LogicalPlan] {
  import org.apache.spark.sql.execution.datasources.LogicalRelation
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
    ShortType, StringType}
  import graft.sources.{GraftLakeTable, GraftLakeTransform, LakeViewSql}

  /** The relation LEAF under the Sample, walking ONLY operators that
    * commute with per-row sampling (aliases and deterministic
    * projections — ColumnPruning pushes a Project through Sample, so
    * by optimizer time `Sample(Project(rel))` is the COMMON shape).
    * Anything else (a join, an aggregate) refuses: sampling their
    * output is not sampling the table. */
  private def relLeaf(plan: LogicalPlan): Option[LogicalPlan] =
    plan match {
      case r: DataSourceV2Relation => Some(r)
      case r: LogicalRelation => Some(r)
      case SubqueryAlias(_, child) => relLeaf(child)
      // the rule runs at analysis post-hoc, where temp-view reads are
      // still wrapped in View (EliminateView is an optimizer rule)
      case v: View => relLeaf(v.child)
      case p: Project if p.projectList.forall(_.deterministic) =>
        relLeaf(p.child)
      case _ => None
    }

  private def lakeTable(leaf: LogicalPlan): Option[GraftLakeTable] =
    leaf match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftLakeTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  /** Plain integral shard key column of `t`, when that is what the
    * table routes by (days()/months() transforms refuse — their cast
    * to string is not the portable-hash key contract). */
  private def plainKey(t: GraftLakeTable): Option[String] =
    GraftLakeTransform.parse(t.shardKey) match {
      case ("", col) => Some(col)
      case _ => None
    }

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }

  /** BERNOULLI's deterministic row key on `leaf`: lake shard key
    * first (the table's own routing contract), else the declared-key
    * convention — first `spark.graft.tablesample.keyColumns` column
    * present with an integral type.
    *
    * The declared-key list is EMPTY by default: it is an explicit
    * opt-in, because the rewrite's row semantics require the declared
    * column to be ROW-UNIQUE on every relation it matches. Keying a
    * non-unique column hash-samples KEY GROUPS — correlated cluster
    * sampling, not Bernoulli — and a name-based default would switch
    * semantics silently on any relation that happens to carry such a
    * column. Uniqueness is the user's declaration (like Trino's
    * bucket columns); it is not verified per-query — verification
    * would cost a full distinct scan at analysis time. */
  private def bernoulliKey(leaf: LogicalPlan): Option[Attribute] = {
    val fromLake = for {
      t <- lakeTable(leaf)
      k <- plainKey(t)
      a <- leaf.output.find(_.name == k)
    } yield a
    fromLake.orElse {
      conf.getConfString("spark.graft.tablesample.keyColumns", "")
        .split(",").iterator.map(_.trim).filter(_.nonEmpty)
        .flatMap(c => leaf.output.find(a =>
          a.name.equalsIgnoreCase(c) && integral(a.dataType)))
        .nextOption()
    }
  }

  private def threshold(upperBound: Double): Long =
    math.round(upperBound * 1000000.0)

  private def variant(s: Sample): Option[String] =
    s.getTagValue(LakeViewSql.TrinoSampleTag)

  override def apply(plan: LogicalPlan): LogicalPlan =
      org.apache.spark.sql.graft.Bridge.allowTransformsInAnalyzer {
    plan.transformUp {
    case s @ Sample(lb, ub, false, _, child)
        if lb == 0.0 && variant(s).contains("bernoulli") =>
      (for {
        leaf <- relLeaf(child)
        attr <- bernoulliKey(leaf)
      } yield {
        // the filter lands DIRECTLY above the relation (the key may
        // be pruned out of the intervening Project) — sound because
        // everything relLeaf walks through is per-row
        val hash = Md5Prefix60(
          Concat(Seq(Literal("tsmp_"), Cast(attr, StringType))))
        val pred = LessThan(new Remainder(hash, Literal(1000000L)),
          Literal(threshold(ub)))
        child.transformUp {
          case r if r eq leaf => Filter(pred, r)
        }
      }).getOrElse(s)

    case s @ Sample(lb, ub, false, _, child)
        if lb == 0.0 && variant(s).contains("system") =>
      (for {
        leaf <- relLeaf(child)
        rel <- Some(leaf).collect { case r: DataSourceV2Relation => r }
        t <- lakeTable(leaf)
        _ <- plainKey(t)
      } yield {
        val keep = (0 until t.nShards).filter { k =>
          HashUtil.hex60md5(
            org.apache.spark.unsafe.types.UTF8String
              .fromString(s"tsys_${t.nShards}_$k")) % 1000000L <
            threshold(ub)
        }
        val merged = new java.util.HashMap[String, String](rel.options)
        merged.put("graft.sample_shards", keep.mkString(","))
        child.transformUp {
          case r: DataSourceV2Relation if r eq rel =>
            r.copy(options =
              new org.apache.spark.sql.util.CaseInsensitiveStringMap(
                merged))
        }
      }).getOrElse(s)
  } }
}
