package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.operators.{Aggregates, Coverage, Relational, Similarity}

/** Physical-plan assertions: the scale properties the engine promises
  * (pushdown, pruning, broadcast, codegen, top-k) must be visible in the
  * executed plan, not just hoped for. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("driver smoke contract: entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("projection prunes the parquet ReadSchema to selected columns") {
    val p = plan(Relational.scanProject(spark, sf))
    assert(p.contains("l_extendedprice"))
    assert(!p.contains("l_discount"), "unselected column leaked into scan")
  }

  test("date filters are pushed to the parquet scan") {
    val p = plan(Relational.filterDateRange(spark, sf))
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
           p.contains("GreaterThanOrEqual(`l_shipdate`"),
      s"expected shipdate pushdown in:\n$p")
  }

  test("dim-chain join broadcasts the small sides") {
    val p = plan(Relational.joinBroadcastDims(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected BHJ in:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.topK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k in:\n$p")
  }

  test("grouped aggregation runs partial+final hash aggregates in codegen") {
    val df = Aggregates.groupbyAgg(spark, sf)
    val p = plan(df)
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
    val cg = df.queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"), "agg fell out of codegen")
  }

  test("ann queries broadcast the query-vector side and stage the top-k") {
    // IVF-label variant: its equi-join keeps the window form (the cosine
    // rewrite below requires an unconditioned cross join), so it shows
    // the broadcast + WindowGroupLimit staging
    val p = plan(Similarity.annIvfLabelTopk(spark, sf))
    assert(p.contains("Broadcast"), s"expected broadcast join in:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not staged into partial top-k:\n$p")
  }

  test("declarative cosine top-k rewrites to CosineTopKJoinExec") {
    val p = plan(Similarity.annBruteTopk(spark, sf))
    assert(p.contains("CosineTopKJoin"),
      s"RewriteCosineTopK did not fire on the declarative form:\n$p")
  }

  test("hybrid RRF: dense side rides CosineTopKJoinExec, both rank " +
      "filters stage into partial top-k, and no cartesian appears") {
    val p = plan(Similarity.searchHybridRrf(spark, sf))
    assert(p.contains("CosineTopKJoin"),
      s"dense side did not rewrite to the custom operator:\n$p")
    // three staged rank filters: lexical top-20, fusion top-10 (the
    // dense top-20 lives inside CosineTopKJoinExec's bounded buffers)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 4,
      s"rank filters not staged partial+final:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("cosine top-k rewrite also fires over the typed media pipeline") {
    val df = graft.operators.Multimodal.mmEmbedAnn(spark, sf)
    val p = plan(df)
    assert(p.contains("CosineTopKJoin"),
      s"RewriteCosineTopK did not fire on mm_embed_ann:\n$p")
    // and EXECUTE it: the typed pipeline's encoder derives
    // ARRAY<FLOAT> with containsNull=false (the parquet corpus reports
    // true), so this path must reach CosineTopKJoinExec's child-shape
    // guard and row reads — a plan-string assert alone missed a guard
    // regression that only bench surfaced
    assert(df.count() > 0)
  }

  test("EXISTS/NOT EXISTS decorrelate to semi/anti hash joins") {
    val p = plan(Coverage.subqueryExists(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS not decorrelated:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not decorrelated:\n$p")
  }

  test("rank=1 dedup rewrites to a map-side-combinable max_by aggregate") {
    val df = Aggregates.dedupLatestByKey(spark, sf)
    val p = plan(df)
    assert(p.contains("max_by"),
      s"RewriteRankOneToMaxBy did not fire:\n$p")
    assert(!p.contains("row_number"),
      s"window survived the rewrite:\n$p")
    assert(p.contains("partial_max_by"),
      s"no map-side partial aggregation:\n$p")
  }

  test("partitioned layout prunes partitions at the scan") {
    val p = plan(Coverage.partitionedWritePrune(spark, sf))
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning in:\n$p")
  }

  test("timestamp bounds are pushed to the raw nanos parquet scan") {
    val p = plan(Coverage.eventsTimeBounded(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,") ||
           p.contains("GreaterThanOrEqual(ts,17"),
      s"ts bound not pushed to scan:\n$p")
  }

  test("bucketed join plans no shuffle before the join") {
    val df = Coverage.joinBucketed(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    // the final orderBy range-partitions; the JOIN inputs must not be
    // hash-shuffled — the bucketed layout satisfies SMJ's requirement
    assert(p.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join re-shuffled:\n$p")
  }

  test("runtime bloom filter prunes the fact side before the join shuffle") {
    val p = plan(Coverage.joinRuntimeBloom(spark, sf))
    assert(p.contains("might_contain"),
      s"no bloom probe above the lineitem scan:\n$p")
    assert(p.contains("bloom_filter_agg"),
      s"no bloom build on the filtered-orders side:\n$p")
  }

  test("dim filter prunes fact partitions at runtime (DPP)") {
    val p = plan(Coverage.joinDppPrune(spark, sf))
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$p")
  }

  test("per-group top-k stages WindowGroupLimit partial+final") {
    val p = plan(Coverage.topkPerGroup(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"rank<=3 filter did not stage a group limit:\n$p")
  }

  test("flagship join stays inside whole-stage codegen") {
    val cg = Relational.q1JoinFilterSort(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"))
  }

  test("centroids aggregate per-dimension decimal sums, not whole cells") {
    val p = plan(Similarity.centroids(spark, sf))
    assert(p.contains("posexplode"), s"expected exploded dims in:\n$p")
    assert(p.contains("partial_sum"),
      s"per-dim sum lost its map-side partial:\n$p")
    assert(!p.contains("collect_list(struct(vec_id"),
      "whole-cell vector buffering returned")
  }

  test("exact cosine all-pairs is a blocked equi-join, not a cartesian") {
    val p = plan(Similarity.cosineNeardup(spark, sf))
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs fell back to a cartesian plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"),
      s"expected an equi-join on block-pair task keys in:\n$p")
  }

  test("int8 ANN: native kernels in the plan, two-stage top-k, broadcast " +
      "queries") {
    val p = plan(Similarity.annInt8Topk(spark, sf))
    assert(p.contains("graft_sq8") || p.contains("sq8quantize") ||
           p.toLowerCase.contains("sq8"),
      s"expected the native quantize kernel in:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-partition partial top-k missing:\n$p")
    assert(p.contains("Broadcast"), s"query side not broadcast:\n$p")
  }

  test("q7 deep join tree: zero fact-side shuffles before the partial agg") {
    val p = plan(Relational.q7VolumeShipping(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      s"a dim join fell back to a fact shuffle:\n$p")
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
    // nation IN-filter is pushed into the scans
    assert(p.contains("In(n_name") || p.contains("n_name IN"),
      s"nation pre-filter not pushed:\n$p")
  }

  test("line-level dedup generates chunks, not token explosions") {
    val df = graft.operators.Dedup.lineLevel(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("posexplode"), s"expected chunk generator in:\n$p")
    // exactly three exchanges: chunk-key window, doc reassembly, final sort
    val exchanges = "Exchange".r.findAllIn(
      p.replace("BroadcastExchange", "")).length
    assert(exchanges <= 3, s"unexpected extra shuffles ($exchanges):\n$p")
  }

  test("kmeans: centroids broadcast to the assignment pass, per-dim " +
      "decimal sums, no corpus cartesian") {
    val df = Similarity.embeddingKmeans(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the k-row centroid side must reach each assignment as a broadcast
    assert(p.contains("BroadcastExchange") || p.contains("Broadcast"),
      s"centroid side not broadcast:\n$p")
    // update step keeps the decimal per-dimension partial aggregation
    assert(p.contains("partial_sum"),
      s"per-dim sum lost its map-side partial:\n$p")
    // no plan node ever joins corpus AGAINST corpus without keys
    assert(!p.contains("CartesianProduct"),
      s"corpus-side cartesian appeared:\n$p")
  }

  test("PQ-ADC: codebooks and LUT broadcast, top-k staged per query") {
    val p = plan(Similarity.annPqAdc(spark, sf))
    assert(p.contains("Broadcast"), s"LUT/codebook side not broadcast:\n$p")
    assert(p.contains("partial_sum"),
      s"ADC partial aggregation missing (map-side combine):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scoring fell back to a cartesian:\n$p")
  }

  test("LM perplexity: token-count tables join back, per-doc agg has " +
      "map-side partials, corpus text never cartesian-joined") {
    val p = plan(graft.functions.TextAnalysis.lmPerplexity(spark, sf))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"per-doc aggregation lost its partial:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"corpus cartesian appeared:\n$p")
  }

  test("substring dedup: native gram kernel scans the corpus ONCE, " +
      "one gram exchange decides duplication in-window, no cartesian") {
    val df = graft.operators.Dedup.substringSpans(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // exactly ONE corpus tokenize pass: the round-18 rewrite decides
    // "gram in >1 distinct doc" with min/max over the gram window, so
    // the kernel must appear, and only once (the old aggregate +
    // LEFT SEMI shape re-ran it per branch)
    val kernelHits = "charngramhashes".r
      .findAllIn(p.toLowerCase).length
    assert(kernelHits >= 1, s"expected the native gram kernel in:\n$p")
    assert(kernelHits <= 1,
      s"gram kernel evaluated $kernelHits times — corpus re-scanned:\n$p")
    // the whole job is three shuffles: gram window, doc reassembly,
    // final sort (was 4 gram-carrying exchanges + a semi join)
    val exchanges = "Exchange".r.findAllIn(
      p.replace("BroadcastExchange", "")).length
    assert(exchanges <= 3, s"unexpected extra shuffles ($exchanges):\n$p")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"substring dedup fell back to a cartesian:\n$p")
  }

  test("windowed funnel: user-keyed equi-joins with map-side partial " +
      "mins, no cartesian anywhere") {
    val p = plan(Coverage.funnelWindowed(spark, sf))
    assert(p.contains("partial_min"),
      s"stage aggregates lost their partials:\n$p")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"funnel stage join fell back to a cartesian:\n$p")
  }

  test("event transitions: one user-keyed window pass feeds the tiny " +
      "transition aggregate") {
    val p = plan(Coverage.eventTransitions(spark, sf))
    assert(p.contains("Window"), s"lead() window missing:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"transition count lost its partial:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("boilerplate removal: frequent-chunk set broadcasts back (the " +
      "corpus side never shuffles to discover boilerplate)") {
    val p = plan(graft.functions.TextAnalysis.boilerplateLines(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"frequent set not broadcast:\n$p")
    assert(p.contains("Generate"), s"chunk generate missing:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("span decontam: native gram kernel + broadcast LEFT SEMI probe " +
      "of the benchmark gram set") {
    val df = graft.operators.Dedup.decontamSpanClean(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("charngramhashes"),
      s"expected the native gram kernel in:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"benchmark gram probe is not a broadcast semi-join:\n$p")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"))
  }

  test("kNN graph: cell-blocked equi-join candidates, per-node top-k " +
      "staged as WindowGroupLimit, no cartesian") {
    val p = plan(Similarity.knnGraphCells(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"per-node rank not staged partial+final:\n$p")
    // the only nested-loop joins allowed are the deliberate k-centroid
    // broadcasts of the cell-assignment pass (tiny build side); the
    // candidate join itself must be a (cell, ti, tj) equi-join
    assert(!p.contains("CartesianProduct"),
      s"kNN candidates fell back to a cartesian:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
        || p.contains("BroadcastHashJoin"),
      s"cell candidate equi-join missing:\n$p")
  }

  test("AQE splits a skewed sort-merge join at runtime (complements the " +
      "manual join_salted operator)") {
    // Isolated session: lowered skew thresholds so the harness-scale hot
    // key trips the same OptimizeSkewedJoin rule that handles production
    // skew; broadcast disabled to force the SMJ path AQE rewrites.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    ss.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import org.apache.spark.sql.functions.{col, lit}
    val hot = ss.range(0, 50000).select(lit(0L).as("k"), col("id").as("v"))
    val cold = ss.range(0, 1000)
      .select((col("id") % 100 + 1).as("k"), col("id").as("v"))
    val right = ss.range(0, 101).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val j = hot.union(cold).join(right, "k")
    // collect() (not count()) so THIS query execution's adaptive plan
    // finalizes — count() would plan a separate aggregate execution
    assert(j.collect().length === 50000 + 1000)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE did not mark the hot partition as skewed:\n$p")
  }

  test("AQE skew split fires on a LAKE fact SMJ, composing with the " +
      "vectorized columnar read (join_skew_aqe's plan contract)") {
    val ss = spark.newSession()
    graft.sources.Lake.registerCatalog(ss)
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    ss.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact = "graft_lake.lake.spec_skew_fact"
    ss.sql(s"DROP TABLE IF EXISTS $fact")
    ss.sql(s"""CREATE TABLE $fact (event_id BIGINT, k BIGINT)
      TBLPROPERTIES ('shard_key'='event_id', 'n_shards'='8')""")
    // 50k rows on one hot key + a 1k-row cold tail over 100 keys
    ss.sql(s"""INSERT INTO $fact
      SELECT id AS event_id, 0L AS k FROM range(0, 50000)
      UNION ALL
      SELECT 50000 + id, id % 100 + 1 FROM range(0, 1000)""")
    val dim = ss.range(0, 101).selectExpr("id AS k", "id * 2 AS w")
    val j = ss.table(fact).join(dim, "k")
      // group on w (not k): the post-join exchange is needed either
      // way, so OptimizeSkewedJoin can split without being forced.
      // max(event_id) keeps the DISTINCT ids in the fact shuffle —
      // a k-only projection is 50k identical longs, which lz4
      // compresses below any skew threshold (partition sizes are
      // measured on compressed map output)
      .groupBy("w").agg(org.apache.spark.sql.functions.max("event_id"))
    assert(j.collect().length === 101)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE did not split the hot lake partition:\n$p")
    assert(p.contains("GraftLakeScan"),
      s"expected the lake fact scan in:\n$p")
    ss.sql(s"DROP TABLE $fact")
  }

  test("bitmap64 distinct: two-level ObjectHashAggregate, partial " +
      "map-side — only serialized bitmaps cross the exchange") {
    val df = Aggregates.bitmapExactDistinct64(spark, sf)
    val p = plan(df)
    assert(p.contains("ObjectHashAggregate"),
      s"bitmap aggregate not planned as ObjectHashAggregate:\n$p")
    assert(p.contains("partial_graft_bitmap_distinct64"),
      s"no map-side partial bitmap build:\n$p")
    // the only columns read are the two key parts + the group key
    assert(p.contains("l_partkey") && p.contains("l_suppkey"),
      s"composite key columns missing from scan:\n$p")
  }

  test("n-gram Jaccard: document-frequency annotation is a broadcast " +
      "join (no corpus shuffle on the shingle key before the window)") {
    val df = graft.operators.Dedup.ngramJaccard(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the df-annotation join must be broadcast; the candidate self-join
    // on pruned prefixes may shuffle (that's the PPJoin exchange)
    val broadcastJoins = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcastJoins >= 1, s"dfreq join not broadcast:\n$p")
    // the aggregate feeding the broadcast is the vocabulary-sized dfreq
    assert(p.contains("BroadcastExchange"),
      s"no broadcast exchange in the plan:\n$p")
  }

  test("TextRank: final top-15 plans TakeOrderedAndProject over the " +
      "checkpointed rank table (iterations do not re-execute)") {
    val df = graft.functions.TextAnalysis.textRankKeywords(spark, sf)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-15 is a global sort:\n$p")
    // the plan must read the checkpointed iteration-3 RDD, not replay
    // the corpus scan: no parquet scan may appear above the checkpoint
    assert(!p.contains("Scan parquet"),
      s"final plan re-executes the corpus scan:\n$p")
  }

  test("ANALYZE-fed CBO flips the filtered-orders join from sort-merge " +
      "to broadcast (file-size estimate above the threshold, " +
      "stats-estimated filter selectivity below it)") {
    val fp = graft.sources.Tables.fingerprint(sf, "orders")
    val ot = s"spec_cbo_orders_$fp"
    val lt = s"spec_cbo_lineitem_$fp"
    spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.$ot")
    spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.$lt")
    spark.sql(s"""CREATE TABLE spark_catalog.default.$ot
      USING parquet LOCATION '$sf/orders.parquet'""")
    spark.sql(s"""CREATE TABLE spark_catalog.default.$lt
      USING parquet LOCATION '$sf/lineitem.parquet'""")
    // the selective filter runs on the BIGINT key: Spark 4.1's
    // FilterEstimation has no TimestampNTZType branch (MatchError on
    // an analyzed NTZ column under CBO — reproduced here round 11),
    // so the harness's NTZ o_orderdate must never get column stats;
    // min/max selectivity on a numeric key is the same CBO mechanism
    val joinSql =
      s"""SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority
         FROM spark_catalog.default.$lt l
         JOIN spark_catalog.default.$ot o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderkey < 100"""
    // threshold between the no-stats estimate (36 KB orders file ×
    // the pruned-column ratio ≈ 18 KB — size-only visitors don't
    // shrink through Filter) and the CBO estimate (~100 rows passing
    // the ~6.7%-selective key filter × stats avgLen ≈ 3 KB). AQE off
    // so the STATIC planner decision is what's asserted (AQE would
    // rescue the bad plan at runtime from actual sizes — on a cluster
    // that's one wasted shuffle stage already materialized).
    val conf = Seq("spark.sql.autoBroadcastJoinThreshold" -> "8192",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def physical = spark.sql(joinSql).queryExecution.executedPlan
        .toString
      val before = physical
      assert(before.contains("SortMergeJoin") &&
        !before.contains("BroadcastHashJoin"),
        s"expected stats-less plan to shuffle both sides:\n$before")
      spark.sql(s"""ANALYZE TABLE spark_catalog.default.$ot
        COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_orderpriority""")
      spark.sql(s"""ANALYZE TABLE spark_catalog.default.$lt
        COMPUTE STATISTICS FOR COLUMNS l_orderkey""")
      val after = physical
      assert(after.contains("BroadcastHashJoin"),
        s"ANALYZE stats did not flip the join to broadcast:\n$after")
      // and the rescued plan returns the same rows
      assert(spark.sql(joinSql).count() ===
        spark.sql(joinSql.replace(s"spark_catalog.default.$lt",
          s"parquet.`$sf/lineitem.parquet`")
          .replace(s"spark_catalog.default.$ot",
            s"parquet.`$sf/orders.parquet`")).count())
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.$ot")
      spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.$lt")
    }
  }

  test("ANALYZE-fed CBO REORDERS a TPC-H Q9-shaped 5-way join tree: " +
      "the selective part filter moves off the written order, result " +
      "unchanged") {
    val fp = graft.sources.Tables.fingerprint(sf, "orders")
    val names = Seq("lineitem", "orders", "supplier", "nation", "part")
    def tbl(n: String) = s"spec_cbr_${n}_$fp"
    names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.${tbl(n)}")
      spark.sql(s"""CREATE TABLE spark_catalog.default.${tbl(n)}
        USING parquet LOCATION '$sf/$n.parquet'""")
    }
    // Q9's join graph on the harness schema, WRITTEN in a bad order:
    // the two biggest relations first, the selective part filter last
    val joinSql =
      s"""SELECT count(*) AS n, sum(l.l_orderkey) AS s1,
             sum(p.p_partkey) AS s2
         FROM spark_catalog.default.${tbl("lineitem")} l
         JOIN spark_catalog.default.${tbl("orders")} o
           ON l.l_orderkey = o.o_orderkey
         JOIN spark_catalog.default.${tbl("supplier")} s
           ON l.l_suppkey = s.s_suppkey
         JOIN spark_catalog.default.${tbl("nation")} n
           ON s.s_nationkey = n.n_nationkey
         JOIN spark_catalog.default.${tbl("part")} p
           ON l.l_partkey = p.p_partkey
         WHERE p.p_partkey < 20"""
    def leafOrder: Seq[String] =
      spark.sql(joinSql).queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString.linesIterator.next())
        .flatMap("spec_cbr_([a-z]+)_".r.findFirstMatchIn(_)
          .map(_.group(1))).toSeq
    val saved = "spark.sql.cbo.joinReorder.enabled" ->
      spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      // stats-off: the reorderer has no row counts — written order
      val before = leafOrder
      assert(before === Seq("lineitem", "orders", "supplier",
        "nation", "part"),
        s"stats-less plan must keep the written join order: $before")
      val keyCols = Map(
        "lineitem" -> "l_orderkey, l_suppkey, l_partkey",
        "orders" -> "o_orderkey", "supplier" -> "s_suppkey, s_nationkey",
        "nation" -> "n_nationkey", "part" -> "p_partkey")
      names.foreach(n => spark.sql(
        s"""ANALYZE TABLE spark_catalog.default.${tbl(n)}
            COMPUTE STATISTICS FOR COLUMNS ${keyCols(n)}"""))
      val after = leafOrder
      assert(after !== before,
        s"ANALYZE stats did not reorder the join tree: $after")
      // the selective filtered dimension must join before at least one
      // of the two big relations the written order put first
      assert(after.indexOf("part") <
        math.max(after.indexOf("orders"), after.indexOf("supplier")),
        s"expected the filtered part dim to move earlier: $after")
      // reordered plan, identical answer (vs the raw-parquet recompute)
      val got = spark.sql(joinSql).head()
      val want = spark.sql(names.foldLeft(joinSql)((q, n) =>
        q.replace(s"spark_catalog.default.${tbl(n)}",
          s"parquet.`$sf/$n.parquet`"))).head()
      assert(got === want)
    } finally {
      spark.conf.set(saved._1, saved._2)
      names.foreach(n => spark.sql(
        s"DROP TABLE IF EXISTS spark_catalog.default.${tbl(n)}"))
    }
  }

  test("ANALYZE-fed CBO reorders the two WIDEST macro trees (the " +
      "q8_market_share 8-leaf and q7_volume_shipping 6-leaf shapes), " +
      "written deliberately big-tables-first; filtered dims move " +
      "earlier, results unchanged") {
    val fp = graft.sources.Tables.fingerprint(sf, "orders")
    val names = Seq("lineitem", "orders", "customer", "supplier",
      "nation", "part", "region")
    def tbl(n: String) = s"spark_catalog.default.spec_cbw_${n}_$fp"
    names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS ${tbl(n)}")
      spark.sql(s"""CREATE TABLE ${tbl(n)}
        USING parquet LOCATION '$sf/$n.parquet'""")
    }
    // q8's join graph, worst-first: the three biggest relations open
    // the tree, the selective part/region filters close it
    val q8 =
      s"""SELECT count(*) AS n, sum(l.l_orderkey) AS s1,
             sum(p.p_partkey) AS s2
         FROM ${tbl("lineitem")} l
         JOIN ${tbl("orders")} o ON l.l_orderkey = o.o_orderkey
         JOIN ${tbl("customer")} c ON o.o_custkey = c.c_custkey
         JOIN ${tbl("supplier")} s ON l.l_suppkey = s.s_suppkey
         JOIN ${tbl("nation")} n1 ON c.c_nationkey = n1.n_nationkey
         JOIN ${tbl("nation")} n2 ON s.s_nationkey = n2.n_nationkey
         JOIN ${tbl("part")} p ON l.l_partkey = p.p_partkey
         JOIN ${tbl("region")} r ON n1.n_regionkey = r.r_regionkey
         WHERE p.p_type = 'STANDARD' AND r.r_name = 'ASIA'
           AND o.o_orderdate >= DATE '1996-01-01'
           AND o.o_orderdate < DATE '1998-01-01'"""
    // q7's join graph, worst-first: orders x customer open
    val q7 =
      s"""SELECT count(*) AS n, sum(l.l_orderkey) AS s1
         FROM ${tbl("orders")} o
         JOIN ${tbl("customer")} c ON o.o_custkey = c.c_custkey
         JOIN ${tbl("lineitem")} l ON l.l_orderkey = o.o_orderkey
         JOIN ${tbl("supplier")} s ON l.l_suppkey = s.s_suppkey
         JOIN ${tbl("nation")} n1 ON s.s_nationkey = n1.n_nationkey
         JOIN ${tbl("nation")} n2 ON c.c_nationkey = n2.n_nationkey
         WHERE n1.n_name IN ('NATION_20', 'NATION_11')
           AND n2.n_name IN ('NATION_20', 'NATION_11')
           AND l.l_shipdate >= DATE '1995-01-01'
           AND l.l_shipdate < DATE '1997-01-01'"""
    def leafOrder(sql: String): Seq[String] =
      spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString.linesIterator.next())
        .flatMap("spec_cbw_([a-z]+)_".r.findFirstMatchIn(_)
          .map(_.group(1))).toSeq
    val saved = "spark.sql.cbo.joinReorder.enabled" ->
      spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      val before8 = leafOrder(q8)
      val before7 = leafOrder(q7)
      assert(before8 === Seq("lineitem", "orders", "customer",
        "supplier", "nation", "nation", "part", "region"),
        s"stats-less q8 must keep the written join order: $before8")
      assert(before7 === Seq("orders", "customer", "lineitem",
        "supplier", "nation", "nation"),
        s"stats-less q7 must keep the written join order: $before7")
      // NO stats on l_shipdate/o_orderdate: they are TIMESTAMP_NTZ in
      // the harness parquet and Spark 4.1's FilterEstimation has no
      // NTZ branch (MatchError inside optimization — the documented
      // CBO gotcha); their predicates estimate at default selectivity
      val keyCols = Map(
        "lineitem" -> "l_orderkey, l_suppkey, l_partkey",
        "orders" -> "o_orderkey, o_custkey",
        "customer" -> "c_custkey, c_nationkey",
        "supplier" -> "s_suppkey, s_nationkey",
        "nation" -> "n_nationkey, n_regionkey, n_name",
        "part" -> "p_partkey, p_type",
        "region" -> "r_regionkey, r_name")
      names.foreach(n => spark.sql(
        s"""ANALYZE TABLE ${tbl(n)}
            COMPUTE STATISTICS FOR COLUMNS ${keyCols(n)}"""))
      val after8 = leafOrder(q8)
      val after7 = leafOrder(q7)
      info(s"q8 reordered: $before8 -> $after8")
      info(s"q7 reordered: $before7 -> $after7")
      assert(after8 !== before8,
        s"ANALYZE stats did not reorder the q8 tree: $after8")
      // observed stable shape: the tree opens with the eq-filtered
      // region⋈nation chain BEFORE the fact enters, and the filtered
      // part overtakes the unfiltered supplier the written order put
      // before it
      assert(after8.indexOf("region") < after8.indexOf("lineitem"),
        s"expected the filtered region chain before the fact: $after8")
      assert(after8.indexOf("part") < after8.indexOf("supplier"),
        s"expected the filtered part before supplier: $after8")
      assert(after7 !== before7,
        s"ANALYZE stats did not reorder the q7 tree: $after7")
      // the IN-filtered nation dim must cut customer down BEFORE the
      // big orders join (written order had orders⋈customer first)
      assert(after7.indexOf("nation") < after7.indexOf("orders"),
        s"expected a filtered nation before orders: $after7")
      // reordered plans, identical answers vs raw-parquet recompute
      for (q <- Seq(q8, q7)) {
        val got = spark.sql(q).head()
        val want = spark.sql(names.foldLeft(q)((x, n) =>
          x.replace(tbl(n), s"parquet.`$sf/$n.parquet`"))).head()
        assert(got === want, s"reorder changed the answer for:\n$q")
      }
    } finally {
      spark.conf.set(saved._1, saved._2)
      names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS ${tbl(n)}"))
    }
  }

  test("lake scan reports DSv2 statistics: a small lake dimension " +
      "joined to parquet plans a broadcast of the lake side (without " +
      "stats a DSv2 relation defaults to 'huge' and shuffles both)") {
    graft.sources.Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_stats_dim"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, cohort_d DATE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    spark.sql(s"""INSERT INTO $tbl
      SELECT DISTINCT user_id, DATE '2024-03-01'
      FROM parquet.`$sf/events.parquet`""")
    // static planner decision (AQE would rescue from runtime sizes —
    // on a cluster that's a wasted materialized shuffle already)
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.sql(
        s"""SELECT e.user_id, count(*) AS n
           FROM parquet.`$sf/events.parquet` e
           JOIN $tbl d ON e.user_id = d.user_id
           GROUP BY e.user_id""")
      val p = plan(joined)
      assert(p.contains("BroadcastHashJoin"),
        s"lake-side stats did not drive a broadcast decision:\n$p")
      // the estimate itself: bytes from file lengths, rows from
      // parquet footers — exact at this scale
      val scan = joined.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec if b.scan.isInstanceOf[
              graft.sources.GraftLakeScan] =>
            b.scan.asInstanceOf[graft.sources.GraftLakeScan]
        }
      assert(scan.isDefined, "no lake scan in the executed plan")
      val st = scan.get.estimateStatistics()
      assert(st.numRows().getAsLong ===
        spark.table(tbl).count())
      assert(st.sizeInBytes().getAsLong > 0L &&
        st.sizeInBytes().getAsLong < 10L * 1024 * 1024)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", saved)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("estimateStatistics reflects zone-map shard pruning: a pruned " +
      "scan reports the post-pruning bytes/rows (the CBO sees the " +
      "small side it will actually read, not the whole table)") {
    graft.sources.Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_stats_pruned"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // range clustering: 8 disjoint user_id bands of width 100
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='8',
        'shard_width'='100')""")
    spark.sql(s"""INSERT INTO $tbl
      SELECT id AS user_id, id * 2 AS v FROM range(0, 800)""")
    try {
      def lakeScan(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec if b.scan.isInstanceOf[
              graft.sources.GraftLakeScan] =>
            b.scan.asInstanceOf[graft.sources.GraftLakeScan]
        }.get
      val full = lakeScan(spark.sql(s"SELECT * FROM $tbl"))
        .estimateStatistics()
      val pruned = lakeScan(spark.sql(
        s"SELECT * FROM $tbl WHERE user_id < 100"))
        .estimateStatistics()
      assert(full.numRows().getAsLong === 800L)
      assert(pruned.numRows().getAsLong === 100L,
        "stats must be computed AFTER zone-map pruning")
      assert(pruned.sizeInBytes().getAsLong <
        full.sizeInBytes().getAsLong / 4,
        "pruned byte estimate must shrink with the planned shard set")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
