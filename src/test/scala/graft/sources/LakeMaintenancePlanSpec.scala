package graft.sources

import graft.SparkSpec

/** `CALL maintenance_plan` — the unified nightly advisor. Pins the
  * whole contract on a spec-local, heavily-degraded index group:
  *  - every signal FIRES on the degraded state (high dead-posting
  *    fraction, tombstone fill past a tightened cap, large quantizer
  *    drift, multi-part shards, DV dead rows, lost sorted
  *    provenance);
  *  - the report is READ-ONLY (a second CALL returns the same rows);
  *  - executing exactly the recommended CALLs clears the plan to
  *    all-'ok' — the advisor's recommendations are actionable, not
  *    decorative. */
class LakeMaintenancePlanSpec extends SparkSpec {

  private def plan(): Map[(String, String), (Long, String)] =
    spark.sql("""CALL graft_lake.system.maintenance_plan(
        table => 'spec_mx_tbl', text_index => 'spec_mx_tix',
        ann_index => 'spec_mx_aix')""")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getString(4)))).toMap

  private def mk(): Unit = {
    Lake.registerCatalog(spark)
    for (t <- Seq("spec_mx_tbl", "spec_mx_tix", "spec_mx_tix_docs",
        "spec_mx_tix_tomb", "spec_mx_tix_meta", "spec_mx_aixsrc",
        "spec_mx_aix", "spec_mx_aix_centroids", "spec_mx_aix_codebooks",
        "spec_mx_aix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    // the storage table: MoR deletes, two parts on shard 0, sorted
    // provenance established then lost on shards {0,1}
    spark.sql("""CREATE TABLE graft_lake.lake.spec_mx_tbl
      (doc_id BIGINT, text STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='4',
        'delete_mode'='merge-on-read')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_mx_tbl
      SELECT id, concat('alpha beta doc ', CAST(id AS STRING))
      FROM range(0, 40)""")                       // v1: shards 0-3
    spark.sql("""CALL graft_lake.system.rewrite_sorted(
      table => 'spec_mx_tbl')""")                 // v2: all sorted
    spark.sql("""INSERT INTO graft_lake.lake.spec_mx_tbl
      SELECT id, concat('gamma ', CAST(id AS STRING))
      FROM range(100, 120) WHERE id % 4 IN (0, 1)""") // v3: 0,1 get a
    // 2nd part AND lose provenance
    spark.sql("""DELETE FROM graft_lake.lake.spec_mx_tbl
      WHERE doc_id % 4 = 2 AND doc_id % 8 = 2""") // v4: MoR DVs on
    // shard 2 — parts carried, provenance KEPT there
    // text index over the table, then a CoW UPDATE confined to shard
    // 3 (so it cannot fold the other shards' fragmentation): 10 docs
    // rewritten = a large dead-posting fraction + 10 tombstones,
    // which a tightened cap turns into a firing fill check
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_mx_tbl', index_table => 'spec_mx_tix')""")
    spark.sql("""UPDATE graft_lake.lake.spec_mx_tbl
      SET text = 'delta epsilon rewritten'
      WHERE doc_id % 4 = 3 AND doc_id < 40""")    // v5: shard 3 only
    spark.sql("""CALL graft_lake.system.refresh_text_index(
      index_table => 'spec_mx_tix')""")
    // the ANN index: built on a tight cluster, then a far cluster
    // arrives via refresh — the quantizer is badly stale
    spark.sql("""CREATE TABLE graft_lake.lake.spec_mx_aixsrc
      (vec_id BIGINT, emb STRING)
      TBLPROPERTIES ('shard_key'='vec_id', 'n_shards'='2')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_mx_aixsrc VALUES
      (0L, '1000000,0,0,0'), (1L, '990000,10000,0,0'),
      (2L, '0,1000000,0,0'), (3L, '0,990000,10000,0')""")
    spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_mx_aixsrc', index_table => 'spec_mx_aix',
      k => 2, iters => 1, pq_m => 2, pq_k => 2, pq_iters => 1)""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_mx_aixsrc VALUES
      (10L, '0,0,5000000,5000000'), (11L, '0,0,-5000000,5000000'),
      (12L, '0,0,5000000,-5000000'), (13L, '0,0,-4000000,4000000')""")
    spark.sql("""CALL graft_lake.system.refresh_ann_index(
      index_table => 'spec_mx_aix')""")
  }

  test("every degraded signal fires; executing the recommendations " +
      "clears the plan to all-ok; the report itself is read-only") {
    mk()
    try {
      // tighten the tombstone cap so the fill check fires too (10
      // tombstoned docs / cap 15 = 666666 ppm > 500000)
      spark.conf.set("spark.graft.textIndex.maxBroadcastTombstones",
        "15")
      val p1 = plan()
      assert(p1.size === 7)
      // create + insert + rewrite_sorted + insert + delete + update
      // = 5 retained snapshots > the 4-version budget
      assert(p1(("table", "snapshot_retention")) ===
        ((1250000L, "expire_snapshots")),
        s"retention: ${p1(("table", "snapshot_retention"))}")
      assert(p1(("text_index", "dead_postings"))._2 ===
        "rebuild_text_index", s"dead: ${p1(("text_index", "dead_postings"))}")
      assert(p1(("text_index", "tombstone_fill"))._2 ===
        "rebuild_text_index", s"tomb: ${p1(("text_index", "tombstone_fill"))}")
      assert(p1(("ann_index", "quantizer_drift"))._2 ===
        "retrain_ann_index", s"drift: ${p1(("ann_index", "quantizer_drift"))}")
      assert(p1(("table", "fragmentation"))._2 === "optimize",
        s"frag: ${p1(("table", "fragmentation"))}")
      assert(p1(("table", "dv_deleted_rows"))._2 === "optimize",
        s"dv: ${p1(("table", "dv_deleted_rows"))}")
      assert(p1(("table", "sorted_provenance"))._2 === "rewrite_sorted",
        s"sorted: ${p1(("table", "sorted_provenance"))}")
      // read-only: a second CALL reports the identical state
      assert(plan() === p1)
      // the retention budget is a CALL arg (default 4): a deployment
      // that tunes a table to keep 8 versions sees the same 5
      // retained snapshots as healthy, and the other signals are
      // untouched by the knob
      val p8 = spark.sql("""CALL graft_lake.system.maintenance_plan(
          table => 'spec_mx_tbl', text_index => 'spec_mx_tix',
          ann_index => 'spec_mx_aix', snapshot_budget => 8)""")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getString(4)))).toMap
      assert(p8(("table", "snapshot_retention")) === ((625000L, "ok")),
        s"budget=8: ${p8(("table", "snapshot_retention"))}")
      assert(p8.filterNot(_._1._2 == "snapshot_retention") ===
        p1.filterNot(_._1._2 == "snapshot_retention"))
      val eBudget = intercept[Exception] {
        spark.sql("""CALL graft_lake.system.maintenance_plan(
          table => 'spec_mx_tbl', text_index => 'spec_mx_tix',
          ann_index => 'spec_mx_aix', snapshot_budget => 0)""")
          .collect()
      }
      assert(eBudget.getMessage.contains("snapshot_budget"))
      // execute EXACTLY the recommended maintenance verbs
      spark.sql("""CALL graft_lake.system.build_text_index(
        table => 'spec_mx_tbl', index_table => 'spec_mx_tix')""")
      spark.sql("""CALL graft_lake.system.retrain_ann_index(
        index_table => 'spec_mx_aix')""")
      spark.sql("""CALL graft_lake.system.optimize(
        table => 'spec_mx_tbl', dv_threshold => 0.0001,
        max_parts => 1)""")
      spark.sql("""CALL graft_lake.system.rewrite_sorted(
        table => 'spec_mx_tbl')""")
      // expire LAST: the maintenance verbs above each COMMIT a new
      // version, so retention is the final thing to trim
      spark.sql("""CALL graft_lake.system.expire_snapshots(
        table => 'spec_mx_tbl', keep => 1)""")
      val p2 = plan()
      assert(p2.values.forall(_._2 == "ok"),
        s"plan not cleared: ${p2.filter(_._2._2 != "ok")}")
      // and the metrics themselves collapsed, not just the labels
      assert(p2(("text_index", "dead_postings"))._1 === 0L)
      assert(p2(("text_index", "tombstone_fill"))._1 === 0L)
      assert(p2(("ann_index", "quantizer_drift"))._1 === 1000000L,
        "freshly retrained quantizer drifts by exactly 1.0")
      assert(p2(("table", "fragmentation"))._1 === 1000000L,
        "compacted table: exactly one part per data shard")
      assert(p2(("table", "dv_deleted_rows"))._1 === 0L)
      assert(p2(("table", "snapshot_retention"))._1 === 250000L,
        "one retained snapshot after expire keep=1")
      assert(p2(("table", "sorted_provenance"))._1 === 0L)
    } finally
      spark.conf.unset("spark.graft.textIndex.maxBroadcastTombstones")
  }

  test("maintenance_run executes the recommended verbs in " +
      "dependency-safe order and is idempotent: the first run heals " +
      "every fired signal, the second finds nothing to do") {
    mk()
    try {
      spark.conf.set("spark.graft.textIndex.maxBroadcastTombstones",
        "15")
      def run(): Map[(String, String), (Long, Long, String)] =
        spark.sql("""CALL graft_lake.system.maintenance_run(
            table => 'spec_mx_tbl', text_index => 'spec_mx_tix',
            ann_index => 'spec_mx_aix')""")
          .collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      val r1 = run()
      assert(r1.size === 7)
      // every fired signal names its executed verb and lands healed
      assert(r1(("text_index", "dead_postings"))._3 ===
        "rebuild_text_index")
      assert(r1(("text_index", "dead_postings"))._2 === 0L)
      assert(r1(("text_index", "tombstone_fill"))._2 === 0L)
      assert(r1(("ann_index", "quantizer_drift")) ===
        ((r1(("ann_index", "quantizer_drift"))._1, 1000000L,
          "retrain_ann_index")),
        "retrain must land the drift ratio on exactly 1.0")
      assert(r1(("table", "fragmentation"))._2 === 1000000L,
        "one part per data shard after optimize")
      assert(r1(("table", "fragmentation"))._3 === "optimize")
      assert(r1(("table", "dv_deleted_rows"))._2 === 0L)
      assert(r1(("table", "snapshot_retention"))._2 === 1000000L,
        "expire_snapshots LAST trims to exactly the budget")
      assert(r1(("table", "sorted_provenance"))._2 === 0L)
      assert(r1(("table", "sorted_provenance"))._3 === "rewrite_sorted")
      // idempotence: the healed state fires nothing, moves nothing
      val r2 = run()
      assert(r2.values.forall(_._3 == "none"),
        s"second run executed something: ${r2.filter(_._2._3 != "none")}")
      r2.foreach { case (k, (before, after, _)) =>
        assert(before === after, s"$k moved on a no-op run")
        assert(before === r1(k)._2,
          s"$k: second-run state diverged from first-run after")
      }
    } finally
      spark.conf.unset("spark.graft.textIndex.maxBroadcastTombstones")
  }
}
