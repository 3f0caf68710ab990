package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted ANN index lifecycle ([[GraftLakeAnnIndex]]): build via
  * CALL, probe-side shard pruning, and the O(delta) `$changes` advance
  * — an append refreshes the index WITHOUT a corpus rescan, a delete
  * drops its assignment, and the quantizer stays put between builds. */
class LakeAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def muCsv(xs: Seq[Double]): String =
    xs.map(x => math.round(x * 1e6).toString).mkString(",")

  test("build_ann_index persists centroids + cell-sharded assignments; " +
      "refresh_ann_index advances from $changes O(delta) — appended " +
      "duplicates land in their twins' cells, deletes drop out, and " +
      "the source is never rescanned (CDF-bounded read)") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_annix_src"
    for (t <- Seq("spec_annix_src", "spec_annix_ix",
        "spec_annix_ix_centroids", "spec_annix_ix_codebooks",
        "spec_annix_ix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql(s"""CREATE TABLE $src (vec_id BIGINT, emb STRING)
      TBLPROPERTIES ('shard_key'='vec_id', 'n_shards'='2')""")
    // two well-separated blobs in 4-d: vectors 0..7 near (1,0,0,0),
    // 8..15 near (0,0,0,1) — k=2 Lloyd from vec_id<2 seeds converges
    // to one centroid per blob whatever the iteration count
    val rows = (0L until 16L).map { i =>
      val base = if (i < 8) Seq(1.0, 0.0, 0.0, 0.0)
                 else Seq(0.0, 0.0, 0.0, 1.0)
      val jit = base.zipWithIndex.map { case (b, j) =>
        b + 0.01 * ((i + j) % 5) }
      (i, muCsv(jit))
    }
    rows.toDF("vec_id", "emb").createOrReplaceTempView("spec_annix_v1")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_annix_v1")

    val built = spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_annix_src', index_table => 'spec_annix_ix',
      k => 2, iters => 2, pq_m => 2, pq_k => 4, pq_iters => 1)""").head
    assert(built.getInt(1) === 2, "two centroids")
    assert(built.getLong(2) === 16L, "sixteen assignments")
    assert(built.getInt(3) === 1, "built at source v1")

    val ix = spark.table("graft_lake.lake.spec_annix_ix")
    assert(ix.count() === 16L)
    // the two blobs land in two distinct cells, 8 vectors each
    val cells = ix.groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells.size === 2 && cells.values.forall(_ === 8L),
      s"expected two 8-member cells, got $cells")
    val cellOf = ix.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // probing one cell is a point-lookup-pruned scan: the assignment
    // table is SHARDED BY CELL, so 1 of 2 shards plans
    GraftLakeScanMetrics.reset()
    val c0 = cellOf(0L)
    assert(spark.sql(s"""SELECT count(*) AS n FROM
      graft_lake.lake.spec_annix_ix WHERE cell = $c0""")
      .head.getLong(0) === 8L)
    assert(GraftLakeScanMetrics.planned.get() === 1L,
      "a one-cell probe must plan exactly the cell's shard")

    // append EXACT DUPLICATES of vectors 0 and 8 under new ids, plus
    // delete vector 3 — then advance the index from $changes
    Seq((100L, rows(0)._2), (101L, rows(8)._2))
      .toDF("vec_id", "emb").createOrReplaceTempView("spec_annix_v2")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_annix_v2")
    spark.sql(s"DELETE FROM $src WHERE vec_id = 3")

    val ref = spark.sql("""CALL graft_lake.system.refresh_ann_index(
      index_table => 'spec_annix_ix')""").head
    assert(ref.getLong(0) === 1L && ref.getLong(1) === 3L,
      s"cursor must advance 1 -> 3, got $ref")
    assert(ref.getLong(2) === 2L, "two rows added")
    assert(ref.getLong(3) === 1L, "one row removed")

    val after = spark.table("graft_lake.lake.spec_annix_ix")
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size === 17, "16 - 1 deleted + 2 appended")
    assert(!after.contains(3L), "deleted vector must leave the index")
    assert(after(100L) === cellOf(0L) && after(101L) === cellOf(8L),
      "appended duplicates must assign to their twins' cells — the " +
        "quantizer must not move on refresh")
    // the PQ side is stable too: an exact duplicate encodes to its
    // twin's codes (same codebooks, no retrain on refresh)
    val codesOf = spark.table("graft_lake.lake.spec_annix_ix")
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(codesOf(100L) === codesOf(0L) &&
      codesOf(101L) === codesOf(8L),
      "appended duplicates must carry their twins' PQ codes")
    assert(spark.table("graft_lake.lake.spec_annix_ix_codebooks")
      .count() > 0L, "codebooks persisted")

    // a second refresh with nothing new is a no-op
    val noop = spark.sql("""CALL graft_lake.system.refresh_ann_index(
      index_table => 'spec_annix_ix')""").head
    assert(noop.getLong(2) === 0L && noop.getLong(3) === 0L)

    for (t <- Seq("spec_annix_src", "spec_annix_ix",
        "spec_annix_ix_centroids", "spec_annix_ix_codebooks",
        "spec_annix_ix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
  }

  test("refresh over a COMPOSITE-key equality-delete upsert source: " +
      "an upserted vector is re-assigned exactly once (the differ's " +
      "image pairing feeds the delta), inserts assign, and the " +
      "advance stays O(delta)") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_annup_src"
    val tables = Seq("spec_annup_src", "spec_annup_ix",
      "spec_annup_ix_centroids", "spec_annup_ix_codebooks",
      "spec_annup_ix_meta")
    tables.foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t"))
    // composite upsert key (vec_id, lang): real embedding stores key
    // on (entity, variant); every INSERT is an upsert — same key
    // replaces (update_preimage + update_postimage in $changes), new
    // key inserts
    spark.sql(s"""CREATE TABLE $src
      (vec_id BIGINT, lang STRING, emb STRING)
      TBLPROPERTIES ('shard_key'='vec_id', 'n_shards'='2',
        'write_upsert'='equality-delete',
        'upsert_keys'='vec_id,lang')""")
    val blobA = Seq(1.0, 0.0, 0.0, 0.0)
    val blobB = Seq(0.0, 0.0, 0.0, 1.0)
    def jit(base: Seq[Double], i: Long): String =
      muCsv(base.zipWithIndex.map { case (b, j) =>
        b + 0.01 * ((i + j) % 5) })
    (0L until 16L).map(i =>
        (i, "en", jit(if (i < 8) blobA else blobB, i)))
      .toDF("vec_id", "lang", "emb")
      .createOrReplaceTempView("spec_annup_v1")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_annup_v1")
    spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_annup_src', index_table => 'spec_annup_ix',
      k => 2, iters => 2, pq_m => 2, pq_k => 4, pq_iters => 1)""")
    val cellOf = spark.table("graft_lake.lake.spec_annup_ix")
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellOf.size === 16 && cellOf(0L) != cellOf(15L))

    // one UPSERT batch: vector 0 MOVES from blob A to blob B (same
    // composite key -> replace), vector 100 is new in blob A
    Seq((0L, "en", jit(blobB, 99L)), (100L, "en", jit(blobA, 100L)))
      .toDF("vec_id", "lang", "emb")
      .createOrReplaceTempView("spec_annup_v2")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_annup_v2")

    val ref = spark.sql("""CALL graft_lake.system.refresh_ann_index(
      index_table => 'spec_annup_ix')""").head
    // O(delta): the differ pairs vec 0's images (1 removed, 1 added)
    // and vec 100 inserts — 2 added, 1 removed, NOT a rescan of 17
    assert(ref.getLong(2) === 2L && ref.getLong(3) === 1L,
      s"expected added=2/removed=1, got $ref")

    val after = spark.table("graft_lake.lake.spec_annup_ix")
      .select("vec_id", "cell").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
      .toMap
    assert(after.size === 17, s"17 distinct vectors, got ${after.size}")
    assert(after.values.forall(_.size == 1),
      s"every vector assigned EXACTLY once, got " +
        s"${after.filter(_._2.size > 1)}")
    assert(after(0L).head === cellOf(15L),
      "the upserted vector must move to blob B's cell")
    assert(after(100L).head === cellOf(1L),
      "the inserted vector must land in blob A's cell")
    tables.foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t"))
  }

  test("index lifecycle: a drifted corpus trips the drift metric, " +
      "1-probe recall degrades against brute-force truth, " +
      "retrain_ann_index recovers it, and OPTIMIZE compacts the " +
      "refresh-appended assignment parts") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_annlc_src"
    val tables = Seq("spec_annlc_src", "spec_annlc_ix",
      "spec_annlc_ix_centroids", "spec_annlc_ix_codebooks",
      "spec_annlc_ix_meta")
    tables.foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t"))
    spark.sql(s"""CREATE TABLE $src (vec_id BIGINT, emb STRING)
      TBLPROPERTIES ('shard_key'='vec_id', 'n_shards'='2')""")

    // base corpus: cluster A (seed id 0) near (1,0,0,0), cluster B
    // (seed id 1) near (0,1,0,0); id 2 is RESERVED for the drift
    // cluster so a k=3 retrain seeds one centroid per true cluster
    def jitter(base: Seq[Double], i: Long): Seq[Double] =
      base.zipWithIndex.map { case (b, j) => b + 0.01 * ((i + j) % 5) }
    val clusterA = (Seq(0L) ++ (3L to 9L)).map(i =>
      i -> jitter(Seq(1.0, 0.0, 0.0, 0.0), i))
    val clusterB = (Seq(1L) ++ (10L to 16L)).map(i =>
      i -> jitter(Seq(0.0, 1.0, 0.0, 0.0), i))
    (clusterA ++ clusterB).map { case (i, v) => (i, muCsv(v)) }
      .toDF("vec_id", "emb").createOrReplaceTempView("spec_annlc_v1")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_annlc_v1")
    spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_annlc_src', index_table => 'spec_annlc_ix',
      k => 2, iters => 2, pq_m => 2, pq_k => 4, pq_iters => 1)""")
    val base = spark.sql("""CALL graft_lake.system.ann_index_drift(
      index_table => 'spec_annlc_ix')""").head
    assert(math.abs(base.getDouble(2) - 1.0) < 1e-9,
      "freshly built: live fit == build fit")

    // DRIFT: cluster C far from both centroids at (0,0,5,5)-ish;
    // even-t members lean toward A's centroid, odd-t toward B's, so
    // the refresh splits C across the two stale cells and the true
    // top-4 for a C-centered query interleaves both halves
    val clusterC = (0 until 16).map { t =>
      val id = if (t == 0) 2L else 99L + t
      val (a, b) = if (t % 2 == 0) (0.2, 0.0) else (0.0, 0.2)
      id -> Seq(a, b, 5.0 + 0.01 * t, 5.0)
    }
    clusterC.map { case (i, v) => (i, muCsv(v)) }
      .toDF("vec_id", "emb").createOrReplaceTempView("spec_annlc_v2")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_annlc_v2")
    spark.sql("""CALL graft_lake.system.refresh_ann_index(
      index_table => 'spec_annlc_ix')""")

    val drifted = spark.sql("""CALL graft_lake.system.ann_index_drift(
      index_table => 'spec_annlc_ix')""").head
    assert(drifted.getDouble(2) > 10.0,
      s"16 far vectors in stale cells must trip the metric, " +
        s"got ratio ${drifted.getDouble(2)}")

    // 1-probe top-4 vs driver-computed brute truth (48 vectors)
    val qv = Seq(0.0, 0.0, 5.0, 5.0)
    def d2(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).map { case (u, w) => (u - w) * (u - w) }.sum
    val all = (clusterA ++ clusterB ++ clusterC).toMap
    val truth = all.toSeq.sortBy { case (i, v) => (d2(v, qv), i) }
      .take(4).map(_._1).toSet
    def probeTop4(): Set[Long] = {
      val cents = spark
        .table("graft_lake.lake.spec_annlc_ix_centroids")
        .collect().map(r => r.getLong(0) ->
          r.getString(1).split(",").map(_.toDouble / 1e6).toSeq)
      val cell = cents.minBy { case (c, v) => (d2(v, qv), c) }._1
      spark.sql(s"""SELECT vec_id, emb FROM graft_lake.lake.spec_annlc_ix
          WHERE cell = $cell""").collect()
        .map(r => r.getLong(0) ->
          r.getString(1).split(",").map(_.toDouble / 1e6).toSeq)
        .sortBy { case (i, v) => (d2(v, qv), i) }
        .take(4).map(_._1).toSet
    }
    val before = probeTop4()
    assert((before & truth).size === 2,
      s"pre-retrain 1-probe must miss the other stale cell's half: " +
        s"got $before vs truth $truth")

    // RETRAIN with k=3 (the corpus outgrew two cells): seeds 0/1/2
    // land one per true cluster, so the drift cluster gets its own
    // centroid and 1-probe recall recovers
    val rt = spark.sql("""CALL graft_lake.system.retrain_ann_index(
      index_table => 'spec_annlc_ix', k => 3)""").head
    assert(rt.getInt(1) === 3 && rt.getLong(2) === 32L,
      s"retrain must reassign all 32 vectors under 3 centroids: $rt")
    assert(probeTop4() === truth,
      "post-retrain the drift cluster is one cell — 1-probe is exact")
    val recovered = spark.sql("""CALL graft_lake.system.ann_index_drift(
      index_table => 'spec_annlc_ix')""").head
    assert(math.abs(recovered.getDouble(2) - 1.0) < 1e-9,
      "retrain resets the drift baseline")

    // OPTIMIZE compacts multi-part assignment shards (refresh appends
    // fragment them); probe results are unchanged
    spark.sql("""CALL graft_lake.system.refresh_ann_index(
      index_table => 'spec_annlc_ix')""") // no-op advance (cursor)
    Seq((300L, muCsv(Seq(0.21, 0.0, 5.2, 5.0))))
      .toDF("vec_id", "emb").createOrReplaceTempView("spec_annlc_v3")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_annlc_v3")
    spark.sql("""CALL graft_lake.system.refresh_ann_index(
      index_table => 'spec_annlc_ix')""")
    def maxParts(): Long = spark.sql(
      """SELECT max(cnt) FROM (SELECT shard, count(*) AS cnt
         FROM graft_lake.lake.`spec_annlc_ix$files` GROUP BY shard)""")
      .head.getLong(0)
    assert(maxParts() > 1L, "refresh append must have fragmented")
    val pre = probeTop4()
    spark.sql("""CALL graft_lake.system.optimize(
      table => 'spec_annlc_ix', max_parts => 1)""")
    assert(maxParts() === 1L, "OPTIMIZE must compact to one part")
    assert(probeTop4() === pre, "compaction never changes results")

    tables.foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t"))
  }

  test("filtered ANN expands the cell walk until the survivors reach " +
      "k: a filter more selective than one cell returns EVERY " +
      "survivor in true cosine order — recall cannot silently drop") {
    Lake.registerCatalog(spark)
    val ix = Lake.annIndexFixture(spark, sf)
    // 4 survivors out of 500 candidates — fewer than k=5, so the walk
    // must keep EVERY cell holding one, whatever the quantizer did
    val keep = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(expr("vec_id % 149 = 0")).select("vec_id")
    val nKeep = keep.count()
    assert(nKeep === 4L, s"fixture assumption: $nKeep survivors")
    val got = Lake.annFilteredTopkOver(spark, sf, ix, keep, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // every query surfaces all 4 survivors (no truncated-cell recall
    // hole), ranked by the TRUE cosine — computed brute-force here
    // from the same µ-quantized vectors
    val mu = """transform(embedding, x ->
      CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
      AS DOUBLE) / CAST(1000000 AS DOUBLE))"""
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .selectExpr("vec_id AS q_id", s"$mu AS q_sv")
      .selectExpr("q_id", "q_sv", "graft_dot(q_sv, q_sv) AS q_xx")
    val c = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(expr("vec_id % 149 = 0"))
      .selectExpr("vec_id AS c_id", s"$mu AS c_sv")
      .selectExpr("c_id", "c_sv", "graft_dot(c_sv, c_sv) AS c_xx")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    val brute = q.crossJoin(c)
      .selectExpr("q_id", "c_id",
        "graft_dot(q_sv, c_sv) / (sqrt(q_xx) * sqrt(c_xx)) AS cos_sim")
      .withColumn("rank", row_number().over(w).cast("long"))
      .selectExpr("q_id", "rank", "c_id", "round(cos_sim, 6) AS cos_sim")
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length === 40, // 10 queries × all 4 survivors
      s"expected every survivor for every query, got ${got.length}")
    assert(got.toSeq === brute.toSeq,
      "filtered walk diverged from the brute filtered ranking")
  }
}
