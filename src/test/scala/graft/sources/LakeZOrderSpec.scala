package graft.sources

import graft.SparkSpec

/** Z-value clustering: routing a lake table by
  * `graft_zvalue(xcell, ycell)` with range clustering gives every
  * shard a contiguous Z-range — a bounded rectangle set in (x, y)
  * space — so the per-shard zone maps on BOTH original columns
  * become selective and a 2-D range predicate skips shards that a
  * 1-D layout must read. */
class LakeZOrderSpec extends SparkSpec {

  test("graft_zvalue semantics: interleave, clamping, null " +
      "propagation — and codegen compiles (CODEGEN_ONLY)") {
    val r = spark.sql(
      """SELECT graft_zvalue(5L, 3L) AS z1,
                graft_zvalue(0L, 0L) AS z2,
                graft_zvalue(-7L, 2L) AS zneg,
                graft_zvalue(CAST(NULL AS BIGINT), 1L) AS zn""").head
    assert(r.getLong(0) === 27L) // spread(5)=17 | spread(3)<<1=10
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === graft.plans.ZValue.interleave(0L, 2L))
    assert(r.isNullAt(3))
    // monotone in each dimension at fixed other coordinate
    assert(graft.plans.ZValue.interleave(4L, 9L) <
      graft.plans.ZValue.interleave(5L, 9L))
    assert(graft.plans.ZValue.interleave(4L, 9L) <
      graft.plans.ZValue.interleave(4L, 10L))
    val ns = spark.newSession()
    ns.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    ns.conf.set("spark.sql.codegen.fallback", "false")
    assert(ns.sql("SELECT graft_zvalue(12345678901L, 7L)").head
      .getLong(0) ===
      graft.plans.ZValue.interleave(12345678901L, 7L))
  }

  test("z-clustered layout: a 2-D range predicate plans 1 of 8 " +
      "shards (both columns' zone maps selective); the same data " +
      "hash-sharded reads everything") {
    Lake.registerCatalog(spark)
    // one row per cell of a 32x32 grid; z in [0, 1024)
    spark.range(0, 1024).selectExpr(
      "graft_zvalue(id % 32, CAST(id / 32 AS BIGINT)) AS zkey",
      "id % 32 AS xb", "CAST(id / 32 AS BIGINT) AS yb")
      .createOrReplaceTempView("spec_zord_src")
    val z = "graft_lake.lake.spec_zord"
    spark.sql(s"DROP TABLE IF EXISTS $z")
    spark.sql(s"""CREATE TABLE $z (zkey BIGINT, xb BIGINT, yb BIGINT)
      TBLPROPERTIES ('shard_key'='zkey', 'n_shards'='8',
        'shard_width'='128')""")
    spark.sql(s"INSERT INTO $z SELECT * FROM spec_zord_src")
    // the rectangle x in [4,7], y in [8,11] has z in [144,159] —
    // entirely inside shard 1 ([128,256))
    GraftLakeScanMetrics.reset()
    val got = spark.sql(s"""SELECT xb, yb FROM $z
        WHERE xb BETWEEN 4 AND 7 AND yb BETWEEN 8 AND 11""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.length === 16)
    assert(got.toSeq === (for (y <- 8L to 11L; x <- 4L to 7L)
      yield (x, y)).sorted)
    assert(GraftLakeScanMetrics.planned.get() === 1L,
      s"z-layout must confine the rectangle to one shard, planned=" +
        s"${GraftLakeScanMetrics.planned.get()}")
    assert(GraftLakeScanMetrics.skippedByStats.get() === 7L)
    // hash twin: same rows, same predicate, nothing skippable
    val h = "graft_lake.lake.spec_zord_hash"
    spark.sql(s"DROP TABLE IF EXISTS $h")
    spark.sql(s"""CREATE TABLE $h (zkey BIGINT, xb BIGINT, yb BIGINT)
      TBLPROPERTIES ('shard_key'='zkey', 'n_shards'='8')""")
    spark.sql(s"INSERT INTO $h SELECT * FROM spec_zord_src")
    GraftLakeScanMetrics.reset()
    val got2 = spark.sql(s"""SELECT xb, yb FROM $h
        WHERE xb BETWEEN 4 AND 7 AND yb BETWEEN 8 AND 11""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got2.toSeq === got.toSeq)
    assert(GraftLakeScanMetrics.skippedByStats.get() === 0L,
      "hash layout interleaves cells into every shard — no skips")
  }
}
