package graft.sources

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Storage-partitioned joins over the lake catalog (SPARK-37375): two
  * tables hash-sharded the same way join with ZERO exchanges — Spark
  * matches the scans' reported `bucket(nShards, shardKey)` transforms
  * through [[GraftBucketFunction]] and aligns partitions by shard id.
  * The negative twins pin the soundness gate: a different shard
  * count, or a side whose routing provenance is not pure
  * `hash:<nShards>` (range clustering), must fall back to a shuffled
  * plan with identical results — never a wrong co-partitioning
  * claim. */
class LakeSpjSpec extends SparkSpec {

  /** ISOLATED session: these tests disable auto-broadcast to force
    * the shuffle-or-SPJ decision, and the shared session's conf is
    * visible to concurrently-running suites (RegistryGuardSpec's
    * plan lint would see cross/theta queries degrade to
    * CartesianProduct). newSession shares the context and the lake
    * path but keeps its own SQL conf. */
  private lazy val ss: org.apache.spark.sql.SparkSession = {
    val n = spark.newSession()
    Lake.registerCatalog(n)
    n.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    n
  }

  private def mk(tbl: String, props: String, hi: Long): Unit = {
    ss.sql(s"DROP TABLE IF EXISTS $tbl")
    ss.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ($props)""")
    ss.sql(s"""INSERT INTO $tbl
      SELECT id AS user_id, id * 10 AS v FROM range(0, $hi)""")
  }

  /** Executed plan string AFTER an action, so AQE has finalized it. */
  private def finalPlan(df: DataFrame): String = {
    df.collect(): Unit
    df.queryExecution.executedPlan.toString
  }

  // no ORDER BY: a global sort adds its own (legitimate) range
  // exchange, and the assertion must isolate the JOIN's exchanges
  private def joined(a: String, b: String): DataFrame =
    ss.sql(s"""SELECT a.user_id, a.v AS va, b.v AS vb
      FROM $a a JOIN $b b ON a.user_id = b.user_id""")

  private def expect(df: DataFrame, n: Int): Unit = {
    val rows = df.collect()
    assert(rows.length === n)
    assert(rows.map(_.getLong(0)).sorted.toSeq ===
      (0L until n.toLong))
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) * 10)
      assert(r.getLong(2) === r.getLong(0) * 10)
    }
  }

  test("co-sharded lake tables join with no exchange on either side " +
      "(storage-partitioned join), result row-exact") {
    val a = "graft_lake.lake.spj_a"
    val b = "graft_lake.lake.spj_b"
    mk(a, "'shard_key'='user_id', 'n_shards'='8'", 64)
    mk(b, "'shard_key'='user_id', 'n_shards'='8'", 64)
    val df = joined(a, b)
    val p = finalPlan(df)
    assert(!p.contains("Exchange"),
      s"expected a storage-partitioned join (no Exchange) in:\n$p")
    expect(df, 64)
  }

  test("SPJ survives shard pruning on one side: a point-lookup IN " +
      "filter prunes shards, pushPartValues aligns the sides, still " +
      "no exchange") {
    val a = "graft_lake.lake.spj_pa"
    val b = "graft_lake.lake.spj_pb"
    mk(a, "'shard_key'='user_id', 'n_shards'='8'", 64)
    mk(b, "'shard_key'='user_id', 'n_shards'='8'", 64)
    val df = ss.sql(s"""SELECT a.user_id, a.v AS va, b.v AS vb
      FROM $a a JOIN $b b ON a.user_id = b.user_id
      WHERE a.user_id IN (3, 11)""")
    val p = finalPlan(df)
    assert(!p.contains("Exchange"),
      s"expected pruned SPJ (no Exchange) in:\n$p")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(3L, 11L))
    rows.foreach(r => assert(r.getLong(1) === r.getLong(0) * 10 &&
      r.getLong(2) === r.getLong(0) * 10))
  }

  test("different shard counts do NOT claim co-partitioning: the " +
      "join shuffles and the result is identical") {
    val a = "graft_lake.lake.spj_m8"
    val b = "graft_lake.lake.spj_m4"
    mk(a, "'shard_key'='user_id', 'n_shards'='8'", 64)
    mk(b, "'shard_key'='user_id', 'n_shards'='4'", 64)
    val df = joined(a, b)
    val p = finalPlan(df)
    assert(p.contains("Exchange"),
      s"mismatched bucket counts must shuffle:\n$p")
    expect(df, 64)
  }

  test("one-sided SPJ: a plain in-memory side is shuffled WITH the " +
      "lake's bucket function while the lake side stays " +
      "exchange-free") {
    val a = "graft_lake.lake.spj_one"
    mk(a, "'shard_key'='user_id', 'n_shards'='8'", 64)
    ss.range(0, 64).selectExpr("id AS user_id", "id * 7 AS w")
      .createOrReplaceTempView("spj_plain_side")
    val df = ss.sql(s"""SELECT a.user_id, a.v, p.w
      FROM $a a JOIN spj_plain_side p ON a.user_id = p.user_id""")
    // AdaptiveSparkPlan.toString prints Final AND Initial sections;
    // count exchanges in the FINAL plan only
    val p = finalPlan(df).split("== Initial Plan ==")(0)
    // exactly ONE exchange — the plain side's — and it hashes with
    // the catalog function (KeyGroupedPartitioning over the bucket
    // transform), not Spark's generic hashpartitioning
    assert("Exchange".r.findAllIn(p).length === 1,
      s"expected exactly one exchange (plain side only) in:\n$p")
    assert(p.contains("keygroupedpartitioning"),
      s"the shuffle must target the lake's reported partitioning:" +
        s"\n$p")
    assert(!p.contains("hashpartitioning"),
      s"the shuffle must use the lake's bucket function, not " +
        s"generic hash:\n$p")
    val rows = df.collect()
    assert(rows.length === 64)
    rows.foreach(r => assert(r.getLong(1) === r.getLong(0) * 10 &&
      r.getLong(2) === r.getLong(0) * 7))
  }

  test("dynamic partition pruning on the shard key: a broadcast dim " +
      "filtered to two keys runtime-prunes the lake fact to the " +
      "shards those keys route to") {
    // DPP rides the broadcast-exchange reuse path, so this test runs
    // on the SHARED session with the default broadcast threshold (it
    // toggles no conf — safe for concurrent suites); the fixture
    // table is still created through ss (same lake path)
    Lake.registerCatalog(spark)
    val a = "graft_lake.lake.spj_dpp"
    mk(a, "'shard_key'='user_id', 'n_shards'='8'", 64)
    spark.range(0, 64)
      .selectExpr("id AS user_id",
        "CASE WHEN id IN (5, 12) THEN 'hot' ELSE 'cold' END AS t")
      .createOrReplaceTempView("spj_dpp_dim")
    val df = spark.sql(s"""SELECT a.user_id, a.v
      FROM $a a JOIN spj_dpp_dim p
        ON a.user_id = p.user_id AND p.t = 'hot'""")
    val p = finalPlan(df)
    assert(p.contains("dynamicpruning") ||
      p.contains("RuntimeFilters: [user_id"),
      s"expected a runtime filter on the lake scan in:\n$p")
    assert(p.contains("runtimeFiltered=true"),
      s"the lake scan must have applied the runtime filter:\n$p")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(5L, 12L))
    rows.foreach(r => assert(r.getLong(1) === r.getLong(0) * 10))
  }

  test("range-clustered routing provenance refuses the hash claim: " +
      "scan reports UnknownPartitioning, join shuffles, result " +
      "identical") {
    val a = "graft_lake.lake.spj_r"
    val b = "graft_lake.lake.spj_h"
    // same n_shards, but `a` routes by RANGE (shard_width): its
    // shards are NOT bucket(8, key) groups, so claiming so would
    // co-locate wrong rows — the routing tag gate must refuse
    mk(a, "'shard_key'='user_id', 'n_shards'='8', 'shard_width'='8'",
      64)
    mk(b, "'shard_key'='user_id', 'n_shards'='8'", 64)
    val df = joined(a, b)
    val p = finalPlan(df)
    assert(p.contains("Exchange"),
      s"range-clustered side must not claim bucket layout:\n$p")
    expect(df, 64)
  }
}
