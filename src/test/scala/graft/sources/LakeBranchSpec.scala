package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Branch / write-audit-publish lifecycle: the isolation window (main
  * readers never see unpublished branch commits), branch resolution
  * (`spark.graft.lake.branch` session pin + `VERSION AS OF 'name'`),
  * the squashed fast-forward publish, and both conflict paths — a
  * publish racing a main commit refuses, and two branch writers race
  * under the branch's own CAS exactly like main writers. */
class LakeBranchSpec extends SparkSpec {
  import spark.implicits._

  private def counts(tbl: String): Map[Long, Long] =
    spark.table(tbl).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("write-audit-publish: branch commits are invisible to main " +
      "until fast_forward, readable via the branch pin and VERSION " +
      "AS OF '<branch>'; publish is one squashed main commit") {
    Lake.registerCatalog(spark)
    val name = "spec_wap"
    val tbl = s"graft_lake.lake.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 10), (2, 20)")

    val forked = spark.sql(s"""CALL graft_lake.system.create_branch(
      table => '$name', branch => 'audit')""").head
    assert(forked.getInt(1) === 1, "branch forks at main v1")

    // two branch commits under the session pin
    spark.conf.set("spark.graft.lake.branch", "audit")
    try {
      spark.sql(s"INSERT INTO $tbl VALUES (3, 30)")
      spark.sql(s"UPDATE $tbl SET n_events = 99 WHERE user_id = 1")
      // pinned session sees the branch state
      assert(counts(tbl) === Map(1L -> 99L, 2L -> 20L, 3L -> 30L))
    } finally spark.conf.unset("spark.graft.lake.branch")

    // main is UNTOUCHED pre-publish; the branch is readable by name
    assert(counts(tbl) === Map(1L -> 10L, 2L -> 20L))
    assert(spark.sql(
      s"SELECT user_id, n_events FROM $tbl VERSION AS OF 'audit'")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 99L, 2L -> 20L, 3L -> 30L))

    // publish: ONE squashed commit (v1 -> v2), branch dropped
    val head = spark.sql(s"""CALL graft_lake.system.fast_forward(
      table => '$name', branch => 'audit')""").head.getInt(0)
    assert(head === 2, "two branch commits squash to one main commit")
    assert(counts(tbl) === Map(1L -> 99L, 2L -> 20L, 3L -> 30L))
    // pre-publish state survives as ordinary history
    assert(spark.sql(s"SELECT user_id FROM $tbl VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'audit'").collect()
    }
    spark.sql(s"DROP TABLE $tbl")
  }

  test("tags and version ids are MAIN-history coordinates even under " +
      "a branch pin; the ref namespace refuses tag/branch collisions") {
    Lake.registerCatalog(spark)
    val name = "spec_wap_refs"
    val tbl = s"graft_lake.lake.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 10)")
    spark.sql(s"INSERT INTO $tbl VALUES (2, 20)")
    val dataDir = new java.io.File(
      spark.conf.get("spark.sql.catalog.graft_lake.path"), name).getPath
    GraftLakeIO.createTag(dataDir, "v1tag", 1)
    spark.sql(s"""CALL graft_lake.system.create_branch(
      table => '$name', branch => 'audit')""")
    // a tag may not shadow (or be shadowed by) a live branch
    val clash = intercept[Exception] {
      GraftLakeIO.createTag(dataDir, "audit", 1)
    }
    assert(clash.getMessage.contains("names a branch"))
    spark.conf.set("spark.graft.lake.branch", "audit")
    try {
      // branch moves past main's history length
      spark.sql(s"INSERT INTO $tbl VALUES (3, 30)")
      spark.sql(s"INSERT INTO $tbl VALUES (4, 40)")
      assert(counts(tbl).keySet === Set(1L, 2L, 3L, 4L))
      // the TAG resolves against MAIN's history, not the branch's
      assert(spark.sql(
        s"SELECT user_id FROM $tbl VERSION AS OF 'v1tag'")
        .collect().map(_.getLong(0)).toSet === Set(1L),
        "tag must pin main's v1 even while the session pins a branch")
      // an explicit version id too (main head = v2: keys 1, 2 — the
      // branch's v4 would include 3 and 4)
      assert(spark.sql(s"SELECT user_id FROM $tbl VERSION AS OF 2")
        .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
      // a main-history id past main's head refuses loudly instead of
      // silently reading the branch's v4
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $tbl VERSION AS OF 4").collect()
      }
    } finally spark.conf.unset("spark.graft.lake.branch")
    spark.sql(s"""CALL graft_lake.system.drop_branch(
      table => '$name', branch => 'audit')""")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("conflict paths: fast_forward refuses when main moved since " +
      "the fork; a branch commit built on a stale branch base " +
      "CAS-conflicts instead of clobbering") {
    Lake.registerCatalog(spark)
    val name = "spec_wap_race"
    val tbl = s"graft_lake.lake.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 10)")
    spark.sql(s"""CALL graft_lake.system.create_branch(
      table => '$name', branch => 'audit')""")
    spark.conf.set("spark.graft.lake.branch", "audit")
    try spark.sql(s"INSERT INTO $tbl VALUES (2, 20)")
    finally spark.conf.unset("spark.graft.lake.branch")
    // main commits while the branch is in flight (allowed — refs are
    // independent)…
    spark.sql(s"INSERT INTO $tbl VALUES (9, 90)")
    // …but the publish must now REFUSE, not clobber the main commit
    val e = intercept[Exception] {
      spark.sql(s"""CALL graft_lake.system.fast_forward(
        table => '$name', branch => 'audit')""")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("fast-forward") ||
        Option(e.getCause).exists(
          _.getMessage.contains("fast-forward"))),
      s"expected the fast-forward conflict, got: $e")
    // main kept its commit; the branch still has its own
    assert(counts(tbl) === Map(1L -> 10L, 9L -> 90L))
    assert(spark.sql(
      s"SELECT user_id FROM $tbl VERSION AS OF 'audit'")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))

    // stale-base branch commit: race two writers INTO THE BRANCH —
    // the branch dir runs the same CAS as main
    val dataDir = new java.io.File(
      spark.conf.get("spark.sql.catalog.graft_lake.path"), name)
    val bdir = GraftLakeIO.branchDir(dataDir.getPath, "audit").getPath
    val base = GraftLakeIO.latestVersion(bdir)
    val b1 = GraftLakeIO.newBuildDir(bdir)
    GraftLakeIO.writeCommitMeta(b1,
      GraftLakeIO.nextCommitStamp(bdir, base), "insert")
    val b2 = GraftLakeIO.newBuildDir(bdir)
    GraftLakeIO.writeCommitMeta(b2,
      GraftLakeIO.nextCommitStamp(bdir, base), "insert")
    GraftLakeIO.commitVersion(bdir, base, b1)
    intercept[GraftLakeCommitConflict] {
      GraftLakeIO.commitVersion(bdir, base, b2)
    }
    spark.sql(s"""CALL graft_lake.system.drop_branch(
      table => '$name', branch => 'audit')""")
    spark.sql(s"DROP TABLE $tbl")
  }
}
