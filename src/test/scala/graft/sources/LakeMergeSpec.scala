package graft.sources

import java.io.File

import graft.SparkSpec

/** Pins the row-level-operation connector ([[GraftLakeTable]]): SQL
  * MERGE INTO planned by Spark's group-based rewrite must update
  * matched rows, carry unmatched target rows of affected groups,
  * insert new rows (including into groups the scan never read — the
  * append-not-clobber path), and leave untouched groups' shard files
  * BYTE-IDENTICAL (runtime group filtering pruned them out of the
  * read, so the commit must not rewrite them). DELETE and UPDATE ride
  * the same machinery. */
class LakeMergeSpec extends SparkSpec {

  private def ddl(tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, cohort_d DATE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    spark.sql(s"""INSERT INTO $tbl VALUES
      (0, DATE '2024-03-01'), (1, DATE '2024-03-01'),
      (2, DATE '2024-03-01'), (3, DATE '2024-03-01'),
      (4, DATE '2024-03-01'), (5, DATE '2024-03-01'),
      (6, DATE '2024-03-01'), (7, DATE '2024-03-01')""")
  }

  private def lakeRoot: File = {
    Lake.registerCatalog(spark)
    new File(spark.conf.get("spark.sql.catalog.graft_lake.path"))
  }

  /** Shard files of the LATEST published version (identity = (length,
    * mtime): an untouched shard carried by hardlink keeps both). */
  private def snapshot(dir: File): Map[String, (Long, Long)] = {
    val vdir = GraftLakeIO.versionDir(dir.getPath,
      GraftLakeIO.latestVersion(dir.getPath))
    Option(vdir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  private def rows(tbl: String): Map[Long, String] =
    spark.sql(s"SELECT user_id, cohort_d FROM $tbl ORDER BY user_id")
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap

  test("MERGE INTO: update keeps min, carry-over intact, inserts land " +
      "in read AND unread groups, untouched groups byte-identical") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_merge"
    ddl(tbl)
    val dir = new File(lakeRoot, "spec_merge")
    val before = snapshot(dir)
    assert(before.keySet === Set("shard-0.parquet", "shard-1.parquet",
      "shard-2.parquet", "shard-3.parquet"))
    // source touches shard 1 (keys 1, 5, new 9) and inserts key 10
    // into shard 2 — whose target rows match nothing, so the group
    // filter need not read it
    spark.sql(s"""MERGE INTO $tbl t USING (
        SELECT * FROM VALUES
          (1L, DATE '2024-02-15'), (5L, DATE '2024-03-20'),
          (9L, DATE '2024-03-05'), (10L, DATE '2024-03-06')
          AS src(user_id, cohort_d)) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET cohort_d = least(t.cohort_d, s.cohort_d)
      WHEN NOT MATCHED THEN INSERT (user_id, cohort_d)
        VALUES (s.user_id, s.cohort_d)""")
    val after = snapshot(dir)
    val got = rows(tbl)
    assert(got(1L) === "2024-02-15") // matched, earlier day won
    assert(got(5L) === "2024-03-01") // matched, existing min kept
    assert(got(9L) === "2024-03-05" && got(10L) === "2024-03-06")
    assert(got.size === 10 &&
      Seq(0L, 2L, 3L, 4L, 6L, 7L).forall(got(_) == "2024-03-01"))
    // groups 0 and 3 were neither matched nor inserted into: the
    // runtime group filter must have kept them out of the rewrite
    assert(after("shard-0.parquet") === before("shard-0.parquet"),
      "shard 0 was rewritten despite no match/insert")
    assert(after("shard-3.parquet") === before("shard-3.parquet"),
      "shard 3 was rewritten despite no match/insert")
    assert(after("shard-1.parquet") !== before("shard-1.parquet"))
    // shard 2 got ONLY an append (key 10 joined carried content — its
    // original rows 2 and 6 must survive even though the group may
    // never have been read)
    assert(got(2L) === "2024-03-01" && got(6L) === "2024-03-01")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("MERGE is idempotent under least(): re-merging the same batch " +
      "changes nothing") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_idem"
    ddl(tbl)
    val m = s"""MERGE INTO $tbl t USING (
        SELECT * FROM VALUES (1L, DATE '2024-02-15'), (9L, DATE '2024-03-05')
          AS src(user_id, cohort_d)) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET cohort_d = least(t.cohort_d, s.cohort_d)
      WHEN NOT MATCHED THEN INSERT (user_id, cohort_d)
        VALUES (s.user_id, s.cohort_d)"""
    spark.sql(m)
    val once = rows(tbl)
    spark.sql(m)
    assert(rows(tbl) === once)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("DELETE and UPDATE ride the same row-level machinery") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_dml"
    ddl(tbl)
    spark.sql(s"DELETE FROM $tbl WHERE user_id = 3")
    assert(!rows(tbl).contains(3L) && rows(tbl).size === 7)
    spark.sql(
      s"UPDATE $tbl SET cohort_d = DATE '2024-01-01' WHERE user_id = 0")
    assert(rows(tbl)(0L) === "2024-01-01")
    assert(rows(tbl)(4L) === "2024-03-01") // same shard, untouched row
    spark.sql(s"DROP TABLE $tbl")
  }

  test("time travel: VERSION AS OF returns immutable history, " +
      "TIMESTAMP AS OF resolves between commits, v0 is empty") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_tt"
    ddl(tbl) // version 1 = the 8-row insert
    val v1 = rows(tbl)
    spark.sql(s"""MERGE INTO $tbl t USING (
        SELECT * FROM VALUES (1L, DATE '2024-02-15'), (9L, DATE '2024-03-05')
          AS src(user_id, cohort_d)) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET cohort_d = least(t.cohort_d, s.cohort_d)
      WHEN NOT MATCHED THEN INSERT (user_id, cohort_d)
        VALUES (s.user_id, s.cohort_d)""") // version 2
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 0").count() === 0)
    val v1Again = spark.sql(
      s"SELECT user_id, cohort_d FROM $tbl VERSION AS OF 1")
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    assert(v1Again === v1, "published version 1 changed after the merge")
    val head = rows(tbl)
    assert(head(1L) === "2024-02-15" && head.contains(9L))
    // TIMESTAMP AS OF between the two commits resolves version 1
    val dir = new File(lakeRoot, "spec_tt").getPath
    val betweenMicros = GraftLakeIO.commitMicros(dir, 1)
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(betweenMicros / 1000000L,
        (betweenMicros % 1000000L) * 1000L))
    val byTs = spark.sql(
      s"SELECT user_id, cohort_d FROM $tbl TIMESTAMP AS OF '$ts'")
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    assert(byTs === v1, s"TIMESTAMP AS OF '$ts' did not resolve v1")
    // a time-travel snapshot is read-only (no write capability, and
    // the write/row-level entry points refuse outright)
    val cat = spark.sessionState.catalogManager.catalog("graft_lake")
      .asInstanceOf[GraftLakeCatalog]
    val pinned = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "spec_tt"), "1")
    assert(!pinned.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_WRITE))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("expire_snapshots drops old versions (hardlink-safe), keeps " +
      "the head readable, and expired time travel fails loudly") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_expire"
    ddl(tbl) // v1
    spark.sql(
      s"UPDATE $tbl SET cohort_d = DATE '2024-01-01' WHERE user_id = 0") // v2
    spark.sql(s"DELETE FROM $tbl WHERE user_id = 7") // v3
    val head = rows(tbl)
    val dir = new File(lakeRoot, "spec_expire").getPath
    val remaining = GraftLakeIO.expireSnapshots(dir, keep = 1)
    assert(remaining === Seq(3))
    // head still fully readable after expiry — retained version's
    // hardlinked shards survived the deletion of their old names
    assert(rows(tbl) === head && head.size === 7)
    assert(head(0L) === "2024-01-01")
    // expired versions refuse loudly instead of serving empty scans
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1").collect()
    }
    def msgs(t: Throwable): String =
      Option(t).map(x => x.getMessage + msgs(x.getCause)).getOrElse("")
    assert(msgs(e).contains("expired"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("DataFrame-level mergeInto API incl. WHEN NOT MATCHED BY " +
      "SOURCE DELETE — the full three-branch MERGE") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, least}
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_api"
    ddl(tbl) // keys 0..7
    Seq((1L, java.sql.Date.valueOf("2024-02-15")),
      (9L, java.sql.Date.valueOf("2024-03-05")))
      .toDF("user_id", "cohort_d").as("s")
      .mergeInto(tbl, expr("spec_api.user_id = s.user_id"))
      .whenMatched()
      .update(Map("cohort_d" ->
        least(expr("spec_api.cohort_d"), expr("s.cohort_d"))))
      .whenNotMatched().insertAll()
      .whenNotMatchedBySource().delete()
      .merge()
    // only source keys survive: 1 updated to the earlier day, 9
    // inserted, every unmatched target row deleted across all shards
    assert(rows(tbl) === Map(1L -> "2024-02-15", 9L -> "2024-03-05"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("optimistic concurrency: a commit built on a stale snapshot " +
      "fails with a conflict instead of clobbering") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_cas"
    ddl(tbl) // v1
    val dir = new File(lakeRoot, "spec_cas").getPath
    assert(GraftLakeIO.latestVersion(dir) === 1)
    // a "concurrent writer" publishes v2 while our commit (built on
    // base v1) is still staging
    val v2 = GraftLakeIO.versionDir(dir, 2)
    v2.mkdirs()
    GraftLakeIO.publish(dir, 2)
    val e = intercept[GraftLakeCommitConflict] {
      GraftLakeIO.publishCas(dir, expectedBase = 1, v = 2)
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the table still points at the winner's version — nothing clobbered
    assert(GraftLakeIO.latestVersion(dir) === 2)
    // and a commit built on the CURRENT head goes through
    GraftLakeIO.versionDir(dir, 3).mkdirs()
    GraftLakeIO.publishCas(dir, expectedBase = 2, v = 3)
    assert(GraftLakeIO.latestVersion(dir) === 3)
    // the lock is RELEASED either way (the lock file itself persists —
    // it's an OS FileLock now, freed on release and on process death;
    // deleting the file would break cross-process mutual exclusion)
    GraftLakeIO.withCommitLock(dir) { () } // acquirable ⇒ released
    spark.sql(s"DROP TABLE $tbl")
  }

  test("commit race: two writers from the same base — loser conflicts " +
      "and can never delete the winner's published snapshot") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_race"
    ddl(tbl) // v1
    val dir = new File(lakeRoot, "spec_race").getPath
    assert(GraftLakeIO.latestVersion(dir) === 1)
    // both writers build from base v1 in their OWN build dirs
    val buildA = GraftLakeIO.newBuildDir(dir)
    val buildB = GraftLakeIO.newBuildDir(dir)
    assert(buildA.getPath !== buildB.getPath)
    java.nio.file.Files.writeString(
      new File(buildA, "shard-0.parquet").toPath,
      """{"user_id":100,"cohort_d":19000}""" + "\n")
    java.nio.file.Files.writeString(
      new File(buildB, "shard-0.parquet").toPath,
      """{"user_id":200,"cohort_d":19001}""" + "\n")
    // writer A wins: v2 published from buildA
    assert(GraftLakeIO.commitVersion(dir, expectedBase = 1, buildA) === 2)
    val v2shard = GraftLakeIO.shardFile(GraftLakeIO.versionDir(dir, 2), 0)
    val winnerBytes = java.nio.file.Files.readAllBytes(v2shard.toPath)
    // writer B loses: conflict, and the WINNER'S v2 files are intact
    // (the round-10 flaw: B would have rmTree'd the shared v2 dir)
    intercept[GraftLakeCommitConflict] {
      GraftLakeIO.commitVersion(dir, expectedBase = 1, buildB)
    }
    assert(GraftLakeIO.latestVersion(dir) === 2)
    assert(v2shard.exists())
    assert(java.nio.file.Files.readAllBytes(v2shard.toPath)
      .sameElements(winnerBytes))
    // the loser's build dir was cleaned up, not left as garbage
    assert(!buildB.exists())
    spark.sql(s"DROP TABLE $tbl")
  }

  test("rollback: restore-as-new-commit preserves history and fails " +
      "concurrent commits built on the pre-rollback head") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_rollback"
    ddl(tbl) // v1: users 0..7
    spark.sql(s"INSERT INTO $tbl VALUES (8, DATE '2024-05-01')")  // v2
    spark.sql(s"INSERT INTO $tbl VALUES (9, DATE '2024-06-01')")  // v3
    val dir = new File(lakeRoot, "spec_rollback").getPath
    assert(GraftLakeIO.latestVersion(dir) === 3)
    // a concurrent writer starts building on v3...
    val straggler = GraftLakeIO.newBuildDir(dir)
    // ...while the mis-merge recovery rolls back to v1 (publishes v4)
    assert(GraftLakeIO.rollbackToVersion(dir, 1) === 4)
    assert(GraftLakeIO.latestVersion(dir) === 4)
    assert(rows(tbl).keySet === (0L to 7L).toSet) // v1 content restored
    // the straggler's commit built on v3 now conflicts
    intercept[GraftLakeCommitConflict] {
      GraftLakeIO.commitVersion(dir, expectedBase = 3, straggler)
    }
    // abandoned versions remain time-travelable (append-only history)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .head.getLong(0) === 9L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 3")
      .head.getLong(0) === 10L)
    // rolling back to an expired target is refused
    GraftLakeIO.expireSnapshots(dir, keep = 2): Unit // drops v1, v2
    intercept[IllegalArgumentException] {
      GraftLakeIO.rollbackToVersion(dir, 1)
    }
    spark.sql(s"DROP TABLE $tbl")
  }

  test("TIMESTAMP AS OF refuses expired history instead of serving " +
      "an empty scan") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_ttexp"
    ddl(tbl) // v1
    spark.sql(s"INSERT INTO $tbl VALUES (8, DATE '2024-05-01')") // v2
    val dir = new File(lakeRoot, "spec_ttexp").getPath
    val t1 = GraftLakeIO.commitMicros(dir, 1)
    val t2 = GraftLakeIO.commitMicros(dir, 2)
    // pre-expiry: t1 resolves v1, t2 resolves v2
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl TIMESTAMP AS OF ${microsLit(t1)}")
      .head.getLong(0) === 8L)
    GraftLakeIO.expireSnapshots(dir, keep = 1): Unit // v1 gone
    // a timestamp in v1's validity window must now FAIL, not read v1's
    // missing dir as zero rows (advisor round 10: commitMicros of an
    // expired version reads Long.MinValue and won the maxOption)
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT count(*) FROM $tbl TIMESTAMP AS OF ${microsLit(t1)}")
        .collect()
    }
    assert(e.getMessage.contains("expired"),
      s"expected loud expiry failure, got: ${e.getMessage}")
    // the surviving head still time-travels fine
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl TIMESTAMP AS OF ${microsLit(t2)}")
      .head.getLong(0) === 9L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("zone-map skipping: a selective predicate over a range-" +
      "clustered table plans only intersecting shards, results exact") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_zmap"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score DOUBLE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4',
        'shard_width'='10')""")
    // keys 0..39 → shards [0,10) [10,20) [20,30) [30,∞)
    spark.range(40).selectExpr("id AS user_id", "id * 1.5 AS score")
      .createOrReplaceTempView("spec_zmap_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_zmap_src")
    val vdir = GraftLakeIO.versionDir(
      new File(lakeRoot, "spec_zmap").getPath, 1)
    // the commit persisted zone maps for all 4 shards
    val stats = GraftLakeIO.readStats(vdir)
    assert(stats.keySet === Set(0, 1, 2, 3))
    assert(stats(1)("user_id").minL === 10L &&
      stats(1)("user_id").maxL === 19L)
    assert(stats(2)("score").minD === 30.0 &&
      stats(2)("score").maxD === 43.5)
    // selective range read: shards 0, 2, 3 provably miss — skipped
    GraftLakeScanMetrics.reset()
    val got = spark.sql(
      s"SELECT user_id FROM $tbl WHERE user_id BETWEEN 12 AND 17 " +
        "ORDER BY user_id").collect().map(_.getLong(0))
    assert(got === (12L to 17L).toArray)
    assert(GraftLakeScanMetrics.skippedByStats.get() === 3L,
      s"skipped=${GraftLakeScanMetrics.skippedByStats.get()} " +
        s"planned=${GraftLakeScanMetrics.planned.get()}")
    assert(GraftLakeScanMetrics.planned.get() === 1L)
    // DOUBLE-column predicate skips too (non-key zone map)
    GraftLakeScanMetrics.reset()
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl WHERE score >= 45.0")
      .head.getLong(0) === 10L)
    assert(GraftLakeScanMetrics.skippedByStats.get() === 3L)
    // a predicate zone maps can't decide (string/unsupported shape)
    // skips nothing and stays correct
    GraftLakeScanMetrics.reset()
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl WHERE user_id % 2 = 0")
      .head.getLong(0) === 20L)
    assert(GraftLakeScanMetrics.skippedByStats.get() === 0L)
    // hash-sharded tables (no shard_width): ranges overlap, no skip,
    // same answers — the stats layer is purely an optimization
    val tblH = "graft_lake.lake.spec_zmap_hash"
    spark.sql(s"DROP TABLE IF EXISTS $tblH")
    spark.sql(s"""CREATE TABLE $tblH (user_id BIGINT, score DOUBLE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    spark.sql(s"INSERT INTO $tblH SELECT * FROM spec_zmap_src")
    GraftLakeScanMetrics.reset()
    assert(spark.sql(
      s"SELECT count(*) FROM $tblH WHERE user_id BETWEEN 12 AND 17")
      .head.getLong(0) === 6L)
    assert(GraftLakeScanMetrics.skippedByStats.get() === 0L)
    spark.sql(s"DROP TABLE $tbl")
    spark.sql(s"DROP TABLE $tblH")
  }

  test("zone maps survive append commits and stay sound after " +
      "schema evolution") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_zmap_evo"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4',
        'shard_width'='10')""")
    spark.sql(s"INSERT INTO $tbl VALUES (5), (15)")        // v1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN (score DOUBLE)")
    spark.sql(s"INSERT INTO $tbl VALUES (6, 9.0), (35, 2.0)") // v2
    val dir = new File(lakeRoot, "spec_zmap_evo").getPath
    val stats = GraftLakeIO.readStats(GraftLakeIO.versionDir(dir, 2))
    // shard 0 appended: key range merged 5..6; score range covers only
    // the non-null half — sound because old rows read NULL
    assert(stats(0)("user_id").minL === 5L &&
      stats(0)("user_id").maxL === 6L)
    assert(stats(0)("score").minD === 9.0)
    // shard 1 carried by hardlink: v1 stats carried verbatim, no score
    assert(stats(1)("user_id").minL === 15L &&
      !stats(1).contains("score"))
    // score predicate: shard 1 (no score entry) must NOT be skipped
    // blindly — it has no entry, so it's read and contributes nothing
    GraftLakeScanMetrics.reset()
    val n = spark.sql(
      s"SELECT count(*) FROM $tbl WHERE score > 5.0").head.getLong(0)
    assert(n === 1L)
    // shard 3 (score=2.0) provably misses score>5 → skipped
    assert(GraftLakeScanMetrics.skippedByStats.get() === 1L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("table_changes: version-diff CDC feed — inserts, deletes, " +
      "update pre/post pairs, value-identical rewrites silent") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_cdf"
    ddl(tbl) // v1: users 0..7 @ 2024-03-01
    // v2: update 1 (real change), rewrite 2 with the SAME value
    // (must be silent), insert 9, delete 3
    spark.sql(s"""MERGE INTO $tbl t USING (
        SELECT * FROM VALUES
          (1L, DATE '2024-04-01'), (2L, DATE '2024-03-01'),
          (9L, DATE '2024-05-01')
          AS src(user_id, cohort_d)) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET cohort_d = s.cohort_d
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql(s"DELETE FROM $tbl WHERE user_id = 3")
    def changes(f: Int, t: Int): Set[(String, Long, String)] =
      Lake.tableChanges(spark, tbl, "user_id", f, t).collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDate(2).toString)).toSet
    assert(changes(1, 2) === Set(
      ("update_preimage", 1L, "2024-03-01"),
      ("update_postimage", 1L, "2024-04-01"),
      ("insert", 9L, "2024-05-01")))
    assert(changes(2, 3) === Set(("delete", 3L, "2024-03-01")))
    // spanning diff composes; reversed endpoints invert the feed
    assert(changes(1, 3) === Set(
      ("update_preimage", 1L, "2024-03-01"),
      ("update_postimage", 1L, "2024-04-01"),
      ("insert", 9L, "2024-05-01"),
      ("delete", 3L, "2024-03-01")))
    assert(changes(2, 1) === Set(
      ("update_preimage", 1L, "2024-04-01"),
      ("update_postimage", 1L, "2024-03-01"),
      ("delete", 9L, "2024-05-01")))
    // v0 → v1: pure insert feed of the initial load
    assert(changes(0, 1).map(_._1) === Set("insert") &&
      changes(0, 1).size === 8)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("recluster migration: SET shard_width + self INSERT OVERWRITE " +
      "activates zone-map skipping on an existing hash table") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_reclust"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score DOUBLE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    spark.range(40).selectExpr("id AS user_id", "id * 1.5 AS score")
      .createOrReplaceTempView("spec_reclust_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_reclust_src")
    def readRange(): Array[Long] = spark.sql(
      s"SELECT user_id FROM $tbl WHERE user_id BETWEEN 12 AND 17 " +
        "ORDER BY user_id").collect().map(_.getLong(0))
    // hash layout: every shard spans the key range — nothing skips
    GraftLakeScanMetrics.reset()
    assert(readRange() === (12L to 17L).toArray)
    assert(GraftLakeScanMetrics.skippedByStats.get() === 0L)
    // migrate: metadata-only routing flip + self-overwrite rewrite
    // (the source scan pins v1's immutable files; the write commits v2)
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('shard_width'='10')")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM $tbl")
    GraftLakeScanMetrics.reset()
    assert(readRange() === (12L to 17L).toArray) // same answer
    assert(GraftLakeScanMetrics.skippedByStats.get() === 3L,
      s"skipped=${GraftLakeScanMetrics.skippedByStats.get()}")
    assert(GraftLakeScanMetrics.planned.get() === 1L)
    // the migration is honest history: create → append → overwrite
    val dir = new File(lakeRoot, "spec_reclust").getPath
    assert((1 to GraftLakeIO.latestVersion(dir))
      .map(GraftLakeIO.commitOperation(dir, _)) ===
      Seq("append", "overwrite"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("plain concurrent INSERT INTO (no library lock): losers " +
      "conflict and retry, every row lands, history is linear") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_conc_insert"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, cohort_d DATE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    val nThreads = 4
    val conflicts = new java.util.concurrent.atomic.AtomicInteger()
    def isConflict(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .exists(_.isInstanceOf[GraftLakeCommitConflict])
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val futures = (0 until nThreads).map { k =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          val values = (0 until 5)
            .map(i => s"(${k * 100 + i}, DATE '2024-03-01')")
            .mkString(", ")
          var done = false
          var attempts = 0
          while (!done) {
            try { spark.sql(s"INSERT INTO $tbl VALUES $values"); done = true }
            catch {
              case e: Throwable if isConflict(e) =>
                conflicts.incrementAndGet()
                attempts += 1
                require(attempts < 50, "livelock")
                Thread.sleep(10L * attempts)
            }
          }
        }
      })
    }
    pool.shutdown()
    futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    // every thread's rows landed exactly once — no lost updates, no
    // clobbered snapshots (the round-10 shared-build-dir flaw would
    // have silently emptied shards here)
    val got = spark.sql(s"SELECT user_id FROM $tbl").collect()
      .map(_.getLong(0)).sorted
    val want = (0 until nThreads)
      .flatMap(k => (0 until 5).map(i => (k * 100 + i).toLong)).sorted
    assert(got.toSeq === want)
    // linear history: one version per successful commit, all readable
    val dir = new File(lakeRoot, "spec_conc_insert").getPath
    assert(GraftLakeIO.latestVersion(dir) === nThreads)
    (1 to nThreads).foreach { v =>
      assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF $v")
        .head.getLong(0) === 5L * v)
    }
    // note: with the JVM-level table monitor serializing commitVersion,
    // same-process writers may serialize enough to see few conflicts —
    // the assertion is zero data loss, not a conflict count
    spark.sql(s"DROP TABLE $tbl")
  }

  test("crash recovery: an unpublished orphan version dir neither " +
      "blocks nor corrupts the next commit; vacuum clears crash debris") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_crash"
    ddl(tbl) // v1
    val dir = new File(lakeRoot, "spec_crash").getPath
    // simulate a writer that crashed BETWEEN rename and publish:
    // v2 exists on disk, pointer still at 1
    val orphan = GraftLakeIO.versionDir(dir, 2)
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      new File(orphan, "shard-0.parquet").toPath,
      """{"user_id":999,"cohort_d":19000}""" + "\n")
    assert(GraftLakeIO.latestVersion(dir) === 1)
    // the orphan is unreachable: reads and time travel see only v1
    assert(rows(tbl).keySet === (0L to 7L).toSet)
    // the next commit self-heals: clears the orphan under the lock and
    // publishes ITS v2 (the crashed writer's half-commit never leaks)
    spark.sql(s"INSERT INTO $tbl VALUES (8, DATE '2024-05-01')")
    assert(GraftLakeIO.latestVersion(dir) === 2)
    assert(rows(tbl).keySet === (0L to 8L).toSet)
    assert(!rows(tbl).contains(999L))
    // vacuum clears remaining debris classes: stale build dirs and
    // above-pointer orphans; live versions untouched
    val staleBuild = new File(dir, "_build_dead_1")
    staleBuild.mkdirs()
    staleBuild.setLastModified(
      System.currentTimeMillis() - 3600000L): Unit
    val staleStage = new File(dir, "_stage_dead_q_e3")
    staleStage.mkdirs()
    staleStage.setLastModified(
      System.currentTimeMillis() - 3600000L): Unit
    GraftLakeIO.versionDir(dir, 7).mkdirs() // another crash artifact
    val freshBuild = GraftLakeIO.newBuildDir(dir) // a LIVE build
    val removed = GraftLakeIO.vacuumOrphans(dir, olderThanMs = 600000L)
    assert(removed === Seq("_build_dead_1", "_stage_dead_q_e3", "v7"))
    assert(!staleStage.exists())
    assert(!staleBuild.exists() &&
      !GraftLakeIO.versionDir(dir, 7).exists())
    assert(freshBuild.exists(), "vacuum must not touch a live build")
    assert(rows(tbl).keySet === (0L to 8L).toSet)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("$changes metadata table: batch reads the full stamped " +
      "history; streaming advances one commit per micro-batch; only " +
      "changed shards are planned") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_cdfsrc"
    ddl(tbl) // v1: users 0..7 (4 shards)
    // v2 touches ONLY shard 1 (update user 1, insert user 9)
    spark.sql(s"""MERGE INTO $tbl t USING (
        SELECT * FROM VALUES (1L, DATE '2024-04-01'),
          (9L, DATE '2024-05-01') AS src(user_id, cohort_d)) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET cohort_d = s.cohort_d
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql(s"DELETE FROM $tbl WHERE user_id = 2") // v3: shard 2 only
    // batch read: full history, one partition per (version, CHANGED
    // shard) — hardlink-carried shards are never planned
    val changes = spark.table(s"graft_lake.lake.`spec_cdfsrc$$changes`")
    val scan = changes.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[org.apache.spark.sql.execution.datasources
        .v2.BatchScanExec]
    val parts = scan.inputPartitions
      .map(_.asInstanceOf[GraftLakeChangesPartition])
    assert(parts.map(p => (p.version, p.shard)).toSet ===
      Set((1, 0), (1, 1), (1, 2), (1, 3), // initial load: all shards
        (2, 1),                           // merge touched shard 1 only
        (3, 2)))                          // delete touched shard 2 only
    val got = changes.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.count(_._2 == 1L) === 8)
    assert(got.filter(_._2 == 2L).map(t => (t._1, t._3)) ===
      Set(("update_preimage", 1L), ("update_postimage", 1L),
        ("insert", 9L)))
    assert(got.filter(_._2 == 3L).map(t => (t._1, t._3)) ===
      Set(("delete", 2L)))
    // streaming read: one micro-batch per commit, chronological
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q = spark.readStream
      .table(s"graft_lake.lake.`spec_cdfsrc$$changes`")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen += b.select("_commit_version").distinct()
            .collect().map(_.getLong(0)).toSeq.sorted
        }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.toSeq === Seq(Seq(1L), Seq(2L), Seq(3L)),
      s"micro-batches carried versions: $seen")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("fuzz: connector $changes equals the DataFrame-level diff for " +
      "every commit of seeded random MERGE/DELETE/append histories " +
      "(incl. NULLs, silent identical rewrites, and randomized " +
      "merge-on-read modes — deletion vectors + multi-part appends " +
      "inside the same histories)") {
    Lake.registerCatalog(spark)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val tbl = s"graft_lake.lake.spec_cdf_fuzz$seed"
      // randomize the row-level strategies: the DataFrame-level
      // reference diff reads DV-masked snapshots like any consumer,
      // so it stays a mode-independent cross-check
      val dMode = if (rnd.nextBoolean()) "merge-on-read"
        else "copy-on-write"
      val mMode = if (rnd.nextBoolean()) "merge-on-read"
        else "copy-on-write"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT,
          weight DOUBLE)
        TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4',
          'delete_mode'='$dMode', 'merge_mode'='$mMode')""")
      var freshKey = 100L // plain-INSERT keys stay disjoint from the
                          // MERGE key space (CDF needs unique keys)
      val nCommits = 3 + rnd.nextInt(3)
      (1 to nCommits).foreach { _ =>
        val dice = rnd.nextInt(8)
        if (dice < 2) {
          val m = 2 + rnd.nextInt(4)
          spark.sql(s"DELETE FROM $tbl WHERE user_id % $m = " +
            s"${rnd.nextInt(m)}")
        } else if (dice < 3) {
          // plain append: a multi-part commit (and, under a prior MoR
          // delete, an append over live deletion vectors)
          val vals = (0 until 1 + rnd.nextInt(3)).map { _ =>
            freshKey += 1
            s"(${freshKey}L, ${rnd.nextInt(8)}, CAST(0.5 AS DOUBLE))"
          }.mkString(", ")
          spark.sql(s"INSERT INTO $tbl VALUES $vals")
        } else {
          // upsert keeps keys unique per shard (the CDF contract);
          // ~1/5 values NULL, and re-upserting an unchanged value
          // exercises the silent-rewrite path. The DOUBLE column draws
          // from a 3-value set INCLUDING NaN so unchanged-NaN rewrites
          // (boxed == would fake an update) and NaN<->value updates
          // both occur across seeds.
          val vals = (0 until 1 + rnd.nextInt(6)).map { _ =>
            val k = rnd.nextInt(20)
            val v = if (rnd.nextInt(5) == 0) "CAST(NULL AS BIGINT)"
              else rnd.nextInt(8).toString
            val w = rnd.nextInt(3) match {
              case 0 => "CAST('NaN' AS DOUBLE)"
              case 1 => "CAST(NULL AS DOUBLE)"
              case _ => s"CAST(${rnd.nextInt(2)}.5 AS DOUBLE)"
            }
            s"(${k}L, $v, $w)"
          }.distinct.groupBy(_.split(",")(0)).map(_._2.head)
            .mkString(", ")
          spark.sql(s"""MERGE INTO $tbl t USING (
              SELECT * FROM VALUES $vals
                AS src(user_id, score, weight)) s
            ON t.user_id = s.user_id
            WHEN MATCHED THEN UPDATE SET score = s.score,
              weight = s.weight
            WHEN NOT MATCHED THEN INSERT *""")
        }
      }
      val dir = new File(lakeRoot, s"spec_cdf_fuzz$seed").getPath
      val latest = GraftLakeIO.latestVersion(dir)
      // a no-match merge-on-read DML commits NOTHING (the delta path
      // skips empty commits), so latest can trail the statement count
      assert(latest >= 1 && latest <= nCommits)
      def tuple(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          // bit pattern: NaN-safe, deterministic set membership
          if (r.isNullAt(3)) None
          else Some(java.lang.Double.doubleToLongBits(r.getDouble(3))))
      val connector = spark.table(
        s"graft_lake.lake.`spec_cdf_fuzz$seed$$changes`")
      (1 to latest).foreach { v =>
        val got = connector
          .filter(org.apache.spark.sql.functions
            .col("_commit_version") === v)
          .select("_change_type", "user_id", "score", "weight")
          .collect().map(tuple(_)).toSet
        val want = Lake.tableChanges(spark, tbl, "user_id", v - 1, v)
          .select("_change_type", "user_id", "score", "weight")
          .collect().map(tuple(_)).toSet
        assert(got === want,
          s"seed=$seed v=$v connector=$got reference=$want")
      }
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("LRU writer rotation: one task spraying 24 shards stays under " +
      "the open-writer cap, rotated parts merge back value-exactly") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_rotation"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='24')""")
    // 96 keys round-robin over 24 shards from a SINGLE task: shard
    // k is revisited after 23 others, so with cap 16 every revisit
    // lands on an evicted writer — forced rotation on most shards
    GraftLakeScanMetrics.reset()
    spark.range(96).coalesce(1)
      .selectExpr("id AS user_id", "id * 7 AS v")
      .createOrReplaceTempView("spec_rotation_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_rotation_src")
    assert(GraftLakeScanMetrics.writerRotations.get() > 0L,
      "24 shards from one task must exceed the 16-writer cap")
    // merged shards serve every row exactly once, values intact
    val got = spark.table(tbl).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 96 &&
      (0L until 96L).forall(i => got(i) === i * 7))
    // zone maps survived rotation: each shard still has its exact key
    // range (the full range map rides every rotated part — idempotent
    // min/max merge)
    val dir = new File(lakeRoot, "spec_rotation").getPath
    val stats = GraftLakeIO.readStats(GraftLakeIO.versionDir(dir, 1))
    assert(stats.size === 24)
    (0 until 24).foreach { k =>
      assert(stats(k)("user_id").minL === k.toLong &&
        stats(k)("user_id").maxL === (72 + k).toLong, s"shard $k")
    }
    spark.sql(s"DROP TABLE $tbl")
  }

  test("streaming sink into the lake is exactly-once: a FORCED epoch " +
      "replay (checkpoint commit marker deleted) re-runs the epoch " +
      "and the txn watermark commits nothing twice") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_stream_sink"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (event_id BIGINT, user_id BIGINT)
      TBLPROPERTIES ('shard_key'='event_id', 'n_shards'='4')""")
    val base = java.nio.file.Files
      .createTempDirectory("graft_lake_sink_").toString
    val srcDir = s"$base/src"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(srcDir)): Unit
    val ckpt = s"$base/ckpt"
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    def publish(ids: Range, name: String): Unit =
      spark.range(ids.head, ids.last + 1)
        .selectExpr("id AS event_id", "id % 7 AS user_id")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // the checkpoint's active-query slot frees asynchronously after
      // awaitTermination returns — retry the start briefly
      var attempts = 0
      var done = false
      while (!done) {
        try {
          val q = ss.readStream.schema(sch).parquet(srcDir)
            .writeStream
            .option("checkpointLocation", ckpt)
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable(tbl)
          q.awaitTermination()
          done = true
        } catch {
          case e: Exception
              if e.getMessage != null &&
                e.getMessage.contains("concurrently using") &&
                attempts < 20 =>
            attempts += 1; Thread.sleep(250)
        }
      }
    }
    publish(0 until 50, "a")
    runOnce() // epoch 0: rows 0..49
    assert(spark.table(tbl).count() === 50L)
    val dir = new File(lakeRoot, "spec_stream_sink").getPath
    val v1 = GraftLakeIO.latestVersion(dir)
    assert(GraftLakeIO.commitOperation(dir, v1) === "streaming")
    // FORCE a replay: drop the checkpoint's completion marker for the
    // last batch — on restart Spark re-runs epoch 0 with the same
    // data and the same epoch id; only the sink-side txn watermark
    // stands between that and duplicated rows
    val lastCommit = new File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).maxBy(_.getName.toInt)
    assert(lastCommit.delete())
    publish(50 until 80, "b")
    runOnce() // replays epoch 0 (no-op) then commits epoch 1
    assert(spark.table(tbl).count() === 80L,
      "epoch replay duplicated or dropped rows")
    assert(spark.table(tbl).select("event_id").distinct().count()
      === 80L)
    // exactly one extra commit landed (the replayed epoch 0 committed
    // NOTHING — no empty version, no duplicate version)
    assert(GraftLakeIO.latestVersion(dir) === v1 + 1)
    // watermark carried as snapshot state, visible at the head
    val txns = GraftLakeIO.readTxns(
      GraftLakeIO.versionDir(dir, v1 + 1))
    assert(txns.size === 1 && txns.head._2 === 1L,
      s"expected epoch watermark 1, got $txns")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("DESCRIBE HISTORY serves counts from commit metadata — and " +
      "the metadata describes reality (recount cross-check)") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_histmeta"
    ddl(tbl) // v1: 8 rows
    spark.sql(s"INSERT INTO $tbl VALUES (8, DATE '2024-05-01')") // v2: 9
    spark.sql(s"DELETE FROM $tbl WHERE user_id < 2") // v3: 7
    val dir = new File(lakeRoot, "spec_histmeta").getPath
    // every commit carries stamped counts: DESCRIBE HISTORY needs no
    // table scan (O(versions x table) recount is the scale killer)
    (1 to 3).foreach { v =>
      val meta = GraftLakeIO.commitCounts(dir, v)
      assert(meta.isDefined, s"v$v missing stamped counts")
      val recount = spark.sql(
        s"SELECT count(*) FROM $tbl VERSION AS OF $v").head.getLong(0)
      assert(meta.get._1 === recount,
        s"v$v stamped ${meta.get._1} rows but the table has $recount")
      assert(meta.get._2 === GraftLakeIO.existingShards(
        GraftLakeIO.versionDir(dir, v)).size.toLong)
    }
    val hist = Lake.history(spark, tbl, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(hist.toSeq === Seq((0L, "create", 0L), (1L, "append", 8L),
      (2L, "append", 9L), (3L, "delete", 7L)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("columnar shard payloads: a pruned read decodes ONLY the " +
      "requested columns, count(*) is served from footer metadata, " +
      "and schema-evolved old shards serve added columns as NULL " +
      "without decoding anything extra") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_columnar"
    ddl(tbl) // v1: (user_id BIGINT, cohort_d DATE) × 8 rows, 4 shards
    // shards are REAL parquet (readable by any parquet tool)
    val dir = new File(lakeRoot, "spec_columnar").getPath
    val shard0 = GraftLakeIO.shardFile(GraftLakeIO.versionDir(dir, 1), 0)
    val (fschema, n0) = GraftShardCodec.footer(shard0)
    assert(fschema.containsField("user_id") &&
      fschema.containsField("cohort_d") && n0 === 2L)
    // 1-of-2-column projection: each of the 4 shard readers decodes
    // exactly ONE parquet column — the dropped column's pages are
    // never deserialized
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT user_id FROM $tbl").collect().length === 8)
    assert(GraftLakeScanMetrics.decodedColumns.get() === 4L,
      s"expected 4 shards x 1 column, got " +
        s"${GraftLakeScanMetrics.decodedColumns.get()}")
    // count(*): the filterless aggregate pushes down COMPLETELY — one
    // metadata answer, no per-shard readers at all (see the dedicated
    // aggregate-pushdown test)
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 8L)
    assert(GraftLakeScanMetrics.decodedColumns.get() === 0L &&
      GraftLakeScanMetrics.aggPushdowns.get() === 1L)
    // a projection-EMPTY non-aggregate read (constant projection over
    // the table) still exercises the reader's footer-count path: four
    // per-shard readers, zero data pages
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT 1 AS one FROM $tbl").collect().length === 8)
    assert(GraftLakeScanMetrics.decodedColumns.get() === 0L &&
      GraftLakeScanMetrics.metadataOnlyReads.get() === 4L)
    // evolution: ADD COLUMN then read it — old shards lack the field
    // in their file schema, so the readers serve NULL while decoding
    // only the columns that exist
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN (score DOUBLE)")
    GraftLakeScanMetrics.reset()
    val sc = spark.sql(s"SELECT score FROM $tbl").collect()
    assert(sc.length === 8 && sc.forall(_.isNullAt(0)))
    assert(GraftLakeScanMetrics.decodedColumns.get() === 0L,
      "reading a column absent from every shard file must decode " +
        "nothing")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("STRING zone maps: selective string predicates skip shards " +
      "(UTF-8 binary order), over-long values poison only their " +
      "shard's entry (sticky-invalid, never a wrong skip)") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_zstr"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, tag STRING)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='3',
        'shard_width'='10')""")
    // key-correlated tags: shard 0 = a*, shard 1 = m*, shard 2 = z*;
    // one OVER-LONG tag (> 64 chars) lands in shard 1
    spark.sql(s"""INSERT INTO $tbl VALUES
      (1, 'alpha'), (2, 'apple'),
      (11, 'mango'), (12, concat('m', repeat('x', 80))),
      (21, 'zebra'), (22, 'zulu')""")
    val dir = new File(lakeRoot, "spec_zstr").getPath
    val stats = GraftLakeIO.readStats(GraftLakeIO.versionDir(dir, 1))
    assert(stats(0)("tag").minS === "alpha" &&
      stats(0)("tag").maxS === "apple")
    // shard 1 saw an over-length value: sticky invalid, never skipped
    assert(GraftLakeIO.rangeUnusable(stats(1)("tag")))
    assert(stats(2)("tag").minS === "zebra" &&
      stats(2)("tag").maxS === "zulu")
    // `tag >= 'z'`: shard 0 provably misses, shard 1 unskippable
    // (invalid), shard 2 matches → plan 2 of 3
    GraftLakeScanMetrics.reset()
    val hi = spark.sql(
      s"SELECT user_id FROM $tbl WHERE tag >= 'z' ORDER BY user_id")
      .collect().map(_.getLong(0))
    assert(hi.toSeq === Seq(21L, 22L))
    assert(GraftLakeScanMetrics.skippedByStats.get() === 1L &&
      GraftLakeScanMetrics.planned.get() === 2L)
    // equality probe: 'mango' can only live in shards whose range
    // admits it — shard 0 and 2 skip, shard 1 (invalid) reads
    GraftLakeScanMetrics.reset()
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl WHERE tag = 'mango'")
      .head.getLong(0) === 1L)
    assert(GraftLakeScanMetrics.skippedByStats.get() === 2L)
    // the over-long row itself is served correctly despite being
    // invisible to stats
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl WHERE tag > 'mw'")
      .head.getLong(0) === 3L) // mxxx... , zebra, zulu
    spark.sql(s"DROP TABLE $tbl")
  }

  test("NaN discipline: zone maps never observe NaN (no poisoned " +
      "pruning), a NaN literal never skips, and $changes treats an " +
      "unchanged NaN row as unchanged (<=> semantics)") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_nan"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score DOUBLE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='3',
        'shard_width'='10')""")
    // shard 0: scores {1.0, NaN}; shard 1: {5.0}; shard 2: {100.0}
    spark.sql(s"""INSERT INTO $tbl VALUES
      (1, 1.0), (2, CAST('NaN' AS DOUBLE)), (11, 5.0), (21, 100.0)""")
    val dir = new File(lakeRoot, "spec_nan").getPath
    val stats = GraftLakeIO.readStats(GraftLakeIO.versionDir(dir, 1))
    // the writer skipped the NaN: shard 0's range is the real 1.0,
    // not min=max=NaN (which would prune the shard on every range)
    assert(stats(0)("score").minD === 1.0 &&
      stats(0)("score").maxD === 1.0)
    GraftLakeScanMetrics.reset()
    val low = spark.sql(s"SELECT user_id FROM $tbl WHERE score <= 2.0")
      .collect().map(_.getLong(0)).toSet
    assert(low === Set(1L))
    assert(GraftLakeScanMetrics.planned.get() === 1L,
      "shard 0 must be planned despite holding a NaN row")
    assert(GraftLakeScanMetrics.skippedByStats.get() === 2L)
    // `= NaN` (true for the NaN row under Spark SQL's NaN semantics):
    // min/max never contain NaN, so ranges can't prove absence —
    // no shard may be skipped on a NaN literal
    GraftLakeScanMetrics.reset()
    val nan = spark.sql(
      s"SELECT user_id FROM $tbl WHERE score = CAST('NaN' AS DOUBLE)")
      .collect().map(_.getLong(0)).toSet
    assert(nan === Set(2L))
    assert(GraftLakeScanMetrics.skippedByStats.get() === 0L)
    // hardening for PRE-fix tables: a persisted poisoned range is
    // treated as "no stats", never as a skip license
    assert(GraftLakeIO.rangeMayMatch(
      GraftLakeIO.ColRange(isFloat = true, 0L, 0L, Double.NaN,
        Double.NaN), "<=", java.lang.Double.valueOf(2.0)))
    // $changes: re-upserting the SAME NaN is a silent identical
    // rewrite (boxed-== would call NaN changed and fake an update
    // pair); NaN -> 1.5 is a real update
    spark.sql(s"""MERGE INTO $tbl t USING (
        SELECT 2L AS user_id, CAST('NaN' AS DOUBLE) AS score) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET score = s.score""") // v2: no-op
    spark.sql(s"""MERGE INTO $tbl t USING (
        SELECT 2L AS user_id, CAST(1.5 AS DOUBLE) AS score) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET score = s.score""") // v3: update
    val ch = spark.table(s"graft_lake.lake.`spec_nan$$changes`")
      .filter("_commit_version >= 2")
      .select("_commit_version", "_change_type", "user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(ch === Set((3L, "update_preimage", 2L),
      (3L, "update_postimage", 2L)),
      s"v2's unchanged-NaN rewrite must emit nothing; got $ch")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("$changes refuses expired history instead of fabricating " +
      "inserts; vacuum never touches non-version-dir artifacts") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_chexp"
    ddl(tbl) // v1
    spark.sql(s"DELETE FROM $tbl WHERE user_id = 2") // v2
    spark.sql(s"UPDATE $tbl SET cohort_d = DATE '2024-06-01' " +
      "WHERE user_id = 1") // v3
    val dir = new File(lakeRoot, "spec_chexp").getPath
    // a future metadata artifact whose name merely CONTAINS v<digits>
    // above the pointer must survive vacuum (anchored version match)
    val decoy = new File(dir, "schema_v9.json")
    java.nio.file.Files.writeString(decoy.toPath, "{}"): Unit
    val removed = GraftLakeIO.vacuumOrphans(dir, olderThanMs = 0L)
    assert(decoy.exists(), s"vacuum removed the decoy: $removed")
    assert(decoy.delete())
    GraftLakeIO.expireSnapshots(dir, keep = 1): Unit
    // batch $changes always spans (0, latest]; with v1/v2 expired the
    // diff is unknowable — an empty-dir read would emit every
    // surviving row as 'insert' and lose the delete/update
    def msgs(t: Throwable): String =
      Option(t).map(x => x.getMessage + msgs(x.getCause)).getOrElse("")
    val e = intercept[Exception] {
      spark.table(s"graft_lake.lake.`spec_chexp$$changes`").collect()
    }
    assert(msgs(e).contains("expired"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("point-lookup pruning: =/IN on the shard key reads one shard " +
      "per probed value on a hash table; mixed-provenance shards are " +
      "never pruned after a routing change") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_probe"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    spark.sql(s"INSERT INTO $tbl VALUES " +
      (0L to 7L).map(k => s"($k, ${k * 10})").mkString(", ")) // v1 hash:4
    // equality probe: user 6 lives only in shard 2 (6 mod 4)
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT score FROM $tbl WHERE user_id = 6")
      .head.getLong(0) === 60L)
    assert(GraftLakeScanMetrics.planned.get() === 1L &&
      GraftLakeScanMetrics.skippedByStats.get() === 3L)
    // IN probe: users 1 and 6 → shards 1 and 2
    GraftLakeScanMetrics.reset()
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl WHERE user_id IN (1, 6)")
      .head.getLong(0) === 2L)
    assert(GraftLakeScanMetrics.planned.get() === 2L &&
      GraftLakeScanMetrics.skippedByStats.get() === 2L)
    // routing change WITHOUT rewrite: key 100 routes to shard 3 under
    // the NEW range routing but would hash to shard 0 under the old —
    // shard 3 records "mixed" (append across routings) and must never
    // be pruned; the lookup stays correct
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('shard_width'='10')")
    spark.sql(s"INSERT INTO $tbl VALUES (100, 1000)") // v2
    val dir = new File(lakeRoot, "spec_probe").getPath
    val routing = GraftLakeIO.readRouting(GraftLakeIO.versionDir(dir, 2))
    assert(routing(3) === "mixed")      // old hash rows + new range row
    assert(routing(0) === "hash:4")     // carried untouched
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT score FROM $tbl WHERE user_id = 100")
      .head.getLong(0) === 1000L)
    // the two layers COMPOSE: shards 1/2 pruned by routing (hash:4
    // says 100 can't be there), shard 0 pruned by its ZONE MAP
    // (max user_id 4 < 100 — routing alone would have kept it), and
    // only the mixed shard 3 is read
    assert(GraftLakeScanMetrics.planned.get() === 1L &&
      GraftLakeScanMetrics.skippedByStats.get() === 3L,
      s"planned=${GraftLakeScanMetrics.planned.get()} " +
        s"skipped=${GraftLakeScanMetrics.skippedByStats.get()} " +
        s"routing=$routing")
    spark.sql(s"DROP TABLE $tbl")
  }

  /** Spark parses TIMESTAMP AS OF '<literal>'; render micros as a UTC
    * timestamp string with microsecond precision. */
  private def microsLit(micros: Long): String = {
    val i = java.time.Instant.ofEpochSecond(micros / 1000000L,
      (micros % 1000000L) * 1000L)
    val s = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC).format(i)
    s"'$s'"
  }

  test("aggregate pushdown: filterless count/min/max answered from " +
      "footers + zone maps — no aggregate node, zero data pages; " +
      "filters, doubles, and strings-past-the-stats-bound refuse") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_aggpd"
    ddl(tbl) // v1: users 0..7, all cohort 2024-03-01
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN (n_events BIGINT)")
    spark.sql(s"""INSERT INTO $tbl VALUES
      (8, DATE '2024-04-01', 3), (9, DATE '2024-02-01', 7)""")
    GraftLakeScanMetrics.reset()
    val df = spark.sql(s"""SELECT count(*) AS c, count(n_events) AS cn,
      min(user_id) AS mn, max(user_id) AS mx,
      min(cohort_d) AS mnd, max(cohort_d) AS mxd FROM $tbl""")
    val r = df.head()
    assert(r.getLong(0) === 10L, "count(*) from footer rows")
    assert(r.getLong(1) === 2L,
      "count(col) honors footer null counts AND pre-ADD files that " +
        "lack the column entirely")
    assert(r.getLong(2) === 0L && r.getLong(3) === 9L)
    assert(r.getDate(4).toString === "2024-02-01" &&
      r.getDate(5).toString === "2024-04-01")
    assert(GraftLakeScanMetrics.aggPushdowns.get() === 1L)
    assert(GraftLakeScanMetrics.decodedColumns.get() === 0L &&
      GraftLakeScanMetrics.metadataOnlyReads.get() === 0L,
      "a completely-pushed aggregate launches no shard readers at all")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") &&
      !plan.contains("SortAggregate"),
      s"complete pushdown must erase the aggregate node:\n$plan")
    // a FILTERED aggregate must NOT push (zone maps prune shards but
    // never claim row-exact filtering, so Spark keeps the Filter and
    // the aggregate above the scan)
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE user_id > 3")
      .head.getLong(0) === 6L)
    assert(GraftLakeScanMetrics.aggPushdowns.get() === 0L)
    // DOUBLE min/max refuses: zone maps drop NaN (they must, for
    // skipping soundness) while Spark orders NaN ABOVE every double —
    // the row-exact plan is the only one that can answer this
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN (score DOUBLE)")
    spark.sql(s"""INSERT INTO $tbl VALUES
      (10, DATE '2024-05-01', 1, CAST('NaN' AS DOUBLE)),
      (11, DATE '2024-05-01', 1, 4.5)""")
    GraftLakeScanMetrics.reset()
    val mx = spark.sql(s"SELECT max(score) AS m FROM $tbl").head
    assert(mx.getDouble(0).isNaN, "Spark max() treats NaN as largest")
    assert(GraftLakeScanMetrics.aggPushdowns.get() === 0L)
    spark.sql(s"DROP TABLE $tbl")
    // empty table: count 0 / min NULL, still metadata-answered
    val empty = "graft_lake.lake.spec_aggpd_empty"
    spark.sql(s"DROP TABLE IF EXISTS $empty")
    spark.sql(s"""CREATE TABLE $empty (user_id BIGINT, cohort_d DATE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    GraftLakeScanMetrics.reset()
    val er = spark.sql(
      s"SELECT count(*) AS c, min(user_id) AS m FROM $empty").head
    assert(er.getLong(0) === 0L && er.isNullAt(1))
    assert(GraftLakeScanMetrics.aggPushdowns.get() === 1L)
    spark.sql(s"DROP TABLE $empty")
    // a string column past the 64-char stats bound poisons its shard
    // entry (sticky invalid) — min/max on it must refuse, row-exact
    // answer still correct
    val st = "graft_lake.lake.spec_aggpd_str"
    spark.sql(s"DROP TABLE IF EXISTS $st")
    spark.sql(s"""CREATE TABLE $st (user_id BIGINT, tag STRING)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    val long = "z" * 80
    spark.sql(s"""INSERT INTO $st VALUES
      (1, 'apple'), (2, 'mango'), (3, '$long')""")
    GraftLakeScanMetrics.reset()
    val sr = spark.sql(
      s"SELECT min(tag) AS mn, max(tag) AS mx FROM $st").head
    assert(sr.getString(0) === "apple" && sr.getString(1) === long)
    assert(GraftLakeScanMetrics.aggPushdowns.get() === 0L,
      "an invalidated string zone-map entry is never an answer")
    spark.sql(s"DROP TABLE $st")
  }

  test("schema evolution: ADD/DROP COLUMN are metadata-only — old " +
      "rows read NULL for added columns, history stays readable") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_evo"
    ddl(tbl) // 8 rows of (user_id, cohort_d) — version 1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN (score BIGINT)")
    // old rows project NULL through the evolved schema, no rewrite:
    // version 1's files are untouched
    val evolved = spark.table(tbl).orderBy("user_id").collect()
    assert(evolved.length === 8 && evolved.forall(_.isNullAt(2)))
    spark.sql(
      s"INSERT INTO $tbl VALUES (20, DATE '2024-04-01', 7)") // v2
    val got = spark.sql(
      s"SELECT user_id, score FROM $tbl ORDER BY user_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(20L) === 7L && got(0L) === -1L && got.size === 9)
    // MERGE works on the evolved schema too (update the new column)
    spark.sql(s"""MERGE INTO $tbl t USING (
        SELECT * FROM VALUES (0L, DATE '2024-03-01', 5L)
          AS src(user_id, cohort_d, score)) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET score = s.score
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql(
      s"SELECT score FROM $tbl WHERE user_id = 0").head.getLong(0) === 5L)
    // DROP COLUMN: metadata-only, data no longer surfaced
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN score")
    assert(!spark.table(tbl).columns.contains("score"))
    // shard key is protected
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl DROP COLUMN user_id")
    }
    spark.sql(s"DROP TABLE $tbl")
  }

  test("merge_sql_firstseen equals the library-operator result on " +
      "harness events") {
    val sql = Lake.mergeSqlFirstSeen(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    val lib = graft.operators.Merge.mergeUpsertFirstSeen(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    assert(sql === lib)
  }
}
