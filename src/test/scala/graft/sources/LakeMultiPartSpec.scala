package graft.sources

import java.io.File

import graft.SparkSpec

/** Multi-part shard layout: an append commit hardlinks the existing
  * parts and lands the staged rows as ONE NEW PART — O(new data),
  * never a byte-copy of the shard. Ordinals are concatenation
  * positions, so deletion vectors and `_pos` survive appends by
  * construction; `$changes` diffs an append-only commit by reading
  * ONLY the appended parts. */
class LakeMultiPartSpec extends SparkSpec {

  private def lakeRoot: File = {
    Lake.registerCatalog(spark)
    new File(spark.conf.get("spark.sql.catalog.graft_lake.path"))
  }

  private def fileKey(f: File): Object =
    java.nio.file.Files.readAttributes(f.toPath,
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()

  test("append commits hardlink every existing part and add one new " +
      "part; reads concatenate parts in order; count(*) pushdown and " +
      "history counts span all parts") {
    val tbl = "graft_lake.lake.spec_mp"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    val dir = new File(lakeRoot, "spec_mp").getPath
    spark.sql(s"INSERT INTO $tbl VALUES (0, 10), (1, 11)") // v1
    spark.sql(s"INSERT INTO $tbl VALUES (2, 20), (3, 21)") // v2
    spark.sql(s"INSERT INTO $tbl VALUES (4, 30)") // v3: shard 0 only
    // shard 0 accumulated three parts, shard 1 two; every earlier
    // part carries by hardlink identity across versions
    val v3dir = GraftLakeIO.versionDir(dir, 3)
    assert(GraftLakeIO.shardParts(v3dir, 0).length === 3)
    assert(GraftLakeIO.shardParts(v3dir, 1).length === 2)
    val v1p0 = GraftLakeIO.shardParts(
      GraftLakeIO.versionDir(dir, 1), 0).map(fileKey)
    val v3p0 = GraftLakeIO.shardParts(v3dir, 0).map(fileKey)
    assert(v3p0.take(1) === v1p0,
      "v1's part must be the identical file in v3 (never re-copied)")
    val v2p0 = GraftLakeIO.shardParts(
      GraftLakeIO.versionDir(dir, 2), 0).map(fileKey)
    assert(v3p0.take(2) === v2p0)
    // reads see all parts concatenated
    val rows = spark.sql(
      s"SELECT user_id, score FROM $tbl ORDER BY user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(rows === Seq(0L -> 10L, 1L -> 11L, 2L -> 20L, 3L -> 21L,
      4L -> 30L))
    // metadata count spans the parts
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0)
      === 5L)
    assert(GraftLakeScanMetrics.aggPushdowns.get() === 1L)
    assert(GraftLakeIO.commitCounts(dir, 3) === Some((5L, 2L)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("$changes diffs an append-only commit from the appended parts " +
      "alone (insert-only partition, no pre side); a rewrite still " +
      "diffs the full shard pair") {
    val tbl = "graft_lake.lake.spec_mp_cdc"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (0, 10), (1, 11)") // v1
    spark.sql(s"INSERT INTO $tbl VALUES (2, 20)") // v2: append shard 0
    val table = new GraftLakeCatalog {
      initialize("graft_lake", new org.apache.spark.sql.util
        .CaseInsensitiveStringMap(java.util.Map.of("path",
          lakeRoot.getPath)))
    }.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("lake"), "spec_mp_cdc")).asInstanceOf[GraftLakeTable]
    val scan = new GraftLakeChangesScan(table,
      new GraftLakeChangesTable(table).changeSchema, 2)
    val parts = scan.diffPartitions(1, 2)
    assert(parts.length === 1)
    val p = parts.head.asInstanceOf[GraftLakeChangesPartition]
    assert(p.prePaths === Nil,
      "append-only diff must not read the existing rows")
    assert(p.postPaths.length === 1 &&
      p.postPaths.head.contains(".p1.parquet"))
    // and the emitted feed is exactly the appended row as insert
    val feed = spark.sql(
      s"""SELECT _change_type, user_id
          FROM `graft_lake`.`lake`.`spec_mp_cdc$$changes`
          WHERE _commit_version = 2""").collect()
    assert(feed.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("insert", 2L)))
    // UPDATE rewrites the shard (group path): full pre/post diff again
    spark.sql(s"UPDATE $tbl SET score = -1 WHERE user_id = 0") // v3
    val parts3 = scan.diffPartitions(2, 3)
    assert(parts3.length === 1)
    val p3 = parts3.head.asInstanceOf[GraftLakeChangesPartition]
    assert(p3.prePaths.nonEmpty && p3.postPaths.nonEmpty)
    // startingVersion read option bounds the replay AT PLANNING: a
    // scan built with startingVersion=2 plans only commit 3's diff
    val bounded = new GraftLakeChangesTable(table).newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("startingVersion", "2"))).build()
      .asInstanceOf[GraftLakeChangesScan]
    val boundedParts = bounded.planInputPartitions()
    assert(boundedParts.nonEmpty && boundedParts.forall(
      _.asInstanceOf[GraftLakeChangesPartition].version === 3),
      "earlier commits must never be planned under startingVersion")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("a stale position delete COMMUTES with a concurrent append " +
      "(snapshot parts stay an identity prefix) but conflicts with " +
      "a concurrent rewrite of the shard") {
    val tbl = "graft_lake.lake.spec_mp_race"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2',
        'delete_mode'='merge-on-read')""")
    spark.sql(s"INSERT INTO $tbl VALUES (0, 10), (2, 12)") // v1: shard 0
    val dir = new File(lakeRoot, "spec_mp_race").getPath
    val t = new GraftLakeCatalog {
      initialize("graft_lake", new org.apache.spark.sql.util
        .CaseInsensitiveStringMap(java.util.Map.of("path",
          lakeRoot.getPath)))
    }.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("lake"), "spec_mp_race")).asInstanceOf[GraftLakeTable]
    val bm = new org.roaringbitmap.RoaringBitmap()
    bm.add(0) // delete ordinal 0 of shard 0, as seen at v1
    val buf = new Array[Byte](bm.serializedSizeInBytes())
    bm.serialize(java.nio.ByteBuffer.wrap(buf))
    // an APPEND lands first — v1's part is still an identity prefix,
    // so the stale delete commits cleanly on top
    spark.sql(s"INSERT INTO $tbl VALUES (4, 14)") // v2: shard 0 part 1
    new GraftLakeDvBatchWrite(t, dir, 1, "delete", None)
      .commit(Array(GraftLakeDvCommit(Map(0 -> buf)))) // v3
    val live = spark.sql(s"SELECT user_id FROM $tbl ORDER BY user_id")
      .collect().map(_.getLong(0)).toSeq
    assert(live.length === 2 && live.contains(4L),
      "the appended row must survive; exactly one v1 row was deleted")
    // a REWRITE (compaction) breaks the prefix: stale deletes conflict
    assert(GraftLakeMaintenance.compactDeletionVectors(dir, 0.0)
      === Seq(0)) // v4
    val e = intercept[GraftLakeCommitConflict] {
      new GraftLakeDvBatchWrite(t, dir, 1, "delete", None)
        .commit(Array(GraftLakeDvCommit(Map(0 -> buf))))
    }
    assert(e.getMessage.contains("no longer bind"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("metadata-only DELETE: a shard-aligned key predicate drops " +
      "whole shard files with no scan and no rewrite; a misaligned " +
      "predicate falls back to the row-level path; TRUNCATE commits " +
      "an empty snapshot") {
    val tbl = "graft_lake.lake.spec_meta_del"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='8',
        'shard_width'='20')""") // range-clustered: shard k = [20k, 20k+20)
    val dir = new File(lakeRoot, "spec_meta_del").getPath
    spark.sql(s"INSERT INTO $tbl SELECT id, id * 10 FROM range(160)")
    val v1Files = (2 to 7).map(k => k -> fileKey(
      GraftLakeIO.shardFile(GraftLakeIO.versionDir(dir, 1), k))).toMap
    GraftLakeScanMetrics.reset()
    spark.sql(s"DELETE FROM $tbl WHERE user_id < 40") // v2: shards 0,1
    assert(GraftLakeScanMetrics.planned.get() === 0L,
      "a metadata delete must not plan any scan")
    assert(GraftLakeIO.commitOperation(dir, 2) === "delete")
    val v2dir = GraftLakeIO.versionDir(dir, 2)
    assert(GraftLakeIO.existingShards(v2dir) === (2 to 7).toSet)
    (2 to 7).foreach(k => assert(fileKey(
      GraftLakeIO.shardFile(v2dir, k)) === v1Files(k),
      s"carried shard $k must hardlink"))
    assert(GraftLakeIO.commitCounts(dir, 2) === Some((120L, 6L)))
    assert(spark.sql(s"SELECT min(user_id) FROM $tbl").head.getLong(0)
      === 40L)
    // misaligned bound (50 splits shard 2) -> row-level fallback scans
    GraftLakeScanMetrics.reset()
    spark.sql(s"DELETE FROM $tbl WHERE user_id < 50") // v3
    assert(GraftLakeScanMetrics.planned.get() > 0L,
      "a partial-shard delete must take the row-level path")
    assert(spark.sql(s"SELECT min(user_id) FROM $tbl").head.getLong(0)
      === 50L)
    // TRUNCATE: metadata-only empty snapshot
    spark.sql(s"TRUNCATE TABLE $tbl") // v4
    assert(GraftLakeIO.commitOperation(dir, 4) === "truncate")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0)
      === 0L)
    // time travel still serves the pre-truncate state
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .head.getLong(0) === 120L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("compaction rewrites each part under its own schema and drops " +
      "emptied parts; seq numbers go sparse without breaking reads") {
    val tbl = "graft_lake.lake.spec_mp_opt"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='1',
        'delete_mode'='merge-on-read')""")
    val dir = new File(lakeRoot, "spec_mp_opt").getPath
    spark.sql(s"INSERT INTO $tbl VALUES (0, 10), (1, 11)") // v1 part 0
    // evolution between parts: part 1 carries a column part 0 lacks
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN (note STRING)")
    spark.sql(s"INSERT INTO $tbl VALUES (2, 20, 'x'), (3, 21, 'y')")
    // kill ALL of part 0 and one row of part 1 (ordinals 0,1,2)
    spark.sql(s"DELETE FROM $tbl WHERE user_id <= 2") // v3
    assert(GraftLakeMaintenance.compactDeletionVectors(dir, 0.0)
      === Seq(0)) // v4
    val v4dir = GraftLakeIO.versionDir(dir, 4)
    val parts = GraftLakeIO.shardParts(v4dir, 0)
    assert(parts.length === 1 &&
      parts.head.getName.contains(".p1.parquet"),
      "part 0 emptied out and dropped; part 1 keeps its seq")
    assert(GraftLakeIO.readDv(v4dir).isEmpty)
    val rows = spark.sql(
      s"SELECT user_id, score, note FROM $tbl ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq === Seq((3L, 21L, "y")))
    spark.sql(s"DROP TABLE $tbl")
  }
}
