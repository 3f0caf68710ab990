package graft.sources

import java.io.File

import graft.SparkSpec

/** `CALL graft_lake.system.…` — DSv2 stored procedures driving the
  * lake's maintenance verbs from literal SQL (the Trino/Iceberg
  * `ALTER TABLE EXECUTE optimize` / `CALL system.expire_snapshots`
  * surface). */
class LakeProcedureSpec extends SparkSpec {

  private def lakeRoot: File = {
    Lake.registerCatalog(spark)
    new File(spark.conf.get("spark.sql.catalog.graft_lake.path"))
  }

  test("CALL optimize: deletion-vector phase clears vectors, " +
      "part-count phase merges append parts; data identical; " +
      "named and defaulted arguments bind") {
    val tbl = "graft_lake.lake.spec_call_opt"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2',
        'delete_mode'='merge-on-read')""")
    val dir = new File(lakeRoot, "spec_call_opt").getPath
    // 6 append commits -> 6 parts per shard; one MoR delete -> DVs
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO $tbl VALUES (${i * 2}, $i), " +
        s"(${i * 2 + 1}, $i)"))
    spark.sql(s"DELETE FROM $tbl WHERE user_id < 4") // v7
    assert(GraftLakeIO.readDv(GraftLakeIO.versionDir(dir, 7)).nonEmpty)
    val res = spark.sql(
      s"""CALL graft_lake.system.optimize(table => 'spec_call_opt',
          dv_threshold => 0.01, max_parts => 1)""").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(res("deletion_vectors") === 2, "both shards carried DVs")
    assert(res("part_files") === 2, "both shards exceeded max_parts")
    val head = GraftLakeIO.latestVersion(dir)
    val headDir = GraftLakeIO.versionDir(dir, head)
    assert(GraftLakeIO.readDv(headDir).isEmpty)
    (0 to 1).foreach(k =>
      assert(GraftLakeIO.shardParts(headDir, k).length === 1))
    val live = spark.sql(s"SELECT user_id FROM $tbl ORDER BY user_id")
      .collect().map(_.getLong(0)).toSeq
    assert(live === (4L to 11L))
    // defaults: CALL with table only binds dv_threshold/max_parts
    val res2 = spark.sql(
      s"CALL graft_lake.system.optimize('spec_call_opt')").collect()
    assert(res2.length === 2 && res2.forall(_.getInt(1) === 0),
      "an already-optimized table compacts nothing")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("part compaction preserves deletion-vector positions (raw " +
      "append keeps the concatenation order) and schema boundaries") {
    val tbl = "graft_lake.lake.spec_call_dvparts"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='1',
        'delete_mode'='merge-on-read')""")
    val dir = new File(lakeRoot, "spec_call_dvparts").getPath
    spark.sql(s"INSERT INTO $tbl VALUES (0, 0), (1, 1)") // part 0
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2), (3, 3)") // part 1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN (note STRING)")
    spark.sql(s"INSERT INTO $tbl VALUES (4, 4, 'x')") // part 2, evolved
    spark.sql(s"DELETE FROM $tbl WHERE user_id IN (1, 4)") // DV {1, 4}
    // ONLY part compaction (dv_threshold 1.0 refuses: 2/5 < 1.0)
    spark.sql(s"""CALL graft_lake.system.optimize('spec_call_dvparts',
        dv_threshold => 1.0, max_parts => 2)""").collect()
    val head = GraftLakeIO.latestVersion(dir)
    val headDir = GraftLakeIO.versionDir(dir, head)
    val parts = GraftLakeIO.shardParts(headDir, 0)
    assert(parts.length === 2,
      "pre-evolution run merged to one part; evolved part separate")
    // the carried vector still masks exactly users 1 and 4
    assert(GraftLakeIO.readDv(headDir)(0).getCardinality === 2)
    val rows = spark.sql(
      s"SELECT user_id, score, note FROM $tbl ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq === Seq((0L, 0L, null), (2L, 2L, null),
      (3L, 3L, null)))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("tags: VERSION AS OF 'name' resolves through _refs.json, " +
      "expire_snapshots RETAINS tagged snapshots, drop_tag makes " +
      "them expirable again") {
    val tbl = "graft_lake.lake.spec_call_tag"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (0, 0)") // v1
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1)") // v2
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2)") // v3
    val r = spark.sql(s"""CALL graft_lake.system.create_tag(
        'spec_call_tag', 'audit', version => 1)""").head
    assert((r.getString(0), r.getInt(1)) === ("audit", 1))
    // default version pins the current head
    assert(spark.sql(s"""CALL graft_lake.system.create_tag(
        'spec_call_tag', 'latest_good')""").head.getInt(1) === 3)
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl VERSION AS OF 'audit'")
      .head.getLong(0) === 1L)
    // the $refs metadata table lists the registry
    assert(spark.sql(
      "SELECT tag, version FROM " +
        "`graft_lake`.`lake`.`spec_call_tag$refs` ORDER BY tag")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toSeq ===
      Seq("audit" -> 1, "latest_good" -> 3))
    // expiry keeps the newest 1 AND every tagged snapshot
    val surviving = spark.sql(s"""CALL graft_lake.system
        .expire_snapshots('spec_call_tag', keep => 1)""").collect()
      .map(_.getInt(0)).toSeq
    assert(surviving === Seq(1, 3), "v2 expired, tagged v1 retained")
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl VERSION AS OF 'audit'")
      .head.getLong(0) === 1L)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2").collect()
    }
    // dropping the tag releases the pin
    assert(spark.sql(s"""CALL graft_lake.system.drop_tag(
        'spec_call_tag', 'audit')""").head.getBoolean(0))
    val surviving2 = spark.sql(s"""CALL graft_lake.system
        .expire_snapshots('spec_call_tag', keep => 1)""").collect()
      .map(_.getInt(0)).toSeq
    assert(surviving2 === Seq(3))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'audit'").collect()
    }
    assert(e.getMessage.contains("neither a version id nor a known"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("CALL expire_snapshots / rollback_to_version / vacuum round " +
      "the maintenance surface; SHOW PROCEDURES lists them") {
    val tbl = "graft_lake.lake.spec_call_life"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    val dir = new File(lakeRoot, "spec_call_life").getPath
    spark.sql(s"INSERT INTO $tbl VALUES (0, 0)") // v1
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1)") // v2
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2)") // v3
    // rollback to v2 as a NEW commit v4
    val head = spark.sql(
      s"""CALL graft_lake.system.rollback_to_version(
          'spec_call_life', 2)""").head.getInt(0)
    assert(head === 4)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0)
      === 2L)
    // expire everything but the newest two
    val surviving = spark.sql(
      s"""CALL graft_lake.system.expire_snapshots(
          'spec_call_life', keep => 2)""").collect()
      .map(_.getInt(0)).toSeq
    assert(surviving === Seq(3, 4))
    // vacuum with a zero age bound clears nothing here (no debris),
    // but must execute and return cleanly
    val removed = spark.sql(
      s"""CALL graft_lake.system.vacuum('spec_call_life',
          older_than_ms => 0L)""").collect()
    assert(removed.isEmpty)
    val procCells = spark.sql("SHOW PROCEDURES IN graft_lake.system")
      .collect().flatMap(r => (0 until r.length).map(i =>
        Option(r.get(i)).fold("")(_.toString))).toSet
    assert(GraftLakeProcedures.Names.forall(n =>
      procCells.exists(_.contains(n))),
      s"SHOW PROCEDURES must list the maintenance verbs, got " +
        procCells.mkString("[", ", ", "]"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("SHOW TBLPROPERTIES round-trips the DDL surface: layout and " +
      "write semantics are inspectable without descriptor files") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_props"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, kind STRING,
        v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4',
        'delete_mode'='merge-on-read',
        'write_distribution'='clustered',
        'write_upsert'='equality-delete',
        'upsert_keys'='user_id,kind')""")
    val props = spark.sql(s"SHOW TBLPROPERTIES $tbl").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("shard_key") === "user_id")
    assert(props("n_shards") === "4")
    assert(props("delete_mode") === "merge-on-read")
    assert(props("write_distribution") === "clustered")
    assert(props("write_upsert") === "equality-delete")
    assert(props("upsert_keys") === "user_id,kind")
    // defaults stay silent: no copy-on-write noise rows
    assert(!props.contains("update_mode") && !props.contains("merge_mode"))
    // ALTER-visible too: the property surface reflects the rewrite
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
      "('bloom_columns'='kind')")
    val props2 = spark.sql(s"SHOW TBLPROPERTIES $tbl").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2("bloom_columns") === "kind")
    assert(props2("write_upsert") === "equality-delete",
      "ALTER must not drop the upsert surface (round-14 advice class)")
    spark.sql(s"DROP TABLE $tbl")
  }

}
