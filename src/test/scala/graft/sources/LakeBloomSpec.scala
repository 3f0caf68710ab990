package graft.sources

import java.io.File

import graft.SparkSpec

/** Bloom-filter sidecar skipping ([[GraftLakeBloom]]): equality/IN
  * predicates on a NON-key column prune shard files that zone maps
  * cannot (hash layout → every shard's [min,max] spans the domain).
  * Soundness pins: no false negative ever (every present value is
  * found), enable-after-data is conservative (carried shards stay
  * entry-less until rewritten), appends OR-merge coverage, and the
  * merge-on-read delta path keeps reinserted values findable. */
class LakeBloomSpec extends SparkSpec {

  private def lakeRoot: File = {
    Lake.registerCatalog(spark)
    new File(spark.conf.get("spark.sql.catalog.graft_lake.path"))
  }

  private def mk(tbl: String, dir: String, bloom: Boolean): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val props = "'shard_key'='user_id', 'n_shards'='8'" +
      (if (bloom) ", 'bloom_columns'='tag'" else "")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, tag STRING)
      TBLPROPERTIES ($props)""")
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, concat('u', CAST(id AS STRING)) FROM range(0, 64)""")
  }

  test("equality on a non-key string column skips 7 of 8 shards via " +
      "the bloom sidecar; IN probes the union; every present value " +
      "is still found (no false negatives)") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_bloom"
    mk(tbl, "spec_bloom", bloom = true)
    val vdir = GraftLakeIO.versionDir(
      new File(lakeRoot, "spec_bloom").getPath, 1)
    val side = GraftLakeBloom.read(vdir)
    assert(side.keySet === (0 to 7).toSet)
    assert(side.values.forall(_.keySet === Set("tag")))
    // zone maps alone CANNOT prune this: every shard's string range
    // spans u<low>..u<high>, so any skip observed below is bloom's
    GraftLakeScanMetrics.reset()
    val got = spark.sql(
      s"SELECT user_id FROM $tbl WHERE tag = 'u43'")
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(43L))
    assert(GraftLakeScanMetrics.skippedByBloom.get() === 7L,
      s"bloom skipped=${GraftLakeScanMetrics.skippedByBloom.get()} " +
        s"planned=${GraftLakeScanMetrics.planned.get()}")
    assert(GraftLakeScanMetrics.planned.get() === 1L)
    GraftLakeScanMetrics.reset()
    val got2 = spark.sql(
      s"SELECT user_id FROM $tbl WHERE tag IN ('u3', 'u12')")
      .collect().map(_.getLong(0)).sorted
    assert(got2.toSeq === Seq(3L, 12L)) // shards 3 and 4
    assert(GraftLakeScanMetrics.planned.get() === 2L)
    // exhaustive false-negative check
    val all = spark.sql(s"SELECT user_id, tag FROM $tbl").collect()
    assert(all.length === 64)
    (0L until 64L).foreach { id =>
      val r = spark.sql(
        s"SELECT user_id FROM $tbl WHERE tag = 'u$id'").collect()
      assert(r.map(_.getLong(0)).toSeq === Seq(id), s"lost u$id")
    }
  }

  test("appends OR-merge the filters: values from both the carried " +
      "and the appended half stay findable and selective") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_bloom_app"
    mk(tbl, "spec_bloom_app", bloom = true)
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, concat('v', CAST(id AS STRING)) FROM range(64, 80)""")
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT user_id FROM $tbl WHERE tag = 'v70'")
      .collect().map(_.getLong(0)).toSeq === Seq(70L))
    assert(GraftLakeScanMetrics.planned.get() === 1L)
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT user_id FROM $tbl WHERE tag = 'u43'")
      .collect().map(_.getLong(0)).toSeq === Seq(43L))
    assert(GraftLakeScanMetrics.planned.get() === 1L)
  }

  test("enabling bloom_columns AFTER data exists is conservative: " +
      "appended-to shards drop coverage (rows written before the " +
      "property have no filter) until a full rewrite restores it") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_bloom_late"
    mk(tbl, "spec_bloom_late", bloom = false)
    val dir = new File(lakeRoot, "spec_bloom_late").getPath
    assert(!GraftLakeBloom.bloomFile(GraftLakeIO.versionDir(dir, 1))
      .exists())
    spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('bloom_columns'='tag')")
    // append AFTER enabling: the staged half observes, but the
    // carried half has no entry -> intersection keeps the shard
    // entry-less, so no skip can lose the pre-property rows
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, concat('w', CAST(id AS STRING)) FROM range(64, 72)""")
    val v2 = GraftLakeIO.versionDir(dir, 2)
    assert(GraftLakeBloom.read(v2).isEmpty,
      "appended-to shards must stay uncovered (intersection rule)")
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT user_id FROM $tbl WHERE tag = 'u5'")
      .collect().map(_.getLong(0)).toSeq === Seq(5L))
    assert(GraftLakeScanMetrics.skippedByBloom.get() === 0L)
    // full rewrite: every shard is fresh, coverage resumes
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM $tbl")
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT user_id FROM $tbl WHERE tag = 'w70'")
      .collect().map(_.getLong(0)).toSeq === Seq(70L))
    assert(GraftLakeScanMetrics.planned.get() === 1L,
      "post-rewrite reads must skip on the rebuilt filters")
  }

  test("merge-on-read DML: DV deletes leave filters superset-sound " +
      "and reinserted values through the delta writer stay findable") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_bloom_mor"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, tag STRING)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='8',
        'bloom_columns'='tag', 'delete_mode'='merge-on-read',
        'update_mode'='merge-on-read')""")
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, concat('u', CAST(id AS STRING)) FROM range(0, 64)""")
    spark.sql(s"DELETE FROM $tbl WHERE user_id = 43")
    // deleted value: filter is stale-but-superset — the shard may
    // still plan, but the masked read returns nothing (correct)
    assert(spark.sql(s"SELECT user_id FROM $tbl WHERE tag = 'u43'")
      .collect().isEmpty)
    // UPDATE reroutes through delete+reinsert; the replacement tag
    // must enter the shard's filter (carried ∩ fresh both carry tag)
    spark.sql(s"UPDATE $tbl SET tag = 'x7' WHERE user_id = 7")
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT user_id FROM $tbl WHERE tag = 'x7'")
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(GraftLakeScanMetrics.planned.get() === 1L,
      "the reinserted value must be covered AND selective")
  }

  test("ALTER TABLE SET ('bloom_columns') enforces the same column-" +
      "existence and type validation as CREATE: a typo'd or DOUBLE " +
      "column fails the DDL loudly instead of never building filters") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_bloom_alter"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score DOUBLE)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    val typo = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE $tbl SET TBLPROPERTIES ('bloom_columns'='tagg')")
    }
    assert(typo.getMessage.contains("no such column"),
      s"expected the createTable refusal, got: ${typo.getMessage}")
    val float = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE $tbl SET TBLPROPERTIES ('bloom_columns'='score')")
    }
    assert(float.getMessage.contains("integral/date/string"),
      s"expected the type refusal, got: ${float.getMessage}")
    // a valid column still goes through
    spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('bloom_columns'='user_id')")
    spark.sql(s"DROP TABLE $tbl")
  }
}
