package graft.sources

import java.io.File

import graft.SparkSpec

/** Lake-catalog SQL views — parser + resolution wiring over the DSv2
  * `ViewCatalog` storage ([[LakeViewSql]]): vanilla Spark refuses v2
  * view DDL, so the extension supplies it (the Iceberg model). */
class LakeViewSpec extends SparkSpec {

  private def lakeRoot: File = {
    Lake.registerCatalog(spark)
    new File(spark.conf.get("spark.sql.catalog.graft_lake.path"))
  }

  test("CREATE VIEW persists a catalog descriptor; SELECT re-resolves " +
      "over the CURRENT snapshot; OR REPLACE swaps the definition; " +
      "SHOW VIEWS lists; DROP VIEW removes; nested views inline") {
    val tbl = "graft_lake.lake.spec_view_base"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql("DROP VIEW IF EXISTS graft_lake.lake.spec_view_v")
    spark.sql("DROP VIEW IF EXISTS graft_lake.lake.spec_view_w")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (0, 5), (1, 50), (2, 500)")
    spark.sql(s"""CREATE VIEW graft_lake.lake.spec_view_v AS
      SELECT user_id, score FROM $tbl WHERE score >= 50""")
    assert(GraftLakeViews.viewFile(lakeRoot.getPath, "spec_view_v")
      .exists(), "the view descriptor must persist in the catalog")
    assert(spark.sql(
      "SELECT user_id FROM graft_lake.lake.spec_view_v ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // tracks the CURRENT snapshot, not creation time
    spark.sql(s"INSERT INTO $tbl VALUES (3, 5000)")
    spark.sql(s"DELETE FROM $tbl WHERE user_id = 1")
    assert(spark.sql(
      "SELECT user_id FROM graft_lake.lake.spec_view_v ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // a nested view over the view inlines through resolution
    spark.sql("""CREATE VIEW graft_lake.lake.spec_view_w AS
      SELECT sum(score) AS total FROM graft_lake.lake.spec_view_v""")
    assert(spark.sql(
      "SELECT total FROM graft_lake.lake.spec_view_w")
      .head.getLong(0) === 5500L)
    // plain CREATE VIEW refuses an existing name; OR REPLACE swaps
    intercept[Exception] {
      spark.sql(s"""CREATE VIEW graft_lake.lake.spec_view_v AS
        SELECT 1 AS one""")
    }
    spark.sql(s"""CREATE OR REPLACE VIEW graft_lake.lake.spec_view_v
      AS SELECT user_id FROM $tbl WHERE score < 50""")
    assert(spark.sql(
      "SELECT user_id FROM graft_lake.lake.spec_view_v")
      .collect().map(_.getLong(0)).toSeq === Seq(0L))
    // SHOW VIEWS
    val shown = spark.sql("SHOW VIEWS IN graft_lake.lake").collect()
      .map(_.getString(1)).toSet
    assert(Set("spec_view_v", "spec_view_w").subsetOf(shown))
    // a view over a bad body fails at CREATE, not first read
    intercept[Exception] {
      spark.sql("""CREATE VIEW graft_lake.lake.spec_view_bad AS
        SELECT no_such_col FROM graft_lake.lake.spec_view_base""")
    }
    assert(!GraftLakeViews.viewFile(lakeRoot.getPath, "spec_view_bad")
      .exists())
    spark.sql("DROP VIEW graft_lake.lake.spec_view_w")
    spark.sql("DROP VIEW graft_lake.lake.spec_view_v")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_lake.lake.spec_view_v").collect()
    }
    intercept[Exception] { // DROP without IF EXISTS on a gone view
      spark.sql("DROP VIEW graft_lake.lake.spec_view_v")
    }
    spark.sql(s"DROP TABLE $tbl")
  }

  test("the programmatic ViewCatalog API shares the same storage: " +
      "createView via the DSv2 interface is visible to SQL reads") {
    val tbl = "graft_lake.lake.spec_view_api"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql("DROP VIEW IF EXISTS graft_lake.lake.spec_view_apiview")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (7, 70)")
    val cat = new GraftLakeCatalog {
      initialize("graft_lake", new org.apache.spark.sql.util
        .CaseInsensitiveStringMap(java.util.Map.of("path",
          lakeRoot.getPath)))
    }
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("lake"), "spec_view_apiview")
    cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, s"SELECT score FROM $tbl", "graft_lake", Array("lake"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.LongType))),
      Array("score"), Array.empty, Array.empty, java.util.Map.of()))
    assert(cat.viewExists(ident))
    assert(cat.listViews("lake").map(_.name())
      .contains("spec_view_apiview"))
    assert(spark.sql(
      "SELECT score FROM graft_lake.lake.spec_view_apiview")
      .head.getLong(0) === 70L)
    assert(cat.loadView(ident).query().contains("SELECT score"))
    assert(cat.dropView(ident) && !cat.viewExists(ident))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("definer context: an UNQUALIFIED relation in a stored view body " +
      "resolves against the catalog/namespace captured at CREATE, not " +
      "the reading session's current catalog") {
    val tbl = "graft_lake.lake.spec_view_defctx_base"
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql("DROP VIEW IF EXISTS graft_lake.lake.spec_view_defctx")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, score BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 11), (2, 22)")
    val cat = new GraftLakeCatalog {
      initialize("graft_lake", new org.apache.spark.sql.util
        .CaseInsensitiveStringMap(java.util.Map.of("path",
          lakeRoot.getPath)))
    }
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("lake"), "spec_view_defctx")
    // the stored body references the base table by BARE name; the
    // descriptor carries the definer's catalog+namespace
    cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, "SELECT score FROM spec_view_defctx_base WHERE score > 15",
      "graft_lake", Array("lake"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.LongType))),
      Array("score"), Array.empty, Array.empty, java.util.Map.of()))
    // the reading session's current catalog is spark_catalog — bare
    // `spec_view_defctx_base` does NOT exist there; only the stored
    // definer context can resolve it
    assert(spark.catalog.currentCatalog() == "spark_catalog")
    assert(spark.sql(
      "SELECT score FROM graft_lake.lake.spec_view_defctx")
      .collect().map(_.getLong(0)).toSeq === Seq(22L))
    // a CTE name inside the body keeps binding to the CTE, never the
    // definer namespace
    assert(cat.dropView(ident))
    cat.createView(viewInfo(ident,
      """WITH spec_view_defctx_base AS (SELECT 99 AS score)
         SELECT score FROM spec_view_defctx_base"""))
    assert(spark.sql(
      "SELECT score FROM graft_lake.lake.spec_view_defctx")
      .head.getInt(0) === 99)
    assert(cat.dropView(ident))
    spark.sql(s"DROP TABLE $tbl")
  }

  private def viewInfo(
      ident: org.apache.spark.sql.connector.catalog.Identifier,
      sql: String) =
    new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, sql, "graft_lake", Array("lake"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.IntegerType))),
      Array("score"), Array.empty, Array.empty, java.util.Map.of())
}
