package graft.sources

import graft.SparkSpec

/** `write_distribution = clustered`: the lake write declares
  * `Distributions.clustered(bucket(nShards, shardKey))` via DSv2
  * `RequiresDistributionAndOrdering`, Spark shuffles the input with
  * [[GraftBucketFunction]], and every shard's rows land in one task —
  * the commit then ADOPTS each shard's single staged file by
  * hardlink instead of merging task fragments. */
class LakeClusteredWriteSpec extends SparkSpec {

  test("clustered write: a wide, badly-partitioned insert commits " +
      "with every shard adopted (one staged file each), zero merges") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_clw"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='8',
        'write_distribution'='clustered')""")
    // 16 input partitions, every one holding rows of every shard —
    // without the declared distribution this stages up to 16 files
    // per shard and the commit merges them
    spark.range(0, 256).repartition(16)
      .selectExpr("id AS user_id", "id * 3 AS v")
      .createOrReplaceTempView("spec_clw_src")
    GraftLakeScanMetrics.reset()
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_clw_src")
    assert(GraftLakeScanMetrics.mergedParts.get() === 0L,
      "clustered write must never merge task fragments")
    assert(GraftLakeScanMetrics.adoptedParts.get() === 8L,
      s"each shard adopted once, got " +
        s"${GraftLakeScanMetrics.adoptedParts.get()}")
    val rows = spark.sql(s"SELECT user_id, v FROM $tbl").collect()
    assert(rows.length === 256)
    rows.foreach(r => assert(r.getLong(1) === r.getLong(0) * 3))
  }

  test("unclustered twin of the same insert merges task fragments " +
      "(the behavior clustering removes)") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_clw_none"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='8')""")
    spark.range(0, 256).repartition(16)
      .selectExpr("id AS user_id", "id * 3 AS v")
      .createOrReplaceTempView("spec_clw_none_src")
    GraftLakeScanMetrics.reset()
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_clw_none_src")
    assert(GraftLakeScanMetrics.mergedParts.get() === 8L,
      s"every shard assembled from fragments, got merged=" +
        s"${GraftLakeScanMetrics.mergedParts.get()}")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0)
      === 256L)
  }

  test("clustered DDL is refused for range-clustered tables and " +
      "composes with MERGE (row-level replacement writes cluster " +
      "too, results exact)") {
    Lake.registerCatalog(spark)
    intercept[IllegalArgumentException] {
      spark.sql("""CREATE TABLE graft_lake.lake.spec_clw_bad
        (user_id BIGINT, v BIGINT)
        TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='8',
          'shard_width'='4', 'write_distribution'='clustered')""")
    }
    val tbl = "graft_lake.lake.spec_clw_merge"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4',
        'write_distribution'='clustered')""")
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, id FROM range(0, 16)""")
    spark.sql(s"""MERGE INTO $tbl t
      USING (SELECT id AS user_id, id * 100 AS v
             FROM range(2, 20)) s
      ON t.user_id = s.user_id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    val m = spark.sql(s"SELECT user_id, v FROM $tbl").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size === 20)
    (0L until 2L).foreach(i => assert(m(i) === i))
    (2L until 20L).foreach(i => assert(m(i) === i * 100))
  }
}
