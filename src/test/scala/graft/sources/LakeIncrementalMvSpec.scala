package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The JOIN-MV's IVM support relation (`lake_incremental_mv_join`):
  * MV maintenance must cost O(|changes|), and in particular a
  * DIM-ONLY maintenance cycle must plan NO fact-table scan — the
  * F_base ⋈ ΔD leg joins the dim delta against the persisted
  * per-join-key partial aggregate (the support relation) instead of
  * re-reading the fact base, and the ΔF feed over an unchanged fact
  * plans zero partitions. */
class LakeIncrementalMvSpec extends SparkSpec {

  test("dim-only maintenance cycle: ΔD leg reads support relation " +
      "only (no fact scan), unchanged-fact ΔF feed plans zero " +
      "partitions, and the incremental head equals the direct join") {
    Lake.registerCatalog(spark)
    for (t <- Seq("spec_mvi_f", "spec_mvi_d", "spec_mvi_s",
        "spec_mvi_b"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql("""CREATE TABLE graft_lake.lake.spec_mvi_f
      (okey BIGINT, cust BIGINT, price_c BIGINT)
      TBLPROPERTIES ('shard_key'='okey', 'n_shards'='4')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_mvi_f
      SELECT id, id % 5, 100 + id FROM range(0, 40)""") // fact v1
    spark.sql("""CREATE TABLE graft_lake.lake.spec_mvi_d
      (cust BIGINT, nation BIGINT)
      TBLPROPERTIES ('shard_key'='cust', 'n_shards'='2')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_mvi_d
      SELECT id, id % 3 FROM range(0, 5)""")            // dim v1
    // materialize the support relation + the MV base at (v1, v1)
    spark.sql("""CREATE TABLE graft_lake.lake.spec_mvi_s
      (cust BIGINT, cents BIGINT, n BIGINT)
      TBLPROPERTIES ('shard_key'='cust', 'n_shards'='2')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_mvi_s
      SELECT cust, CAST(sum(price_c) AS BIGINT),
        CAST(count(*) AS BIGINT)
      FROM graft_lake.lake.spec_mvi_f VERSION AS OF 1 GROUP BY cust""")
    spark.sql("""CREATE TABLE graft_lake.lake.spec_mvi_b
      (nation BIGINT, cents BIGINT, n BIGINT)
      TBLPROPERTIES ('shard_key'='nation', 'n_shards'='2')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_mvi_b
      SELECT d.nation, CAST(sum(f.price_c) AS BIGINT),
        CAST(count(*) AS BIGINT)
      FROM (SELECT * FROM graft_lake.lake.spec_mvi_f VERSION AS OF 1) f
      JOIN (SELECT * FROM graft_lake.lake.spec_mvi_d VERSION AS OF 1) d
        ON f.cust = d.cust GROUP BY d.nation""")
    // the maintenance cycle under test: the DIM moves, the fact does
    // not (cust 1 migrates nation 1 → 2, cust 4 leaves)
    spark.sql("""UPDATE graft_lake.lake.spec_mvi_d
      SET nation = 2 WHERE cust = 1""")
    spark.sql("DELETE FROM graft_lake.lake.spec_mvi_d WHERE cust = 4")

    def changes(tbl: String) = spark.read
      .option("startingVersion", "1")
      .table(s"graft_lake.lake.`$tbl$$changes`")
      .withColumn("sgn",
        expr("""CASE WHEN _change_type IN ('insert',
                'update_postimage') THEN 1L ELSE -1L END"""))

    // ΔF over the UNCHANGED fact: zero planned partitions — the
    // O(|changes|) claim at the scan level, not just row counts
    val df = changes("spec_mvi_f")
    val dfScan = df.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[BatchScanExec]
    assert(dfScan.inputPartitions.isEmpty,
      s"unchanged fact planned ${dfScan.inputPartitions.length} " +
        "change partitions — dim-only maintenance must be fact-free")

    // the ΔD leg: support relation ⋈ dim delta — its physical plan
    // must never mention the fact table
    val leg = spark.table("graft_lake.lake.spec_mvi_s")
      .join(changes("spec_mvi_d").select("cust", "nation", "sgn"),
        "cust")
      .groupBy("nation")
      .agg(sum(expr("sgn * cents")).as("d_cents"),
        sum(expr("sgn * n")).as("d_n"))
    val plan = leg.queryExecution.executedPlan.toString
    assert(!plan.contains("spec_mvi_f"),
      s"dim-delta leg scans the fact table:\n$plan")

    // and the maintained head is exact: base + ΔD-leg == direct join
    val head = spark.table("graft_lake.lake.spec_mvi_b")
      .join(leg, Seq("nation"), "full_outer")
      .selectExpr("nation",
        "coalesce(cents, 0L) + coalesce(d_cents, 0L) AS cents",
        "coalesce(n, 0L) + coalesce(d_n, 0L) AS n")
      .filter(col("n") > 0)
    val direct = spark.sql(
      """SELECT d.nation, CAST(sum(f.price_c) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n
         FROM graft_lake.lake.spec_mvi_f f
         JOIN graft_lake.lake.spec_mvi_d d ON f.cust = d.cust
         GROUP BY d.nation""")
    assert(head.orderBy("nation").collect().toSeq ===
      direct.orderBy("nation").collect().toSeq)
  }
}
