package graft.sources

import org.apache.spark.sql.execution.ColumnarToRowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Vectorized lake reads ([[GraftLakeColumnarPartitionReader]]):
  * plain scans must plan COLUMNAR (batches consumed via ColumnarToRow
  * inside whole-stage codegen — the scan-throughput contract at
  * 100 TB), the row path must remain for the shapes it is
  * structurally better at, and DV/equality-delete masking must stay
  * EXACT through batch compaction — including dead rows scattered
  * across vectorized-batch boundaries, which the tiny existing
  * fixtures never cross. */
class LakeColumnarSpec extends SparkSpec {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan
  }

  private def hasColumnarLakeScan(
      df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = executed(df)
    val flat = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }.flatMap(_.collect { case p => p })
    flat.exists {
      case c: ColumnarToRowExec =>
        c.child.toString.contains("GraftLakeScan")
      case _ => false
    }
  }

  test("a plain lake read plans columnar batches (ColumnarToRow over " +
      "the lake scan); LIMIT-pushed reads are columnar WITH early " +
      "stop; count(*) keeps the footer-served row path") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_colnar"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT,
      name STRING)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    (0L until 100L).map(i => (i, i * 2, s"u$i")).toDF(
      "user_id", "v", "name").createOrReplaceTempView("spec_colnar_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_colnar_src")

    assert(hasColumnarLakeScan(
      spark.table(tbl).filter(col("v") > 10)),
      "plain projected+filtered lake read must decode columnar")

    // LIMIT pushdown rides the vectorized path (round 15): columnar
    // decode, batch-grained early stop, Spark's retained limit trims
    val lim = spark.sql(s"SELECT user_id FROM $tbl LIMIT 3")
    assert(lim.collect().length === 3)
    assert(hasColumnarLakeScan(
      spark.sql(s"SELECT user_id FROM $tbl LIMIT 3")),
      "LIMIT-pushed lake reads must decode columnar")

    // count(*) stays footer-served (agg pushdown, or the metadata-only
    // row path when pushdown is off): zero data pages either way
    GraftLakeScanMetrics.reset()
    assert(spark.table(tbl).count() === 100L)
    assert(GraftLakeScanMetrics.aggPushdowns.get() > 0L ||
      GraftLakeScanMetrics.metadataOnlyReads.get() > 0L,
      "count(*) must stay footer-served, not decode batches")
    assert(GraftLakeScanMetrics.decodedColumns.get() === 0L,
      "count(*) must not decode any column")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("LIMIT early stop is batch-grained: a pushed LIMIT over a " +
      "multi-batch shard decodes one batch per partition, not the " +
      "shard") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_colnar_lim"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    // 40k rows -> ~5 four-k batches per shard
    (0L until 40000L).map(i => (i, i)).toDF("user_id", "v")
      .createOrReplaceTempView("spec_colnar_lim_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_colnar_lim_src")

    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT v FROM $tbl LIMIT 5")
      .collect().length === 5)
    val limBatches = GraftLakeScanMetrics.batchesDecoded.get()
    assert(limBatches <= 2L, // one batch per shard partition at most
      s"LIMIT 5 decoded $limBatches batches — early stop not firing")

    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"SELECT v FROM $tbl WHERE v >= 0")
      .collect().length === 40000)
    val fullBatches = GraftLakeScanMetrics.batchesDecoded.get()
    assert(fullBatches >= 10L, // ~5 per shard
      s"full scan decoded only $fullBatches batches?")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("masking stays exact through batch compaction: deletes and " +
      "equality-dead rows scattered across 4096-row batch boundaries, " +
      "schema-evolved parts served as null vectors") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_colnar_mask"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2',
        'delete_mode'='merge-on-read',
        'write_upsert'='equality-delete')""")
    val n = 10000L
    (0L until n).map(i => (i, i)).toDF("user_id", "v")
      .createOrReplaceTempView("spec_colnar_m1")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_colnar_m1")
    // upsert a scattered 10% (every 10th key) — equality-dead rows in
    // every vectorized batch of the base part
    (0L until n by 10L).map(i => (i, i + 1000000L)).toDF("user_id", "v")
      .createOrReplaceTempView("spec_colnar_m2")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_colnar_m2")
    // MoR DELETE a scattered 5% (every 20th key) — DV positions in
    // both the base part and the upsert part
    spark.sql(s"DELETE FROM $tbl WHERE user_id % 20 = 0")
    // schema evolution: new column, old parts serve constant nulls
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN tag STRING")
    Seq((1L, 7L, "x")).toDF("user_id", "v", "tag")
      .createOrReplaceTempView("spec_colnar_m3")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_colnar_m3")

    val df = spark.table(tbl)
    assert(hasColumnarLakeScan(df.filter(col("v") >= 0)),
      "the masked read must still be columnar (selection-vector " +
        "compaction, not a row fallback)")
    // exact recompute: every key not deleted; %10 keys (minus deleted)
    // upserted; key 1 re-upserted with the tag
    val expect = (0L until n).filterNot(_ % 20 == 0).map { i =>
      if (i == 1L) (i, 7L, "x")
      else if (i % 10 == 0) (i, i + 1000000L, null)
      else (i, i, null)
    }.toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got.size === expect.size, s"${got.size} vs ${expect.size}")
    assert(got === expect)
    spark.sql(s"DROP TABLE $tbl")
  }
}
