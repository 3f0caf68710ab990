package graft.sources

import graft.SparkSpec

/** Hidden partitioning ([[GraftLakeTransform]]): `days(ts)` /
  * `months(ts)` shard keys route by a derived value of a TIMESTAMP
  * column — spec pins the layout-driven skip counts, the months
  * variant, and the DDL refusals. */
class LakeHiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tbl: String, key: String, n: Int, w: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (event_id BIGINT, ts TIMESTAMP)
      TBLPROPERTIES ('shard_key'='$key', 'n_shards'='$n',
        'shard_width'='$w')""")
  }

  test("days(ts): 8 days over 4 two-day buckets — a 2-day predicate " +
      "plans 1 shard and skips 3 via the ts zone maps (pruning by " +
      "layout, no partition column in the schema)") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_hidden_days"
    mk(tbl, "days(ts)", 4, 2)
    // two rows per day, days 2..9 of March — 2024-03-02 is epoch day
    // 19784, an even number, so the absolute 2-day buckets align with
    // the data's day pairs and the 8 days fill exactly 4 buckets
    (0L until 16L).map(i =>
        (i, java.sql.Timestamp.valueOf(f"2024-03-${2 + i / 2}%02d " +
          f"0${i % 2 * 6 + 3}:00:00")))
      .toDF("event_id", "ts")
      .createOrReplaceTempView("spec_hidden_days_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_hidden_days_src")
    GraftLakeScanMetrics.reset()
    val got = spark.sql(s"""SELECT event_id FROM $tbl
        WHERE ts >= TIMESTAMP '2024-03-08 00:00:00'
        ORDER BY event_id""").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(12L, 13L, 14L, 15L))
    assert(GraftLakeScanMetrics.planned.get() === 1L &&
      GraftLakeScanMetrics.skippedByStats.get() === 3L,
      s"expected 1 planned / 3 skipped, got " +
        s"${GraftLakeScanMetrics.planned.get()} / " +
        s"${GraftLakeScanMetrics.skippedByStats.get()}")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("months(ts): one month per shard; a month-range predicate " +
      "plans only its months") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_hidden_months"
    mk(tbl, "months(ts)", 4, 1)
    (0L until 8L).map(i =>
        (i, java.sql.Timestamp.valueOf(
          f"2024-0${1 + i / 2}%d-15 12:00:00")))
      .toDF("event_id", "ts")
      .createOrReplaceTempView("spec_hidden_months_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_hidden_months_src")
    GraftLakeScanMetrics.reset()
    val got = spark.sql(s"""SELECT event_id FROM $tbl
        WHERE ts >= TIMESTAMP '2024-04-01 00:00:00'
        ORDER BY event_id""").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(6L, 7L))
    assert(GraftLakeScanMetrics.planned.get() === 1L &&
      GraftLakeScanMetrics.skippedByStats.get() === 3L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("DDL refusals: a transform over a non-timestamp column and an " +
      "unknown raw column both fail loudly") {
    Lake.registerCatalog(spark)
    val e1 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_lake.lake.spec_hidden_bad1
        (event_id BIGINT, ts TIMESTAMP)
        TBLPROPERTIES ('shard_key'='days(event_id)', 'n_shards'='2')""")
    }
    assert(e1.getMessage.contains("requires a TIMESTAMP column"))
    val e2 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_lake.lake.spec_hidden_bad2
        (event_id BIGINT, ts TIMESTAMP)
        TBLPROPERTIES ('shard_key'='days(nope)', 'n_shards'='2')""")
    }
    assert(e2.getMessage.contains("not in schema"))
  }
}
