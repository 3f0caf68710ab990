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

  test("partition-spec evolution: days(ts) -> months(ts) re-routes " +
      "future writes, old shards keep never-mis-pruned provenance, " +
      "and zone maps keep skipping across both generations") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_pevolve"
    mk(tbl, "days(ts)", 4, 2)
    // 4 March days (epoch day 19784 = 2024-03-02, even) in 2-day
    // buckets -> shards 0 and 1 only; shards 2/3 stay empty so the
    // post-evolution month routes to a FRESH shard
    (0L until 8L).map(i =>
        (i, java.sql.Timestamp.valueOf(f"2024-03-${2 + i / 2}%02d " +
          f"0${i % 2 * 6 + 3}:00:00")))
      .toDF("event_id", "ts")
      .createOrReplaceTempView("spec_pevolve_src_a")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_pevolve_src_a")
    spark.sql(s"""ALTER TABLE $tbl SET TBLPROPERTIES
      ('shard_key'='months(ts)', 'shard_width'='1')""")
    // April 2024: month index 2024*12+4-1 = 24291, mod 4 = 3 -> the
    // fresh shard 3, routed by the NEW transform
    (100L until 104L).map(i =>
        (i, java.sql.Timestamp.valueOf(s"2024-04-${i - 90} 12:00:00")))
      .toDF("event_id", "ts")
      .createOrReplaceTempView("spec_pevolve_src_b")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_pevolve_src_b")

    val root = spark.conf.get("spark.sql.catalog.graft_lake.path")
    val dir = new java.io.File(root, "spec_pevolve").getPath
    val head = GraftLakeIO.versionDir(dir,
      GraftLakeIO.latestVersion(dir))
    val routing = GraftLakeIO.readRouting(head)
    assert(routing(0) === "days:2:4" && routing(1) === "days:2:4",
      s"old shards must keep their days provenance, got $routing")
    assert(routing(3) === "months:1:4",
      s"the fresh shard must carry the new transform's tag, got " +
        s"$routing")

    // cross-generation correctness: the full range reads both layouts
    val all = spark.sql(
      s"SELECT event_id FROM $tbl ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(all === ((0L until 8L) ++ (100L until 104L)))
    // layout pruning survives evolution: an April-only predicate
    // plans 1 shard (the months-routed one), skipping all 3 March-era
    // files via their OBSERVED ts zone maps
    GraftLakeScanMetrics.reset()
    val apr = spark.sql(s"""SELECT event_id FROM $tbl
        WHERE ts >= TIMESTAMP '2024-04-01 00:00:00'
        ORDER BY event_id""").collect().map(_.getLong(0)).toSeq
    assert(apr === (100L until 104L))
    assert(GraftLakeScanMetrics.planned.get() === 1L &&
      GraftLakeScanMetrics.skippedByStats.get() === 2L,
      s"expected 1 planned / 2 skipped, got " +
        s"${GraftLakeScanMetrics.planned.get()} / " +
        s"${GraftLakeScanMetrics.skippedByStats.get()}")

    // appending a March-era month into an OLD shard degrades its tag
    // to literal "mixed" (old tag != current routing at commit)
    // March month index 24290 mod 4 = 2 -> shard 2 is fresh under
    // months; instead hit shard 0: need month ≡ 0 (mod 4) -> 24288 =
    // 2024-01 (2024*12+1-1). January rows route to shard 0, which
    // holds days-routed March rows.
    (200L until 202L).map(i =>
        (i, java.sql.Timestamp.valueOf(s"2024-01-1${i - 199} 08:00:00")))
      .toDF("event_id", "ts")
      .createOrReplaceTempView("spec_pevolve_src_c")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_pevolve_src_c")
    val head2 = GraftLakeIO.versionDir(dir,
      GraftLakeIO.latestVersion(dir))
    val routing2 = GraftLakeIO.readRouting(head2)
    assert(routing2(0) === "mixed",
      s"append-merged old shard must degrade to mixed, got $routing2")
    assert(routing2(1) === "days:2:4" && routing2(3) === "months:1:4",
      s"untouched shards keep their tags, got $routing2")

    // time travel ACROSS the evolution fence: a pre-evolution snapshot
    // read under the post-evolution descriptor answers exactly —
    // pruning is governed by that snapshot's own recorded provenance
    // and observed zone maps, never the current routing
    val v1 = spark.sql(
      s"SELECT event_id FROM $tbl VERSION AS OF 1 ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(v1 === (0L until 8L),
      s"days-era snapshot must read exactly batch A, got $v1")
    assert(spark.sql(s"""SELECT count(*) FROM $tbl VERSION AS OF 1
        WHERE ts >= TIMESTAMP '2024-04-01 00:00:00'""")
      .head.getLong(0) === 0L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("partition-spec evolution refusals: plain<->transform, a " +
      "different raw column, and upsert tables all fail loudly; " +
      "n_shards evolution keeps old point-lookups routing under " +
      "their recorded tags") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_pevolve_ref"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl
      (user_id BIGINT, ts TIMESTAMP, other_ts TIMESTAMP)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='8')""")
    val e1 = intercept[Exception] { spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('shard_key'='days(ts)')") }
    assert(e1.getMessage.contains("only hidden-transform changes"))
    val e2 = intercept[Exception] { spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('shard_key'='ts')") }
    assert(e2.getMessage.contains("only hidden-transform changes"))
    spark.sql(s"DROP TABLE $tbl")

    val tr = "graft_lake.lake.spec_pevolve_tr"
    mk(tr, "days(ts)", 4, 2)
    spark.sql(s"ALTER TABLE $tr ADD COLUMN other_ts TIMESTAMP")
    val e3 = intercept[Exception] { spark.sql(
      s"ALTER TABLE $tr SET TBLPROPERTIES " +
        "('shard_key'='months(other_ts)')") }
    assert(e3.getMessage.contains("raw routing column must stay"))
    // the raw column of a transform key cannot be dropped
    val e4 = intercept[Exception] { spark.sql(
      s"ALTER TABLE $tr DROP COLUMN ts") }
    assert(e4.getMessage.contains("cannot drop the shard key"))
    spark.sql(s"DROP TABLE $tr")

    val up = "graft_lake.lake.spec_pevolve_up"
    spark.sql(s"DROP TABLE IF EXISTS $up")
    spark.sql(s"""CREATE TABLE $up (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4',
        'write_upsert'='equality-delete')""")
    val e5 = intercept[Exception] { spark.sql(
      s"ALTER TABLE $up SET TBLPROPERTIES ('n_shards'='8')") }
    assert(e5.getMessage.contains("n_shards is frozen"))
    spark.sql(s"DROP TABLE $up")

    // n_shards evolution on a plain table: keys written under hash:4
    // keep routing under THEIR tag after the table moves to 8 shards
    val ns = "graft_lake.lake.spec_pevolve_ns"
    spark.sql(s"DROP TABLE IF EXISTS $ns")
    spark.sql(s"""CREATE TABLE $ns (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='4')""")
    spark.sql(s"""INSERT INTO $ns
      SELECT id AS user_id, id * 7 AS v FROM range(0, 16)""")
    spark.sql(s"ALTER TABLE $ns SET TBLPROPERTIES ('n_shards'='8')")
    // 100..103 ≡ 4..7 (mod 8): all land in shards EMPTY under hash:4,
    // so the old shards' tags stay generation-true (an append into an
    // old shard would correctly degrade it to mixed)
    spark.sql(s"""INSERT INTO $ns
      SELECT id AS user_id, id * 7 AS v FROM range(100, 104)""")
    // 101 mod 8 = 5, a shard empty under hash:4 -> fresh hash:8 tag;
    // a point lookup on an OLD key (3 mod 4 = 3) must still find it
    val got = spark.sql(
      s"SELECT v FROM $ns WHERE user_id IN (3, 101) ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(21L, 707L))
    val nsDir = new java.io.File(
      spark.conf.get("spark.sql.catalog.graft_lake.path"),
      "spec_pevolve_ns").getPath
    val nsHead = GraftLakeIO.versionDir(nsDir,
      GraftLakeIO.latestVersion(nsDir))
    val nsRouting = GraftLakeIO.readRouting(nsHead)
    assert(nsRouting(3) === "hash:4" && nsRouting(5) === "hash:8",
      s"expected generation-true tags, got $nsRouting")
    spark.sql(s"DROP TABLE $ns")
  }

  test("row-level DML on an EVOLVED table: a CoW DELETE/UPDATE of " +
      "days-era rows re-routes survivors by the CURRENT months " +
      "transform (rows may change shards; results exact; provenance " +
      "never lies)") {
    Lake.registerCatalog(spark)
    val tbl = "graft_lake.lake.spec_pevolve_dml"
    mk(tbl, "days(ts)", 4, 2)
    // March days 2..5 -> shards 0/1 under days; under months(1) ALL
    // March rows route to shard 24290 % 4 = 2
    (0L until 8L).map(i =>
        (i, java.sql.Timestamp.valueOf(f"2024-03-${2 + i / 2}%02d " +
          f"0${i % 2 * 6 + 3}:00:00")))
      .toDF("event_id", "ts")
      .createOrReplaceTempView("spec_pevolve_dml_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM spec_pevolve_dml_src")
    spark.sql(s"""ALTER TABLE $tbl SET TBLPROPERTIES
      ('shard_key'='months(ts)', 'shard_width'='1')""")

    // CoW DELETE touches old days-shards; surviving rows rewrite
    // routed by months -> they MOVE to shard 2
    spark.sql(s"DELETE FROM $tbl WHERE event_id IN (1, 6)")
    val afterDel = spark.sql(
      s"SELECT event_id FROM $tbl ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(afterDel === Seq(0L, 2L, 3L, 4L, 5L, 7L))

    // CoW UPDATE: bump an event's ts into April -> the rewritten row
    // must route to April's month shard (24291 % 4 = 3)
    spark.sql(s"""UPDATE $tbl
      SET ts = TIMESTAMP '2024-04-02 09:00:00' WHERE event_id = 0""")
    val got = spark.sql(s"""SELECT event_id FROM $tbl
        WHERE ts >= TIMESTAMP '2024-04-01 00:00:00'""")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L))
    assert(spark.sql(s"SELECT count(*) FROM $tbl")
      .head.getLong(0) === 6L)

    // physical honesty: no row lives in a shard whose recorded
    // non-mixed provenance couldn't have produced it — every shard's
    // rows re-derive their tag's routing
    val root = spark.conf.get("spark.sql.catalog.graft_lake.path")
    val dir = new java.io.File(root, "spec_pevolve_dml").getPath
    val head = GraftLakeIO.versionDir(dir,
      GraftLakeIO.latestVersion(dir))
    val routing = GraftLakeIO.readRouting(head)
    val byShard = spark.sql(
      s"SELECT _shard, ts FROM $tbl")
      .collect().groupBy(_.getInt(0))
    byShard.foreach { case (k, rows) =>
      routing.get(k) match {
        case Some(tag) if tag != "mixed" =>
          val Array(tr, w, n) = tag.split(":")
          rows.foreach { r =>
            val micros = r.getTimestamp(1).getTime * 1000L
            val derived = GraftLakeTransform.derive(tr, micros)
            val expect = java.lang.Math.floorMod(
              java.lang.Math.floorDiv(derived, w.toLong),
              n.toLong).toInt
            assert(expect === k,
              s"row ${r} in shard $k violates its tag $tag")
          }
        case _ => // mixed/absent: no claim to check
      }
    }
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
