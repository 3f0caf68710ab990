package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec

/** Deterministic TABLESAMPLE (Trino BERNOULLI/SYSTEM syntax):
  *  - the parser extension lowers Trino syntax to magic-seeded Sample
  *    nodes and [[graft.plans.RewriteTrinoTablesample]] replaces them
  *    with hash-deterministic forms;
  *  - SYSTEM is METADATA-ONLY: the scan plans exactly the surviving
  *    shards (pinned via [[GraftLakeScan.plannedShards]]), never
  *    touching unsampled shards;
  *  - BERNOULLI equals the explicit portable-hash row filter;
  *  - real REPEATABLE seeds and non-lake children are left to vanilla
  *    Spark sampling. */
class LakeTablesampleSpec extends SparkSpec {

  private val tbl = "graft_lake.lake.spec_tsample"

  private def mk(): Unit = {
    Lake.registerCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (doc_id BIGINT, lang STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='8')""")
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, concat('l', CAST(id % 3 AS STRING)) FROM range(0, 400)""")
  }

  test("SYSTEM(50) plans exactly the hash-surviving shards " +
      "(metadata-only) and returns whole shards") {
    mk()
    val df = spark.sql(
      s"SELECT doc_id FROM $tbl TABLESAMPLE SYSTEM(50)")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[GraftLakeScan]
    }.get
    val keep = (0 until 8).filter { k =>
      graft.plans.HashUtil.hex60md5(
        org.apache.spark.unsafe.types.UTF8String
          .fromString(s"tsys_8_$k")) % 1000000L < 500000L
    }.toSet
    assert(keep === Set(0, 3, 4, 7)) // pinned: a PROPER subset
    assert(scan.plannedShards === keep,
      s"scan planned ${scan.plannedShards}, expected $keep")
    val got = df.collect().map(_.getLong(0)).sorted
    val want = (0L until 400L)
      .filter(id => keep.contains((id % 8).toInt)).toArray
    assert(got === want)
  }

  test("BERNOULLI(30) equals the explicit portable-hash row filter " +
      "and is stable across runs") {
    mk()
    val sampled = spark.sql(
      s"""SELECT doc_id FROM $tbl TABLESAMPLE BERNOULLI(30)""")
      .collect().map(_.getLong(0)).sorted
    val manual = spark.sql(
      s"""SELECT doc_id FROM $tbl
          WHERE graft_hex60(concat('tsmp_', CAST(doc_id AS STRING)))
            % 1000000 < 300000""")
      .collect().map(_.getLong(0)).sorted
    assert(sampled === manual)
    assert(sampled.nonEmpty && sampled.length < 400)
    val again = spark.sql(
      s"""SELECT doc_id FROM $tbl TABLESAMPLE BERNOULLI(30)""")
      .collect().map(_.getLong(0)).sorted
    assert(sampled === again)
  }

  test("a real REPEATABLE seed is NOT rewritten (vanilla Sample " +
      "survives) and non-lake children fall back to vanilla sampling") {
    mk()
    // user's own REPEATABLE seed: stays Spark's seeded Sample — same
    // seed, same result; plan carries a Sample, no graft hash filter
    val a = spark.sql(s"""SELECT doc_id FROM $tbl
        TABLESAMPLE (30 PERCENT) REPEATABLE (42)""").collect()
    val b = spark.sql(s"""SELECT doc_id FROM $tbl
        TABLESAMPLE (30 PERCENT) REPEATABLE (42)""").collect()
    assert(a.map(_.getLong(0)).sorted === b.map(_.getLong(0)).sorted)
    // Trino syntax over a non-lake child: the magic seed finds no lake
    // relation and vanilla sampling applies (runs, roughly p fraction)
    spark.range(0, 1000).toDF("id").createOrReplaceTempView("ts_plain")
    val n = spark.sql(
      "SELECT id FROM ts_plain TABLESAMPLE BERNOULLI(50)").count()
    assert(n > 300 && n < 700, s"implausible sample size $n")
  }

  test("rewriteTablesample maps Trino syntax and leaves everything " +
      "else byte-identical") {
    val in = "SELECT * FROM t TABLESAMPLE BERNOULLI(30) WHERE x > 1"
    assert(LakeViewSql.rewriteTablesample(in) ===
      "SELECT * FROM t TABLESAMPLE (30 PERCENT) REPEATABLE " +
        s"(${LakeViewSql.BernoulliSampleSeed}) WHERE x > 1")
    val sys = "SELECT * FROM t TABLESAMPLE system( 12.5 )"
    assert(LakeViewSql.rewriteTablesample(sys) ===
      "SELECT * FROM t TABLESAMPLE (12.5 PERCENT) REPEATABLE " +
        s"(${LakeViewSql.SystemSampleSeed})")
    val plain = "SELECT * FROM t TABLESAMPLE (5 PERCENT)"
    assert(LakeViewSql.rewriteTablesample(plain) === plain)
    val noSample = "SELECT bernoulli FROM t"
    assert(LakeViewSql.rewriteTablesample(noSample) === noSample)
  }
}
