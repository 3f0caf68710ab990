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

  test("rewriteTablesample maps Trino syntax to fresh marker seeds " +
      "and leaves everything else byte-identical") {
    val in = "SELECT * FROM t TABLESAMPLE BERNOULLI(30) WHERE x > 1"
    val (rw, markers) = LakeViewSql.rewriteTablesample(in)
    assert(markers.size === 1)
    val (seed, variant) = markers.head
    assert(variant === "bernoulli")
    assert(rw ===
      s"SELECT * FROM t TABLESAMPLE (30 PERCENT) REPEATABLE ($seed) " +
        "WHERE x > 1")
    val sys = "SELECT * FROM t TABLESAMPLE system( 12.5 )"
    val (rwSys, mSys) = LakeViewSql.rewriteTablesample(sys)
    assert(mSys.values.toSeq === Seq("system"))
    assert(rwSys === "SELECT * FROM t TABLESAMPLE (12.5 PERCENT) " +
      s"REPEATABLE (${mSys.keys.head})")
    // two occurrences in one statement → two DISTINCT markers
    val two = "SELECT * FROM a TABLESAMPLE BERNOULLI(10) JOIN " +
      "b TABLESAMPLE BERNOULLI(20) ON a.k = b.k"
    val (_, mTwo) = LakeViewSql.rewriteTablesample(two)
    assert(mTwo.size === 2 && mTwo.values.toSet === Set("bernoulli"))
    val plain = "SELECT * FROM t TABLESAMPLE (5 PERCENT)"
    assert(LakeViewSql.rewriteTablesample(plain) === ((plain, Map.empty)))
    val noSample = "SELECT bernoulli FROM t"
    assert(LakeViewSql.rewriteTablesample(noSample) ===
      ((noSample, Map.empty)))
  }

  test("rewriteTablesample never touches string literals, quoted " +
      "identifiers or comments") {
    // the r16 ADVICE defect: a stored literal was silently corrupted
    val ins = "INSERT INTO t VALUES ('TABLESAMPLE BERNOULLI(30)')"
    assert(LakeViewSql.rewriteTablesample(ins) === ((ins, Map.empty)))
    val esc = "SELECT 'it''s TABLESAMPLE SYSTEM(50) text' FROM t"
    assert(LakeViewSql.rewriteTablesample(esc) === ((esc, Map.empty)))
    val cmt = "SELECT x FROM t -- TABLESAMPLE BERNOULLI(30)\nWHERE x>1"
    assert(LakeViewSql.rewriteTablesample(cmt) === ((cmt, Map.empty)))
    val blk = "SELECT x /* outer /* TABLESAMPLE SYSTEM(1) */ still " +
      "comment */ FROM t"
    assert(LakeViewSql.rewriteTablesample(blk) === ((blk, Map.empty)))
    val tick = "SELECT `TABLESAMPLE BERNOULLI(30)` FROM t"
    assert(LakeViewSql.rewriteTablesample(tick) === ((tick, Map.empty)))
    // mixed: code occurrence rewritten, literal untouched
    val mix = "SELECT 'TABLESAMPLE BERNOULLI(9)' FROM t " +
      "TABLESAMPLE BERNOULLI(30)"
    val (rwMix, mMix) = LakeViewSql.rewriteTablesample(mix)
    assert(mMix.size === 1)
    assert(rwMix.startsWith("SELECT 'TABLESAMPLE BERNOULLI(9)' FROM t "))
    assert(rwMix.contains(s"REPEATABLE (${mMix.keys.head})"))
  }

  test("a genuine REPEATABLE (60477001) — the r16 magic seed — is a " +
      "plain seeded Sample, never rewritten") {
    mk()
    val df = spark.sql(s"""SELECT doc_id FROM $tbl
        TABLESAMPLE (30 PERCENT) REPEATABLE (60477001)""")
    // the optimized plan keeps the Sample: the marker travels as an
    // out-of-band tag now, so no seed value can impersonate it
    val hasSample = df.queryExecution.optimizedPlan.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sample => s
    }
    assert(hasSample.isDefined,
      "user REPEATABLE(60477001) was rewritten away")
    val a = df.collect().map(_.getLong(0)).sorted
    val b = spark.sql(s"""SELECT doc_id FROM $tbl
        TABLESAMPLE (30 PERCENT) REPEATABLE (60477001)""")
      .collect().map(_.getLong(0)).sorted
    assert(a === b)
  }

  test("BERNOULLI over a session parquet view uses the declared-key " +
      "hash filter ONLY under the explicit opt-in; refusal matrix " +
      "leaves vanilla Sample") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tsmp_pq").toFile
    spark.range(0, 400).selectExpr("id AS doc_id",
      "concat('l', CAST(id % 3 AS STRING)) AS lang")
      .write.mode("overwrite").parquet(s"${dir.getPath}/docs")
    spark.read.parquet(s"${dir.getPath}/docs")
      .createOrReplaceTempView("tsmp_pq_docs")
    def sampled() = spark.sql(
      "SELECT doc_id FROM tsmp_pq_docs TABLESAMPLE BERNOULLI(30)")
    // refusal 0: the declared-key list is an EXPLICIT opt-in (the
    // user declares the column row-unique) — with the empty default,
    // a doc_id-named column must NOT switch sampling semantics
    assert(sampled().queryExecution.optimizedPlan.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sample => s
    }.isDefined, "undeclared key must leave the vanilla Sample")
    spark.conf.set("spark.graft.tablesample.keyColumns", "doc_id")
    try {
      val df = sampled()
      // deterministic: Sample rewritten to the hash Filter
      assert(df.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sample => s
      }.isEmpty, "parquet BERNOULLI kept a vanilla Sample")
      val got = df.collect().map(_.getLong(0)).sorted
      val manual = spark.sql(
        """SELECT doc_id FROM tsmp_pq_docs
           WHERE graft_hex60(concat('tsmp_', CAST(doc_id AS STRING)))
             % 1000000 < 300000""").collect().map(_.getLong(0)).sorted
      assert(got === manual && got.nonEmpty && got.length < 400)
      // refusal 1: SYSTEM over non-lake → vanilla Sample survives
      val sys = spark.sql(
        "SELECT doc_id FROM tsmp_pq_docs TABLESAMPLE SYSTEM(50)")
      assert(sys.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sample => s
      }.isDefined, "SYSTEM over parquet must stay vanilla")
      // refusal 2: no declared integral key on the leaf → vanilla
      spark.range(0, 100).toDF("some_col")
        .createOrReplaceTempView("tsmp_pq_nokey")
      val nk = spark.sql(
        "SELECT some_col FROM tsmp_pq_nokey TABLESAMPLE BERNOULLI(50)")
      assert(nk.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sample => s
      }.isDefined, "keyless BERNOULLI must stay vanilla")
    } finally
      spark.conf.unset("spark.graft.tablesample.keyColumns")
  }
}
