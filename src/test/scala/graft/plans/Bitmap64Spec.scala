package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the 64-bit Roaring bitmap family (Roaring64Bitmap, the
  * ART-backed class — NOT Roaring64NavigableMap, which returns stale
  * cardinalities after cross-sign-boundary merges; the reproduction is
  * documented in Bitmap64Sketch.scala): the
  * whole point is keys ABOVE 2³¹ — where the 32-bit family throws by
  * contract — so every case here drives the high-bit bucket space:
  * exactness vs COUNT(DISTINCT), the build→union re-aggregation
  * identity, partition independence, serialize round-trip across
  * bucket boundaries, negative keys, and null handling. */
class Bitmap64Spec extends SparkSpec {

  test("distinct64 equals COUNT(DISTINCT) on keys spanning >2^31") {
    import spark.implicits._
    // 3 high-32-bit buckets × overlapping low words, plus int32 range
    val df = (0L until 3L).flatMap { hi =>
      (0L until 1000L).map(lo => (hi << 32) | lo)
    }.appended(42L).appended(42L).toDF("k")
    val got = df.agg(
      expr("graft_bitmap_distinct64(k)").as("nd"),
      countDistinct(col("k")).as("exact")).head
    assert(got.getLong(0) === got.getLong(1))
    assert(got.getLong(0) === 3000L) // 42 is already in the hi=0 bucket
  }

  test("distinct64 equals COUNT(DISTINCT) per group on real data") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("wide",
        expr("l_partkey + l_suppkey * 4294967296L"))
    val got = li.groupBy("l_returnflag")
      .agg(expr("graft_bitmap_distinct64(wide)").as("nd"),
        countDistinct(col("wide")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  test("build64→union_count64 over partials equals one-level distinct64") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("wide",
        expr("l_partkey + l_suppkey * 4294967296L"))
    val partials = li.groupBy("l_returnflag", "l_linestatus")
      .agg(expr("graft_bitmap_build64(wide)").as("bm"))
    val merged = partials.groupBy("l_returnflag")
      .agg(expr("graft_bitmap_union_count64(bm)").as("nd"))
    val oneLevel = li.groupBy("l_returnflag")
      .agg(expr("graft_bitmap_distinct64(wide)").as("nd"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = oneLevel.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === o)
  }

  test("result is partition-count independent (forces serialize/merge)") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i % 7L) << 33 | (i % 1000L))
      .toDF("k")
    def run(parts: Int): Long =
      df.repartition(parts)
        .agg(expr("graft_bitmap_distinct64(k)").as("nd"))
        .head.getLong(0)
    assert(run(1) === run(13))
  }

  test("negative keys (full signed 64-bit domain) count correctly") {
    import spark.implicits._
    val df = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue, -1L).toDF("k")
    assert(df.agg(expr("graft_bitmap_distinct64(k)")).head.getLong(0) === 5L)
  }

  test("nulls are ignored, matching COUNT(DISTINCT col)") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L << 40, 2L, null, 2L, null).toDF("k")
    assert(df.agg(expr("graft_bitmap_distinct64(k)")).head.getLong(0) === 2L)
    assert(df.filter(col("k").isNull)
      .agg(expr("graft_bitmap_distinct64(k)")).head.getLong(0) === 0L)
  }

  test("and_count equals the exact intersection, incl. keys above " +
      "2^31 and across sign boundaries") {
    import spark.implicits._
    val sa = ((0L until 800L).map(i => (i % 5) << 33 | i) :+ -42L).toSet
    val sb = ((400L until 1200L).map(i => (i % 5) << 33 | i) :+ -42L).toSet
    val df = sa.toSeq.map(("a", _)).concat(sb.toSeq.map(("b", _)))
      .toDF("side", "k")
    val bms = df.groupBy("side")
      .agg(expr("graft_bitmap_build64(k)").as("bm"))
    val a = bms.filter(col("side") === "a").selectExpr("bm AS bm1")
    val got = a.crossJoin(bms.filter(col("side") === "b")
        .selectExpr("bm AS bm2"))
      .selectExpr("graft_bitmap64_and_count(bm1, bm2) AS n")
      .head.getLong(0)
    assert(got === sa.intersect(sb).size.toLong)
  }

  test("and_count generated code compiles and evaluates (CODEGEN_ONLY " +
      "— a silent interpreted fallback would hide a broken doGenCode)") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val bms = Seq(("a", 1L), ("a", 1L << 40), ("b", 1L << 40))
        .toDF("g", "k").groupBy("g")
        .agg(expr("graft_bitmap_build64(k)").as("bm"))
      val a = bms.filter(col("g") === "a").selectExpr("bm AS bm1")
      val b = bms.filter(col("g") === "b").selectExpr("bm AS bm2")
      val n = a.crossJoin(b)
        .selectExpr("graft_bitmap64_and_count(bm1, bm2) AS n")
        .head.getLong(0)
      assert(n === 1L) // only 1<<40 is shared
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("andnot_count equals the exact set difference and tiles with " +
      "and_count: |A| = |A∩B| + |A\\B|") {
    import spark.implicits._
    val sa = ((0L until 500L).map(i => (i % 3) << 34 | i) :+ -7L).toSet
    val sb = ((250L until 900L).map(i => (i % 3) << 34 | i)).toSet
    val df = sa.toSeq.map(("a", _)).concat(sb.toSeq.map(("b", _)))
      .toDF("side", "k")
    val bms = df.groupBy("side")
      .agg(expr("graft_bitmap_build64(k)").as("bm"))
    val r = bms.filter(col("side") === "a").selectExpr("bm AS bm1")
      .crossJoin(bms.filter(col("side") === "b").selectExpr("bm AS bm2"))
      .selectExpr("graft_bitmap64_and_count(bm1, bm2) AS nand",
        "graft_bitmap64_andnot_count(bm1, bm2) AS nanot",
        "graft_bitmap64_andnot_count(bm2, bm1) AS nbnot")
      .head
    assert(r.getLong(0) === sa.intersect(sb).size.toLong)
    assert(r.getLong(1) === sa.diff(sb).size.toLong)
    assert(r.getLong(2) === sb.diff(sa).size.toLong)
    assert(r.getLong(0) + r.getLong(1) === sa.size.toLong)
    assert(r.getLong(0) + r.getLong(2) === sb.size.toLong)
  }

  test("and_count is NULL-propagating and analysis-checked") {
    import spark.implicits._
    val bm = Seq(1L).toDF("k")
      .agg(expr("graft_bitmap_build64(k)").as("bm")).head.getAs[Array[Byte]](0)
    val df = Seq((bm, Option.empty[Array[Byte]])).toDF("a", "b")
    assert(df.selectExpr("graft_bitmap64_and_count(a, b)").head.isNullAt(0))
    val e = intercept[Exception] {
      Seq(1L).toDF("k").selectExpr("graft_bitmap64_and_count(k, k)")
        .queryExecution.analyzed
    }
    assert(e.getMessage.contains("BINARY") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("non-integral input fails at analysis, not at executor runtime") {
    import spark.implicits._
    val df = Seq("a").toDF("s")
    val e = intercept[Exception] {
      df.agg(expr("graft_bitmap_distinct64(s)")).queryExecution.analyzed
    }
    assert(e.getMessage.toLowerCase.contains("integral") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
