package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Roaring-bitmap exact-distinct aggregates: exactness against
  * COUNT(DISTINCT), the build→union re-aggregation identity (the
  * mergeable incremental pattern the type exists for), partition
  * independence, null handling, and the loud 32-bit key-range guard. */
class BitmapSpec extends SparkSpec {

  test("bitmap_distinct equals COUNT(DISTINCT) per group") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val got = li.groupBy("l_returnflag")
      .agg(expr("graft_bitmap_distinct(l_partkey)").as("nd"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  test("build→union_count over partials equals the one-level distinct") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val partials = li.groupBy("l_returnflag", "l_linestatus")
      .agg(expr("graft_bitmap_build(l_partkey)").as("bm"))
    val merged = partials.groupBy("l_returnflag")
      .agg(expr("graft_bitmap_union_count(bm)").as("nd"))
    val oneLevel = li.groupBy("l_returnflag")
      .agg(expr("graft_bitmap_distinct(l_partkey)").as("nd"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = oneLevel.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === o)
  }

  test("result is partition-count independent") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def run(parts: Int): Long =
      li.repartition(parts)
        .agg(expr("graft_bitmap_distinct(l_orderkey)").as("nd"))
        .head.getLong(0)
    assert(run(1) === run(7))
  }

  test("nulls are ignored, matching COUNT(DISTINCT col)") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, 2L, null, 2L, null, 3L).toDF("k")
    assert(df.agg(expr("graft_bitmap_distinct(k)")).head.getLong(0) === 3L)
    assert(df.filter(col("k").isNull)
      .agg(expr("graft_bitmap_distinct(k)")).head.getLong(0) === 0L)
  }

  test("keys beyond 32 bits fail loudly instead of aliasing") {
    import spark.implicits._
    val df = Seq(1L << 40).toDF("k")
    val e = intercept[Exception] {
      df.agg(expr("graft_bitmap_distinct(k)")).head
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq ++ Option(t).flatMap(x => Option(x.getCause))
        .toSeq.flatMap(chain)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]))
  }
}
