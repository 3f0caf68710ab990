package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the round-2 semantics fixes:
  *  - graft_dot NULLs out on length mismatch / null elements (identical to
  *    the `aggregate(zip_with(...))` HOF formulation it replaces);
  *  - RewriteRankOneToMaxBy leaves DESC NULLS FIRST windows untouched
  *    (max_by's struct comparison is NULLS LAST — rewriting would pick a
  *    different row when sort keys contain nulls). */
class AdviceFixesSpec extends SparkSpec {

  private def mkVecs(rows: Seq[Row]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def dotAndHof(rows: Seq[Row]): Seq[(Any, Any)] =
    mkVecs(rows).selectExpr(
      "graft_dot(a, b) AS native",
      """aggregate(zip_with(a, b, (x, y) -> x * y),
         CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS hof""")
      .collect().toSeq.map(r => (r.get(0), r.get(1)))

  test("graft_dot matches aggregate(zip_with) on clean vectors") {
    val out = dotAndHof(Seq(Row(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))))
    assert(out === Seq((32.0, 32.0)))
  }

  test("graft_dot is NULL on length mismatch, same as the HOF fold") {
    val out = dotAndHof(Seq(Row(Array(1.0, 2.0, 3.0), Array(4.0, 5.0))))
    assert(out === Seq((null, null)))
  }

  test("graft_dot is NULL on null elements, same as the HOF fold") {
    val out = dotAndHof(Seq(Row(Array(1.0, null, 3.0), Array(4.0, 5.0, 6.0))))
    assert(out === Seq((null, null)))
  }

  test("graft_dot propagates NULL input arrays") {
    val out = dotAndHof(Seq(Row(null, Array(1.0))))
    assert(out === Seq((null, null)))
  }

  private def rankOne(nullOrder: String) = {
    import spark.implicits._
    Seq(
      ("k1", Some(5L), "null-last-loser"),
      ("k1", None, "the-null"),
      ("k2", Some(1L), "only")).toDF("k", "v", "tag")
      .createOrReplaceTempView("advice_rank_src")
    spark.sql(
      s"""SELECT k, v, tag FROM (
            SELECT *, row_number() OVER
              (PARTITION BY k ORDER BY v DESC $nullOrder) AS rn
            FROM advice_rank_src) WHERE rn = 1""")
  }

  test("rank-1 rewrite fires on DESC (NULLS LAST default) and is correct") {
    val df = rankOne("NULLS LAST")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("max_by"), s"rewrite did not fire:\n$p")
    val got = df.collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(got === Map("k1" -> "null-last-loser", "k2" -> "only"))
  }

  test("rank-1 rewrite leaves DESC NULLS FIRST untouched and row is the null one") {
    val df = rankOne("NULLS FIRST")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("max_by"),
      s"rewrite must not fire on NULLS FIRST:\n$p")
    val got = df.collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(got === Map("k1" -> "the-null", "k2" -> "only"))
  }
}
