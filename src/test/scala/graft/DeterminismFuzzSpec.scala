package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized partition-independence fuzz: the engine's determinism
  * contract says every operator yields IDENTICAL results regardless of
  * how the input is partitioned (that is what makes the DuckDB oracle —
  * and any two cluster runs — agree). The fixed query set asserts this
  * per operator; this spec asserts it for a seeded family of random
  * filter + group-by + aggregate shapes over lineitem/events, executed
  * at 1 vs 13 partitions, collected and compared row-for-row.
  *
  * Aggregates drawn only from the engine's order-independent kit:
  * count, min, max, decimal-summed doubles (Tables.dsum), and the two
  * custom sketches (KMV, hist-quantile) — the same kit every registered
  * query builds on.
  */
class DeterminismFuzzSpec extends SparkSpec {

  private def results(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def lineitemShape(seed: Int): DataFrame => DataFrame = { base =>
    val rnd = new scala.util.Random(seed)
    val qty = 1 + rnd.nextInt(48)
    val disc = rnd.nextInt(10) / 100.0
    val key = Seq("l_returnflag", "l_linestatus",
      "l_suppkey", "l_returnflag")(rnd.nextInt(4))
    base
      .filter(col("l_quantity") >= qty || col("l_discount") >= disc)
      .groupBy(key)
      .agg(
        count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"),
        graft.sources.Tables.dsum(col("l_extendedprice")).as("sum_price"),
        expr("graft_kmv_distinct(CAST(l_partkey AS STRING))").as("nd"),
        expr("graft_hist_quantile(CAST(l_quantity AS DOUBLE)," +
          " 0.0D, 64.0D, 64, 0.5D)").as("p50"),
        expr("graft_cm_count(l_returnflag, 'R')").as("cm"))
  }

  test("random filter+agg shapes are identical at 1 vs 13 partitions") {
    val li = graft.sources.Tables.t(spark, sf, "lineitem")
    for (seed <- 1 to 8) {
      val shape = lineitemShape(seed)
      val one = results(shape(li.coalesce(1)))
      val many = results(shape(li.repartition(13)))
      assert(one === many, s"seed $seed diverged across partitionings")
      assert(one.nonEmpty, s"seed $seed selected nothing — weak test")
    }
  }

  test("random window sequences are identical at 1 vs 13 partitions") {
    val ev = graft.sources.Tables.events(spark, sf)
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(4)
      def shape(d: DataFrame): DataFrame = d
        .selectExpr("event_id", "user_id", "value")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id")
            .orderBy(col("value").desc, col("event_id").asc)))
        .filter(col("rn") <= k)
      val one = results(shape(ev.coalesce(1)))
      val many = results(shape(ev.repartition(13)))
      assert(one === many, s"seed $seed diverged across partitionings")
    }
  }
}
