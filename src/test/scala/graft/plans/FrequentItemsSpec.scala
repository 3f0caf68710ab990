package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Misra-Gries frequent-items summary to its contracts:
  * exactness when capacity covers the distinct count (the oracle
  * regime), the two MG bounds in the under-capacity regime (counts
  * never overestimate; deficit <= N/(capacity+1)), guaranteed presence
  * of sufficiently-heavy items, partition independence, and null/empty
  * handling. */
class FrequentItemsSpec extends SparkSpec {

  private def summarize(df: org.apache.spark.sql.DataFrame, cap: Int,
      parts: Int): Map[String, Long] =
    df.repartition(parts)
      .agg(expr(s"graft_frequent_items(t, $cap)").as("hh"))
      .selectExpr("explode(hh) AS e").select("e.term", "e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: capacity >= distinct reproduces exact counts") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag").as("t"))
    val exact = li.groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summarize(li, 8, 5) === exact)
  }

  test("under capacity: counts never overestimate and the deficit is " +
      "bounded by N/(capacity+1) on an adversarial mix") {
    import spark.implicits._
    // 1 dominant term, a mid term, and a long tail of singletons that
    // forces constant eviction pressure
    val items = Seq.fill(400)("heavy") ++ Seq.fill(120)("mid") ++
      (1 to 300).map(i => s"tail_$i")
    val df = items.toDF("t")
    val n = items.size
    val cap = 8
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = summarize(df, cap, 6)
    assert(got.nonEmpty && got.size <= cap)
    got.foreach { case (term, cnt) =>
      val tc = truth(term)
      assert(cnt <= tc, s"$term overestimated: $cnt > $tc")
      assert(tc - cnt <= n / (cap + 1),
        s"$term deficit ${tc - cnt} > ${n / (cap + 1)}")
    }
    // anything heavier than 2N/(cap+1) must survive
    truth.filter(_._2 > 2L * n / (cap + 1)).keys.foreach(k =>
      assert(got.contains(k), s"heavy item $k evicted"))
  }

  test("exact regime is partition-count independent") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("string").as("t"))
    assert(summarize(li, 64, 1) === summarize(li, 64, 11))
  }

  test("nulls are skipped; an empty group yields an empty array") {
    import spark.implicits._
    val df = Seq[String]("a", null, "a", null, "b").toDF("t")
    assert(summarize(df, 4, 2) === Map("a" -> 2L, "b" -> 1L))
    val empty = Seq.empty[String].toDF("t")
      .agg(expr("graft_frequent_items(t, 4)").as("hh")).head
    assert(empty.getSeq[Row](0).isEmpty)
  }

  test("seeded random streams: MG bounds hold for every capacity and " +
      "skew shape") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val cap = 2 + rnd.nextInt(14)
      val universe = 1 + rnd.nextInt(40)
      val n = 200 + rnd.nextInt(800)
      // zipfian-ish skew: key = floor(universe * u^a) for random a
      val a = 1.0 + rnd.nextDouble() * 3.0
      val items = Seq.fill(n)(
        s"k${(universe * math.pow(rnd.nextDouble(), a)).toInt}")
      val truth = items.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val got = summarize(items.toDF("t"), cap, 1 + rnd.nextInt(9))
      assert(got.size <= cap, s"seed $seed: ${got.size} > cap $cap")
      got.foreach { case (term, cnt) =>
        assert(cnt <= truth(term), s"seed $seed: $term overestimated")
        assert(truth(term) - cnt <= n / (cap + 1),
          s"seed $seed: $term deficit ${truth(term) - cnt} > ${n / (cap + 1)}")
      }
      truth.filter(_._2 > 2L * n / (cap + 1)).keys.foreach(k =>
        assert(got.contains(k), s"seed $seed: heavy item $k evicted"))
      if (cap >= truth.size)
        assert(got === truth, s"seed $seed: exact regime not exact")
    }
  }

  test("capacity must be a positive literal — rejected at ANALYSIS " +
      "time, not by an executor-side throw") {
    import spark.implicits._
    val df = Seq("a").toDF("t")
    def msgs(t: Throwable): String =
      Option(t).map(x => x.getMessage + msgs(x.getCause)).getOrElse("")
    for (bad <- Seq("0", "-3")) {
      // analysis alone (no execution) must already fail: value checks
      // live in checkInputDataTypes, not in a lazy executor require
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(expr(s"graft_frequent_items(t, $bad)"))
          .queryExecution.analyzed
      }
      assert(msgs(e).contains("capacity"), s"capacity $bad: $e")
    }
  }
}
