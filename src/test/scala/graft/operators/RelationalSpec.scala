package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("left outer join preserves customers without matching orders") {
    val out = Relational.joinLeftOuter(spark, sf)
    val nulls = out.filter(col("o_orderkey").isNull).count()
    assert(nulls > 0, "expected null-extended rows (Q2 semantics)")
    val total = out.count()
    val customers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total >= customers)
  }

  test("post-outer-join filter on nullable side drops null rows (Q4)") {
    val out = Relational.joinLeftOuterPostfilter(spark, sf)
    assert(out.filter(col("o_orderkey").isNull).count() === 0)
  }

  test("semi + anti partition the customer set") {
    val semi = Relational.joinSemi(spark, sf).count()
    val anti = Relational.joinAnti(spark, sf).count()
    val all = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(semi + anti === all)
  }

  test("as-of join picks the latest purchase at or before each click") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 100L, "purchase", 5.0),
      (2L, "2024-01-01 11:00:00", 100L, "click", 1.0),
      (3L, "2024-01-01 12:00:00", 100L, "purchase", 7.0),
      (4L, "2024-01-01 12:00:00", 100L, "click", 2.0),
      (5L, "2024-01-01 09:00:00", 200L, "click", 3.0)
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    // the same union-window logic joinAsof uses, on a known fixture
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        lit(1).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        lit(0).as("side"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("side").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = clicks.unionByName(purchases)
      .withColumn("p_v", when(col("side") === 0, col("value")))
      .withColumn("purchase_value", last("p_v", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select("event_id", "purchase_value")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(2L) === Some(5.0))  // click@11 sees purchase@10
    assert(out(4L) === Some(7.0))  // click@12 ties with purchase@12 → inclusive
    assert(out(5L) === None)       // no earlier purchase → null
  }

  test("nearest as-of join equals a brute-force per-click recomputation") {
    val out = Relational.joinAsofNearest(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getString(3),
        r.getDouble(4)))
    val purchasesByUser = ev.filter(_._4 == "purchase").groupBy(_._2)
    val clicks = ev.filter(_._4 == "click")
    assert(out.size === clicks.length)
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000L
    clicks.foreach { case (id, user, cts, _, _) =>
      val r = out(id)
      purchasesByUser.get(user) match {
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
        case Some(ps) =>
          val best = ps.minBy { p =>
            val d = us(p._3) - us(cts)
            // tie prefers past; at identical ts the engine picks max
            // event_id for past and min for future (same key as the
            // oracle's signed-event_id lateral ORDER BY)
            (math.abs(d), d > 0, if (d <= 0) -p._1 else p._1)
          }
          val expDir = if (us(best._3) <= us(cts)) "past" else "future"
          assert(r.getString(3) === expDir, s"click $id")
          assert(r.getAs[java.time.LocalDateTime](4) === best._3)
          assert(r.getDouble(5) === best._5)
      }
    }
  }

  test("q7 volume shipping: only the named nation pair, both directions," +
      " revenue matches an independent SQL recomputation") {
    val out = Relational.q7VolumeShipping(spark, sf).collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_20", "NATION_11"),
      ("NATION_11", "NATION_20"))))
    // independent recomputation through the SQL surface on temp views
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => spark.read.parquet(s"$sf/$n.parquet")
        .createOrReplaceTempView(s"q7_$n"))
    val sql = spark.sql(
      """SELECT n1.n_name supp_nation, n2.n_name cust_nation,
           year(l_shipdate) l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
             AS DOUBLE) revenue, count(*) n_lines
         FROM q7_lineitem JOIN q7_orders ON l_orderkey = o_orderkey
           JOIN q7_customer ON o_custkey = c_custkey
           JOIN q7_supplier ON l_suppkey = s_suppkey
           JOIN q7_nation n1 ON s_nationkey = n1.n_nationkey
           JOIN q7_nation n2 ON c_nationkey = n2.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
             OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""").collect()
    assert(out.map(_.toSeq).toSeq === sql.map(_.toSeq).toSeq)
  }

  test("q10/q14/q19 macro analogs: sane shapes and non-trivial selections") {
    val q10 = Relational.q10ReturnedItems(spark, sf).collect()
    assert(q10.nonEmpty && q10.length <= 20)
    val revs = q10.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "q10 not revenue-descending")
    val q14 = Relational.q14PromoRevenue(spark, sf).head()
    val pct = q14.getAs[Double]("promo_pct")
    assert(pct > 0.0 && pct < 100.0, s"promo_pct $pct out of range")
    assert(q14.getAs[Double]("promo_revenue") <
      q14.getAs[Double]("total_revenue"))
    val q19 = Relational.q19DiscountedRevenue(spark, sf).head()
    assert(q19.getAs[Long]("n_lines") > 0, "q19 bands selected nothing")
    assert(q19.getAs[Double]("revenue") > 0.0)
  }

  test("tail_k returns the last 10 orders ascending") {
    val rows = Relational.tailK(spark, sf).collect()
    assert(rows.length === 10)
    val dates = rows.map(_.getAs[java.time.LocalDateTime]("o_orderdate"))
    assert(dates.sameElements(dates.sorted))
  }

  test("set ops: intersect ⊆ union_distinct inputs; except disjoint from right") {
    val except = Relational.exceptKeys(spark, sf)
    val fKeys = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    assert(except.join(fKeys, "k").count() === 0)
  }
}
