package graft

import org.apache.spark.sql.functions._

/** Golden replica of the reference's Q1–Q5 semantics (SURVEY.md §2.0, §5)
  * on fixtures shaped like its three stores: weather (every calendar day,
  * Mongo-style timestamp key) and stock (trading days only, date key,
  * duplicated messages like the re-sending Kafka producers). */
class ReferenceReplicaSpec extends SparkSpec {
  import spark.implicits._

  // 10 consecutive days of weather; stock trades only on 7 of them and
  // every stock row is sent twice (producer re-send, SURVEY §1.1)
  private lazy val weather = (1 to 10)
    .map(d => (f"2022-08-$d%02d 00:00:00", 4.0 + d, 0.1 * d))
    .toDF("w_ts", "awnd", "prcp")
    .withColumn("_id", col("w_ts").cast("timestamp_ntz")).drop("w_ts")

  private lazy val stock = Seq(1, 2, 3, 4, 5, 8, 9)
    .flatMap(d => Seq.fill(2)((f"2022-08-$d%02d", 100.0 + d)))
    .toDF("date_s", "close")
    .withColumn("Date", col("date_s").cast("timestamp_ntz")).drop("date_s")

  test("Q1: inner join on date key with upper-bound filter") {
    // Q1: weatherny w JOIN applehistory a ON w._id = a.Date
    //     WHERE a.Date < bound ORDER BY date (localTrinoTest.ipynb:119-121)
    val out = weather.join(stock.dropDuplicates("Date"),
        weather("_id") === stock("Date"))
      .filter(col("Date") < lit("2022-08-09 00:00:00").cast("timestamp_ntz"))
      .orderBy("Date")
    assert(out.count() === 6) // days 1-5 and 8; day 9 filtered, 6/7/10 no trade
    val dates = out.select("Date").collect()
      .map(_.getAs[java.time.LocalDateTime](0))
    assert(dates.sameElements(dates.sorted))
  }

  test("Q2: left outer join preserves weather-only days with null stock") {
    val out = weather.join(stock, weather("_id") === stock("Date"),
        "left_outer")
      .select(col("_id"), col("close"))
      .distinct() // the Q2 DISTINCT collapsing re-sent messages
    assert(out.count() === 10) // one row per weather day after dedup
    assert(out.filter(col("close").isNull).count() === 3) // days 6,7,10
  }

  test("Q4: post-filter on nullable side makes the outer join inner") {
    val out = weather.join(stock, weather("_id") === stock("Date"),
        "left_outer")
      .filter(col("Date") > lit("2022-08-02 00:00:00").cast("timestamp_ntz"))
      .select("_id", "close").distinct()
    assert(out.filter(col("close").isNull).count() === 0)
    assert(out.count() === 5) // trading days 3,4,5,8,9
  }

  test("Q3/Q5: DISTINCT over the re-sent stream yields one row per day") {
    assert(stock.distinct().count() === 7)
    assert(stock.count() === 14)
  }
}
