package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamsSpec extends SparkSpec {

  test("stream dedup keys equals batch distinct keys") {
    val streamed = Streams.streamDedupKeys(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val batch = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(streamed === batch)
  }

  test("tumbling window counts sum to the event count") {
    val out = Streams.streamTumblingCounts(spark, sf)
    val total = out.agg(sum("n")).head.getLong(0)
    val events = graft.sources.Tables.events(spark, sf).count()
    assert(total === events)
  }

  test("sliding 2-day/1-day windows count every event exactly twice") {
    val out = Streams.streamSlidingCounts(spark, sf)
    val total = out.agg(sum("n")).head.getLong(0)
    val events = graft.sources.Tables.events(spark, sf).count()
    assert(total === 2 * events)
  }

  test("sessionization: session bounds ordered, events partitioned exactly") {
    val out = Streams.sessionizeEvents(spark, sf)
    assert(out.filter(col("session_end") < col("session_start")).count() === 0)
    val total = out.agg(sum("n_events")).head.getLong(0)
    assert(total === graft.sources.Tables.events(spark, sf).count())
    // no two consecutive sessions of a user overlap within the 30-min gap:
    // next session's start must be > previous end + 30 minutes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess_id")
    val bad = out
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("session_start") - col("prev_end") <= expr("INTERVAL '30' MINUTE"))
      .count()
    assert(bad === 0)
  }
}
