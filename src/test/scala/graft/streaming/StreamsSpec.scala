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

  test("complete-mode streams declare no watermark (no-op eviction); " +
      "the runToTable funnel rejects the combination") {
    val ss = Streams.streamSession(spark)
    // negative: a watermark under complete mode must be refused loudly
    val dishonest = Streams.eventStream(ss, sf)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
    val e = intercept[IllegalArgumentException] {
      Streams.runToTable(dishonest, "wm_complete_reject", "complete")
    }
    assert(e.getMessage.contains("complete output mode"))
    // positive: the same aggregation without the watermark runs — and a
    // watermark in APPEND mode (where it does evict) stays legal
    val honest = Streams.eventStream(ss, sf)
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
    assert(Streams.runToTable(honest, "wm_complete_ok", "complete")
      .collect().nonEmpty)
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

  test("stream windowed top-k equals a batch recount of the same days") {
    val out = Streams.streamWindowedTopk(spark, sf).collect()
    assert(out.nonEmpty)
    // per day: at most 3 rows, ranks contiguous from 1, counts
    // non-increasing, and each (day, type, n) matches a batch recount
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("d"),
        col("event_type"))
      .count().collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0),
        r.getString(1)) -> r.getLong(2)).toMap
    out.groupBy(_.getAs[java.time.LocalDateTime](0)).foreach {
      case (_, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        assert(sorted.length <= 3)
        assert(sorted.map(_.getLong(1)).toSeq ===
          (1L to sorted.length.toLong))
        val ns = sorted.map(_.getLong(3))
        assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
        sorted.foreach { r =>
          assert(batch((r.getAs[java.time.LocalDateTime](0),
            r.getString(2))) === r.getLong(3))
        }
    }
  }

  test("stream-static join equals the batch join recount") {
    val streamed = Streams.streamStaticJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.sources.Tables.events(spark, sf)
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sv"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stateful latest is identical under multi-micro-batch replay") {
    // split events into 3 files; maxFilesPerTrigger=1 forces 3 batches
    val dir3 = s"${System.getProperty("java.io.tmpdir")}/graft_events3"
    spark.read.parquet(s"$sf/events.parquet")
      .repartition(3).write.mode("overwrite").parquet(dir3)
    val stream = Streams.rawFileStream(spark, dir3,
      Map("maxFilesPerTrigger" -> "1"))
    val multi = Streams.statefulLatestCore(spark, stream, "stateful_mb")
      .orderBy("user_id")
      .collect().map(_.toString).toSeq
    val single = Streams.streamStatefulLatest(spark, sf)
      .collect().map(_.toString).toSeq
    assert(multi === single)
  }

  test("tumbling counts are identical under multi-micro-batch replay") {
    val dir3 = s"${System.getProperty("java.io.tmpdir")}/graft_events3t"
    spark.read.parquet(s"$sf/events.parquet")
      .repartition(3).write.mode("overwrite").parquet(dir3)
    val stream = Streams.rawFileStream(spark, dir3,
      Map("maxFilesPerTrigger" -> "1"))
    val multi = Streams.tumblingCore(spark, stream, "tumbling_mb")
      .collect().map(_.toString).toSeq
    val single = Streams.streamTumblingCounts(spark, sf)
      .collect().map(_.toString).toSeq
    assert(multi === single)
  }

  test("streaming heavy hitters are identical under multi-micro-batch " +
      "replay (MG buffer survives the state store)") {
    val dir3 = s"${System.getProperty("java.io.tmpdir")}/graft_events3h"
    spark.read.parquet(s"$sf/events.parquet")
      .repartition(3).write.mode("overwrite").parquet(dir3)
    val stream = Streams.rawFileStream(spark, dir3,
      Map("maxFilesPerTrigger" -> "1"))
    val multi = Streams.heavyHittersCore(spark, stream, "hh_mb")
      .collect().map(_.toString).toSeq
    val single = Streams.streamHeavyHitters(spark, sf)
      .collect().map(_.toString).toSeq
    assert(multi === single)
  }

  test("streaming exact distinct (bitmap64 state) is identical under " +
      "multi-micro-batch replay and equals batch COUNT(DISTINCT)") {
    val dir3 = s"${System.getProperty("java.io.tmpdir")}/graft_events3b"
    spark.read.parquet(s"$sf/events.parquet")
      .repartition(3).write.mode("overwrite").parquet(dir3)
    val stream = Streams.rawFileStream(spark, dir3,
      Map("maxFilesPerTrigger" -> "1"))
    val multi = Streams.exactDistinctCore(spark, stream, "bm64_mb")
      .collect().map(_.toString).toSeq
    val single = Streams.streamExactDistinct(spark, sf)
      .collect().map(_.toString).toSeq
    assert(multi === single)
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(expr(
        "user_id * 4294967296L + event_id % 4294967296L")).as("nd_wide"))
      .orderBy("event_type")
      .collect().map(_.toString).toSeq
    assert(single === batch)
  }

  test("under-capacity MG bounds hold through the state store across " +
      "adversarial micro-batch splits") {
    // The streaming twin of FrequentItemsSpec's under-capacity fuzz: the
    // same `true - cnt <= N/(capacity+1)` / no-overestimate / heavy-item-
    // presence contracts must survive the buffer's serialize→state-store→
    // deserialize→merge cycle BETWEEN micro-batches. The three slices are
    // ordered adversarially (tail singletons first, so the summary is
    // full of throwaway counters before the heavy block ever arrives),
    // and mtimes force the file source to replay them in that order.
    import spark.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = System.getProperty("java.io.tmpdir")
    val dir = s"$base/graft_hh_uc"
    val d = new java.io.File(dir)
    if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    d.mkdirs()
    val slices: Seq[Seq[(String, String)]] = Seq(
      (1 to 150).map(i => ("g1", s"tail_$i")) ++
        Seq.fill(30)(("g2", "beta")),
      Seq.fill(300)(("g1", "heavy")) ++
        (151 to 260).map(i => ("g1", s"tail_$i")) ++
        (1 to 80).map(i => ("g2", s"t2_$i")),
      Seq.fill(60)(("g1", "mid")) ++
        (261 to 330).map(i => ("g1", s"tail_$i")) ++
        Seq.fill(40)(("g2", "beta")))
    slices.zipWithIndex.foreach { case (rows, i) =>
      val stage = s"$dir/stage_$i"
      rows.toDF("grp", "t").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val tgt = new java.io.File(d, s"slice_$i.parquet")
      Files.move(part.toPath, tgt.toPath, StandardCopyOption.REPLACE_EXISTING)
      assert(tgt.setLastModified(1700000000000L + i * 60000L))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
    val all = slices.flatten
    val truth = all.groupBy(identity).map { case ((g, t), v) =>
      (g, t) -> v.size.toLong }
    val nPerGrp = all.groupBy(_._1).map { case (g, v) => g -> v.size.toLong }
    val distinctPerGrp = all.distinct.groupBy(_._1)
      .map { case (g, v) => g -> v.size }
    for (cap <- Seq(4, 8)) {
      assert(distinctPerGrp.values.forall(_ > cap)) // genuinely under capacity
      val ss = Streams.streamSession(spark)
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType)))
      val stream = ss.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val agg = stream.groupBy("grp")
        .agg(expr(s"graft_frequent_items(t, $cap)").as("hh"))
      val got = Streams.runToTable(agg, s"hh_uc_$cap", "complete")
        .selectExpr("grp", "explode(hh) AS e")
        .select(col("grp"), col("e.term"), col("e.cnt"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      got.groupBy(_._1._1).foreach { case (g, m) =>
        assert(m.size <= cap, s"cap $cap group $g: ${m.size} counters")
      }
      got.foreach { case ((g, t), cnt) =>
        val tc = truth((g, t))
        assert(cnt <= tc, s"cap $cap: $g/$t overestimated $cnt > $tc")
        assert(tc - cnt <= nPerGrp(g) / (cap + 1),
          s"cap $cap: $g/$t deficit ${tc - cnt} > ${nPerGrp(g) / (cap + 1)}")
      }
      // anything heavier than 2N/(cap+1) must survive the whole replay
      truth.filter { case ((g, _), c) => c > 2L * nPerGrp(g) / (cap + 1) }
        .keys.foreach(k =>
          assert(got.contains(k), s"cap $cap: heavy item $k evicted"))
    }
  }

  test("windowed agg resumes from checkpoint when new files arrive") {
    // run 1 processes half the events; the source is then extended and a
    // SECOND streaming query starts from the SAME checkpoint — the file
    // source must skip the already-processed files and the state store
    // must restore the first run's window counts, or the complete-mode
    // output would only cover the second half.
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths}
    val base = System.getProperty("java.io.tmpdir")
    val srcDir = s"$base/graft_events_inc"
    val ckpt = s"$base/graft_ckpt_resume"
    for (d <- Seq(srcDir, ckpt) if Files.exists(Paths.get(d)))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(srcDir)
    def runOnce(name: String): org.apache.spark.sql.DataFrame = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = Streams.rawFileStream(ss, srcDir)
      val agg = stream
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(name)
        .selectExpr("CAST(window.start AS TIMESTAMP_NTZ) AS day_start",
          "event_type", "n")
    }
    runOnce("ckpt_run1")
    ev.filter(col("event_id") % 2 === 1)
      .write.mode("append").parquet(srcDir)
    val resumed = runOnce("ckpt_run2")
      .orderBy("day_start", "event_type")
      .collect().map(_.toString).toSeq
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(expr("date_trunc('day', ts)").as("day_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .selectExpr("CAST(day_start AS TIMESTAMP_NTZ) AS day_start",
        "event_type", "n")
      .orderBy("day_start", "event_type")
      .collect().map(_.toString).toSeq
    assert(resumed === batch)
  }

  test("transformWithState running agg is identical under multi-batch replay") {
    val dir3 = s"${System.getProperty("java.io.tmpdir")}/graft_events3w"
    spark.read.parquet(s"$sf/events.parquet")
      .repartition(3).write.mode("overwrite").parquet(dir3)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = Streams.rawFileStream(ss, dir3,
      Map("maxFilesPerTrigger" -> "1"))
    val multi = Streams.twsCore(ss, stream, "tws_mb")
      .collect().map(_.toString).toSeq
    val single = Streams.streamTwsRunningAgg(spark, sf)
      .collect().map(_.toString).toSeq
    assert(multi === single)
  }

  test("stream-stream join equals the batch range join") {
    val streamed = Streams.streamStreamJoin(spark, sf)
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.sources.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .selectExpr("event_id AS click_id", "user_id AS cu", "ts AS ct")
    val p = ev.filter(col("event_type") === "purchase")
      .selectExpr("event_id AS purchase_id", "user_id AS pu", "ts AS pt")
    val batch = c.join(p,
        col("cu") === col("pu") &&
        col("pt") >= col("ct") - expr("INTERVAL '5' MINUTE") &&
        col("pt") <= col("ct") + expr("INTERVAL '5' MINUTE"))
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
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

  test("stream_merge_upsert: genuinely incremental (chronological " +
      "micro-batches), final table equals the batch recompute with no " +
      "duplicate keys") {
    val rows = graft.streaming.Streams
      .streamMergeUpsert(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDate(1).toString)
    // the staged replay is replayChunks ts-range chunks +
    // maxFilesPerTrigger=1, so that many merges ran — duplicates would
    // survive if any batch appended instead of upserting. The chunk
    // count is the SOURCE constant (this assertion went stale once
    // already, pinned to a hand-copied dir name + count); ≥ 2 is the
    // semantic floor — the watermark/upsert cadence must genuinely
    // span more than one batch for the replay to test anything.
    val chunks = graft.streaming.Streams.replayChunks
    assert(chunks >= 2)
    val chunkDir = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_stream_chunks${chunks}_" +
        graft.sources.Tables.fingerprint(sf, "events"))
    assert(Option(chunkDir.listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet")) === chunks)
    assert(rows.map(_._1).distinct.length === rows.length)
    val flat = graft.operators.Merge.mergeUpsertFirstSeen(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString)
    assert(rows.toMap === flat.toMap)
  }
}
