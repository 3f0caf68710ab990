package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct: relative error vs exact stays within " +
      "3x rsd at every scale factor") {
    // the one oracle-less query (HLL sketch values are engine-specific):
    // carry evidence instead — at rsd=0.02 the HLL++ estimate must sit
    // within 3 standard errors (6%) of the exact distinct count, checked
    // on all three harness scales so the bound isn't a one-corpus fluke
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val approx = Aggregates.approxCountDistinct(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = graft.sources.Tables.t(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet === exact.keySet, dir)
      exact.foreach { case (k, ex) =>
        val rel = math.abs(approx(k) - ex).toDouble / ex
        assert(rel <= 0.06,
          s"$dir flag=$k: approx=${approx(k)} exact=$ex rel error " +
            f"$rel%.4f exceeds 3x rsd (0.06)")
      }
    }
  }

  test("dedup_latest_by_key keeps exactly one row per user — the newest") {
    val out = Aggregates.dedupLatestByKey(spark, sf)
    val users = out.select("user_id").distinct().count()
    assert(out.count() === users)
    // newest: no event for the same user with a strictly later ts
    val ev = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").agg(max("ts").as("max_ts"))
    val joined = out.join(ev, "user_id")
      .filter(col("ts") < col("max_ts")).count()
    assert(joined === 0)
  }

  test("agg_mode: the reported mode really has the max count per group") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val counts = orders.groupBy("o_orderstatus", "o_orderpriority")
      .count().collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getLong(2)).toMap)
      .toMap
    Aggregates.aggMode(spark, sf).collect().foreach { r =>
      val (status, mode, n) =
        (r.getString(0), r.getString(1), r.getLong(2))
      val grp = counts(status)
      assert(grp(mode) === n)
      assert(n === grp.values.max)
      // deterministic tie-break: lexicographically first among maxima
      val maxima = grp.filter(_._2 == n).keys.toSeq.sorted
      assert(mode === maxima.head)
    }
  }

  test("window_rolling_median matches a direct per-user recomputation") {
    val out = Aggregates.windowRollingMedian(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getDouble(3)))
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.indices.foreach { i =>
        val win = ordered.slice(math.max(0, i - 6), i + 1)
          .map(_._4).sorted
        val n = win.length
        val med = (win((n + 1) / 2 - 1) + win(n / 2)) / 2
        val got = out(ordered(i)._3)
        assert(math.abs(got - BigDecimal(med)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"event ${ordered(i)._3}: $got vs $med")
      }
    }
  }

  test("window_ewma matches a direct truncated-EWMA recomputation") {
    val out = Aggregates.windowEwma(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getDouble(3)))
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.indices.foreach { i =>
        val win = ordered.slice(math.max(0, i - 9), i + 1).map(_._4)
        val n = win.length
        var (num, den) = (0.0, 0.0)
        win.zipWithIndex.foreach { case (x, k) =>
          val wgt = math.pow(0.7, n - (k + 1))
          num += x * wgt; den += wgt
        }
        val got = out(ordered(i)._3)
        assert(math.abs(got - num / den) < 2e-6,
          s"event ${ordered(i)._3}: $got vs ${num / den}")
      }
    }
  }

  test("gapfill_linear_interp: observed days exact, gaps between " +
      "neighbors, edges held") {
    val rows = Timeseries.gapfillLinearInterp(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date](0).toLocalDate, r.getBoolean(1),
        r.getDouble(2)))
    assert(rows.nonEmpty)
    val days = rows.map(_._1)
    assert(days.zip(days.tail).forall { case (a, b) =>
      b.toEpochDay - a.toEpochDay == 1L }, "spine not contiguous daily")
    // every gap value lies within [min,max] of the bracketing observed
    // values; leading/trailing gaps equal the nearest observed value
    val obsIdx = rows.zipWithIndex.filter(_._1._2).map(_._2)
    rows.zipWithIndex.filterNot(_._1._2).foreach { case ((_, _, v), i) =>
      val prev = obsIdx.filter(_ < i).lastOption.map(rows(_)._3)
      val next = obsIdx.find(_ > i).map(rows(_)._3)
      (prev, next) match {
        case (Some(p), Some(n)) =>
          assert(v >= math.min(p, n) - 1e-6 && v <= math.max(p, n) + 1e-6)
        case (None, Some(n)) => assert(math.abs(v - n) < 1e-6)
        case (Some(p), None) => assert(math.abs(v - p) < 1e-6)
        case _ => fail("no observed values at all")
      }
    }
  }

  test("text_bpe_merge_step: pair counts match a direct recount") {
    val top = graft.functions.TextAnalysis.bpeMergeStep(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.length === 10)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val want = top.toMap.keySet
    val counted = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_.split(' ').filter(_.length >= 2).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        if (want(p)) counted(p) = counted.getOrElse(p, 0L) + 1L
      }
    })
    top.foreach { case (p, n) => assert(counted(p) === n, p) }
  }

  test("text_unigram_train: the full hard-EM trainer matches an " +
      "independent single-machine recompute (seed, 2 Viterbi-EM " +
      "rounds, prune/smooth, final µ-logp)") {
    val got = graft.functions.TextAnalysis.unigramTrain(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(' ')).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, v) => w -> v.length.toLong }
    val subs = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, wn) =>
      for (i <- 1 to w.length; l <- 1 to math.min(4, i))
        subs(w.substring(i - l, i)) =
          subs.getOrElse(w.substring(i - l, i), 0L) + wn
    }
    val singles = subs.filter(_._1.length == 1).toMap
    var vocab = singles ++ subs.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(24).toMap
    for (_ <- 1 to 2) {
      val tot = vocab.values.sum
      val lp = vocab.map { case (p, c) =>
        p -> math.round(math.log(c.toDouble / tot) * 1e6) }
      val cnt = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, wn) =>
        val n = w.length
        val best = Array.fill(n + 1)(0L)
        val pl = Array.fill(n + 1)(0)
        for (i <- 1 to n) {
          val cands = (1 to math.min(4, i)).flatMap { l =>
            lp.get(w.substring(i - l, i)).map(v => (best(i - l) + v, l))
          }
          best(i) = cands.map(_._1).max
          pl(i) = cands.filter(_._1 == best(i)).map(_._2).min
        }
        var pos = n
        while (pos > 0) {
          val piece = w.substring(pos - pl(pos), pos)
          cnt(piece) = cnt.getOrElse(piece, 0L) + wn
          pos -= pl(pos)
        }
      }
      vocab = singles.map { case (p, _) =>
        p -> math.max(cnt.getOrElse(p, 0L), 1L) } ++
        cnt.filter(_._1.length > 1)
    }
    val tot = vocab.values.sum
    val expect = vocab.map { case (p, c) =>
      p -> ((c, math.round(math.log(c.toDouble / tot) * 1e6))) }
    assert(got === expect,
      s"unigram vocab mismatch: got=${got.toSeq.sorted.take(8)}… " +
        s"exp=${expect.toSeq.sorted.take(8)}…")
    // the EM actually trained: some multi-char piece survived pruning
    // and carries more uses than any of its characters alone would as
    // a leftover (i.e. it won Viterbi segments)
    assert(got.keys.exists(_.length > 1), "no multi-char piece survived")
  }

  test("text_trigram_counts: totals tile the corpus token counts") {
    val top = graft.functions.TextAnalysis.trigramCounts(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.length === 20)
    // counts are non-increasing with lexicographic tie-break
    top.sliding(2).foreach { case Array((t1, n1), (t2, n2)) =>
      assert(n1 > n2 || (n1 === n2 && t1 < t2))
    }
    // every trigram really occurs that many times (independent recount)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val expect = top.toMap.keySet
    val counted = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { text =>
      val tk = text.split(' ')
      (0 to tk.length - 3).foreach { i =>
        val tg = s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}"
        if (expect(tg)) counted(tg) = counted.getOrElse(tg, 0L) + 1L
      }
    }
    top.foreach { case (tg, n) => assert(counted(tg) === n, tg) }
  }

  test("distinct is idempotent (distinct∘distinct = distinct)") {
    val once = Aggregates.distinctRows(spark, sf)
    assert(once.distinct().count() === once.count())
  }

  test("groupby_agg decimal sums equal a direct exact recomputation") {
    val out = Aggregates.groupbyAgg(spark, sf).collect()
    assert(out.nonEmpty)
    val byKey = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // count_order sums to the filtered row count
    val total = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
      .count()
    assert(byKey.values.map(_.getAs[Long]("count_order")).sum === total)
    // avg_qty = sum_qty / count_order exactly (doubles derived that way)
    byKey.values.foreach { r =>
      assert(r.getAs[Double]("avg_qty") ===
        r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order"))
    }
  }

  test("rolling window never exceeds 10 rows and matches a scalar check") {
    val out = Aggregates.windowRollingSum(spark, sf)
    assert(out.agg(max("rolling_n")).head.getLong(0) <= 10)
    assert(out.filter(col("rolling_n") < 1).count() === 0)
  }

  test("seq_window_arrays emits only complete length-10 windows") {
    val out = Aggregates.seqWindowArrays(spark, sf)
    // seq is serialized as a ','-joined string (see seqWindowArrays doc)
    assert(out.filter(size(split(col("seq"), ",")) =!= 10).count() === 0)
    // per user: n rows with complete windows = max(events_of_user - 9, 0)
    val perUser = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").count()
      .withColumn("expect", greatest(col("count") - 9, lit(0L)))
    val got = out.groupBy("user_id").count()
      .withColumnRenamed("count", "got")
    val bad = perUser.join(got, Seq("user_id"), "left_outer")
      .filter(coalesce(col("got"), lit(0L)) =!= col("expect")).count()
    assert(bad === 0)
  }

  test("scale_minmax lands in [0,1]") {
    val out = Aggregates.scaleMinmax(spark, sf)
    val oob = out.filter(col("value_scaled") < 0 || col("value_scaled") > 1)
    assert(oob.count() === 0)
  }

  test("rollup row count = groups + per-flag subtotals + grand total") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val groups = li.select("l_returnflag", "l_linestatus").distinct().count()
    val flags = li.select("l_returnflag").distinct().count()
    assert(Aggregates.rollupAgg(spark, sf).count() === groups + flags + 1)
  }

  test("kmv sketch: exact below k, close above k, partition-independent") {
    val out = Aggregates.kmvDistinct(spark, sf).collect()
    out.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct")
      if (exact < 1024) assert(est === exact.toDouble)
      else assert(math.abs(est - exact) / exact < 0.15,
        s"KMV estimate $est too far from $exact")
    }
    // partition-order independence: same result from a different layout
    val again = Aggregates.kmvDistinct(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("anomaly_mad: flags match an independent cents-median recount " +
      "and the long tail is actually flagged") {
    val out = Aggregates.anomalyMad(spark, sf).collect()
    assert(out.nonEmpty)
    // independent recount in exact integer cents
    val cents = graft.sources.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .as[(String, Long)].collect()
    def medianD(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2).toDouble
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val med = cents.groupBy(_._1).view.mapValues(v => medianD(v.map(_._2)))
      .toMap
    val mad = cents.groupBy(_._1).view.mapValues { v =>
      val m = med(v.head._1)
      val devs = v.map(x => math.abs(x._2 - m))
      val s = devs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }.toMap
    var flagged = 0
    out.foreach { r =>
      val (v, et, flag) = (r.getDouble(2), r.getString(1), r.getBoolean(5))
      val expect = mad(et) > 0 &&
        math.abs(math.round(v * 100) - med(et)) > 4.4478 * mad(et)
      assert(flag === expect, s"row ${r.getLong(0)}: flag mismatch")
      if (flag) flagged += 1
    }
    assert(flagged > 0, "long-tailed harness values produced no outliers")
    assert(flagged < out.length / 10, "MAD flagged an implausible share")
  }

  test("funnel counts are monotonically non-increasing") {
    val r = Aggregates.funnelConversion(spark, sf).head()
    val users = r.getAs[Long]("n_users")
    val signup = r.getAs[Long]("n_signup")
    val click = r.getAs[Long]("n_click_after_signup")
    val full = r.getAs[Long]("n_full_funnel")
    assert(users >= signup && signup >= click && click >= full)
    assert(full >= 0)
  }

  test("pipeline_train_prep emits 5-length sequences only") {
    val out = Aggregates.pipelineTrainPrep(spark, sf)
    assert(out.filter(size(split(col("seq"), ",")) =!= 5).count() === 0)
    assert(out.count() > 0)
  }

  test("property: decimal-sum path is partition-order independent") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val xs = List.fill(200)(
        BigDecimal(rnd.nextDouble() * 9999)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val s7 = xs.toDF("v").repartition(7)
        .agg(graft.sources.Tables.dsum(col("v"))).head.getDouble(0)
      val s1 = xs.reverse.toDF("v").coalesce(1)
        .agg(graft.sources.Tables.dsum(col("v"))).head.getDouble(0)
      assert(s7 === s1)
    }
  }

  test("property: hist-quantile sketch is partition-order independent " +
      "and lands within one bucket width of the exact quantile") {
    val rnd = new scala.util.Random(7)
    val xs = List.fill(500)(rnd.nextDouble() * 500)
    val expr50 = "graft_hist_quantile(v, 0.0D, 512.0D, 256, 0.5D)"
    val s7 = xs.toDF("v").repartition(7)
      .selectExpr(expr50).head.getDouble(0)
    val s1 = xs.reverse.toDF("v").coalesce(1)
      .selectExpr(expr50).head.getDouble(0)
    assert(s7 === s1, "merge order changed the sketch result")
    val exact = xs.sorted.apply(250)
    assert(math.abs(s7 - exact) <= 2.0,
      s"sketch median $s7 vs exact $exact off by more than bucket width")
  }

  test("hist-quantile sketch: empty input is NULL, q=0/q=1 hit the edges") {
    val empty = Seq.empty[Double].toDF("v")
      .selectExpr("graft_hist_quantile(v, 0.0D, 512.0D, 256, 0.5D)").head
    assert(empty.isNullAt(0))
    val one = Seq(100.0).toDF("v")
    assert(one.selectExpr("graft_hist_quantile(v, 0.0D, 512.0D, 256, 0.0D)")
      .head.getDouble(0) === 100.0)
    assert(one.selectExpr("graft_hist_quantile(v, 0.0D, 512.0D, 256, 1.0D)")
      .head.getDouble(0) === 102.0) // upper edge of the containing bucket
  }

  test("audience-overlap candidate pruning: many-segment fixture, " +
      "pair space bounded, nothing above support lost") {
    import spark.implicits._
    // 30 nested segments: s01 ⊂ s02 ⊂ … ⊂ s30, |s_k| = 10k + 1
    val membership = (1 to 30).flatMap(k =>
      (0 to 10 * k).map(u => (f"s$k%02d", u.toLong)))
      .toDF("seg", "user_id")
    val segments = membership.groupBy("seg")
      .agg(expr("graft_bitmap_build64(user_id)").as("bm"),
        expr("graft_bitmap_distinct64(user_id)").as("nd"))
    val th = Seq(101L).toDF("t")
    // pruning keeps only the 21 segments with nd >= 101 (k >= 10):
    // candidate pairs C(21,2) = 210 instead of C(30,2) = 435
    assert(segments.filter(col("nd") >= 101L).count() === 21)
    val pruned = Aggregates.overlapPruned(segments, th)
      .select("et1", "et2", "n_common").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val brute = membership.as("a")
      .join(membership.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.seg") < col("b.seg"))
      .groupBy(col("a.seg").as("et1"), col("b.seg").as("et2"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 101L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pruned === brute)
    assert(pruned.size === 210) // all surviving pairs reach support here
  }

  test("sharded bitmap retention/churn equal the broadcast variants " +
      "row-for-row on >=8 shards, with no bitmap broadcast in the plan") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val retB = Aggregates.retentionCohorts(spark, sf)
    val retS = Aggregates.retentionCohortsSharded(spark, sf)
    assert(rows(retS) === rows(retB))
    val chB = Aggregates.churnDaily(spark, sf)
    val chS = Aggregates.churnDailySharded(spark, sf)
    assert(rows(chS) === rows(chB))
    // the broadcast twins ship whole-day bitmaps through a
    // BroadcastExchange; the sharded plans must not (their only
    // broadcast is the per-day scalar totals frame, bitmap-free)
    for (df <- Seq(retS, chS)) {
      val plan = df.queryExecution.executedPlan
      val bcasts = plan.collect {
        case b: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec => b
      }
      assert(bcasts.forall(_.output.forall(a =>
        a.dataType != org.apache.spark.sql.types.BinaryType)),
        s"serialized bitmap column crosses a broadcast:\n$plan")
    }
  }
}
