package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoverageMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("corpus_global_shuffle: ord is the contiguous 0..n-1 key rank") {
    val rows = graft.functions.TextAnalysis.corpusShuffle(spark, sf)
      .collect()
    val n = rows.length
    assert(rows.map(_.getLong(3)).toSeq === (0L until n.toLong))
    // ord order must equal (shuffle_key, doc_id) order — the bucketed
    // rank + offset-table construction reproduces the global sort rank
    val byKey = rows.sortBy(r => (r.getLong(2), r.getLong(0)))
      .map(_.getLong(3)).toSeq
    assert(byKey === (0L until n.toLong))
  }

  test("corpus_pack_sequences: offsets tile the token stream " +
      "contiguously and bins are 2048-token chunks") {
    val rows = graft.functions.TextAnalysis
      .corpusPackSequences(spark, sf).collect()
    assert(rows.nonEmpty)
    // start offsets are the exclusive prefix sum in doc_id order:
    // each doc starts exactly where the previous one ended
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) === a.getLong(2) + a.getLong(1))
      case _ =>
    }
    assert(rows.head.getLong(2) === 0L)
    rows.foreach { r =>
      val (n, start) = (r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === start / 2048)
      assert(r.getLong(4) === (start + n - 1) / 2048)
    }
    // some doc must span a bin boundary (2048 is not a doc multiple)
    assert(rows.exists(r => r.getLong(3) != r.getLong(4)))
  }

  test("maintenance_compact_files: 16 fragments collapse to 2 files, " +
      "content preserved") {
    Coverage.maintenanceCompactFiles(spark, sf).collect() // forces writes
    def parquetFiles(d: String): Int =
      new java.io.File(d).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    // resolve the cache dirs through the operator's own fingerprint
    // naming — probing a hand-derived name is how this spec went stale
    // when the cache was re-keyed from hashCode to a content digest
    val (fragDir, compDir) = Coverage.compactionDirs(sf)
    assert(parquetFiles(fragDir) === 16)
    assert(parquetFiles(compDir) === 2)
    // the rewrite must be a pure re-layout: same rows, same values
    val orig = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", "value", "event_type")
    val comp = spark.read.parquet(compDir)
      .selectExpr("event_id", "user_id", "value", "event_type")
    assert(comp.exceptAll(orig).isEmpty && orig.exceptAll(comp).isEmpty)
  }

  test("window_ntile: quartile sizes within each segment differ by <= 1") {
    val sizes = Coverage.windowNtile(spark, sf)
      .groupBy("c_mktsegment", "quartile").count()
      .groupBy("c_mktsegment")
      .agg(max("count").as("mx"), min("count").as("mn"),
        countDistinct("quartile").as("nq"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      assert(r.getAs[Long]("nq") === 4L)
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1L)
    }
  }

  test("point-in-time join: every fact sees the version current at its " +
      "own timestamp, never a future one") {
    val out = Timeseries.joinPointInTime(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getString(3)))
    var checked = 0
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.foreach { case ((_, id, _, tpe), i) =>
        if (tpe == "purchase") {
          // brute force: the latest non-purchase activity state at or
          // before this fact (null when the purchase precedes any)
          val state = ordered.take(i + 1).filter(_._4 != "purchase")
            .lastOption.map(_._4)
          assert(Option(out(id)) === state, s"event $id")
          checked += 1
        }
      }
    }
    assert(checked > 0 && checked === out.size)
    assert(out.values.exists(_ != null), "no fact saw any version")
  }

  test("scd2 point-in-time: one row per active user, state = last " +
      "change at or before T") {
    val T = java.time.LocalDateTime.parse("2024-01-15T12:00:00")
    val out = Timeseries.scd2PointInTime(spark, sf).collect()
    val byUser = out.groupBy(_.getLong(0))
    assert(byUser.values.forall(_.length == 1), "duplicate user at T")
    // independent recomputation: each user's latest type-change <= T
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getString(3)))
    ev.groupBy(_._1).foreach { case (user, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      // change rows: first event or type differs from predecessor
      val changes = ordered.zip(None +: ordered.map(Some(_)))
        .collect { case (cur, prev)
          if prev.forall(_._4 != cur._4) => cur }
      val active = changes.takeWhile(c => !c._3.isAfter(T)).lastOption
      (active, byUser.get(user).map(_.toSeq)) match {
        case (Some(c), Some(Seq(row))) =>
          assert(row.getString(1) === c._4, s"user $user")
          assert(row.getAs[java.time.LocalDateTime](2) === c._3)
        case (None, got) =>
          assert(got.isEmpty, s"user $user should be absent at T")
        case (some, got) =>
          fail(s"user $user: expected $some, got $got")
      }
    }
  }

  test("zorder key de-interleaves back to its inputs and beats a " +
      "1-D sort for 2-D skipping") {
    val rows = Coverage.maintenanceZorderKey(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bit de-interleave reconstructs both dimensions exactly
    rows.foreach { case (_, a, b, z) =>
      var (ra, rb) = (0L, 0L)
      (0 until 16).foreach { i =>
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra === a && rb === b, s"z=$z")
    }
    // data-skipping property: chunk the layout into 16 "files"; the
    // summed min/max extent of the NON-leading dimension must be
    // tighter under z-order than under a plain sort by a (which leaves
    // b unclustered) — this is exactly why OPTIMIZE ZORDER exists
    def extent(sorted: Seq[(Long, Long)]): Long =
      sorted.grouped(math.max(1, sorted.length / 16)).map { chunk =>
        chunk.map(_._2).max - chunk.map(_._2).min
      }.sum
    val byZ = rows.sortBy(r => (r._4, r._1)).map(r => (r._2, r._3))
    val byA = rows.sortBy(r => (r._2, r._1)).map(r => (r._2, r._3))
    assert(extent(byZ) < extent(byA),
      s"z-order extent ${extent(byZ)} !< a-sort extent ${extent(byA)}")
  }

  test("join_null_safe: NULL keys match each other — no nation is lost") {
    val out = Coverage.joinNullSafe(spark, sf).collect()
    val nations = spark.read.parquet(s"$sf/nation.parquet").count()
    // every nation matches exactly one region: by value, or via the
    // NULL<=>NULL path for the nullified region key
    assert(out.length.toLong === nations)
    val regions = spark.read.parquet(s"$sf/region.parquet")
      .filter(col("r_regionkey") === 2).select("r_name")
      .head().getString(0)
    val viaNull = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_regionkey") === 2).count()
    assert(out.count(_.getString(1) == regions).toLong === viaNull)
    // sanity: a plain equi-join on the same nullified keys loses them
    assert(out.length.toLong > nations - viaNull)
  }

  test("incremental_agg_merge: merged partials equal one-pass aggregation") {
    val merged = Coverage.incrementalAggMerge(spark, sf).collect()
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz")
        .as("day_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("day_start", "event_type").collect()
    assert(merged.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
  }

  test("corpus_sample_weighted prefers long documents") {
    val samp = graft.functions.TextAnalysis.sampleWeighted(spark, sf)
    val sampAvg = samp.agg(avg("n_chars")).head().getDouble(0)
    val corpusAvg = spark.read.parquet(s"$sf/documents.parquet")
      .agg(avg("n_chars")).head().getDouble(0)
    // priority = hash div n_chars biases selection toward heavy docs;
    // on the fixed sf0.001 corpus the sample mean is ~17% above the
    // corpus mean — assert the direction with margin
    assert(sampAvg > corpusAvg,
      s"weighted sample mean $sampAvg should exceed corpus mean $corpusAvg")
    // exactly 5 per source, ranks contiguous
    samp.groupBy("source").agg(count(lit(1)).as("n"), max("rnk").as("mr"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("n") === 5L && r.getAs[Long]("mr") === 5L)
      }
  }

  test("mm_decode_features: byte stats match a direct Scala computation") {
    val feats = Multimodal.mmDecodeFeatures(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.take(20).foreach { case (id, text) =>
      val bs = text.getBytes("UTF-8")
      val r = feats(id)
      assert(r.getAs[Long]("n_bytes") === bs.length.toLong)
      assert(r.getAs[Long]("b0") ===
        bs.count(b => (b & 0xff) / 64 == 0).toLong)
    }
  }

  test("mm_frame_decode reads only every 4th frame of a real GIF " +
      "container and the decoded colors match the palette formula") {
    val out = Multimodal.mmFrameDecode(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) % 4 === 0), "non-sampled frame read")
    // docs with >= 5 frames must yield a second sampled frame
    assert(out.exists(_.getLong(1) === 4L))
    out.foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(5) === (id * 5 + f * 11) % 256)
      assert(r.getLong(6) === (id * 7 + f * 3) % 256)
      assert(r.getLong(7) === (id * 13 + f * 19) % 256)
    }
  }

  test("join_salted equals the plain join") {
    val salted = Coverage.joinSalted(spark, sf)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("join_range_banded equals the direct inequality join") {
    val banded = Coverage.joinRangeBanded(spark, sf)
    val ev = graft.sources.Tables.events(spark, sf)
    val a = ev.selectExpr("event_id AS e1", "user_id AS u1", "ts AS ts1")
    val b = ev.selectExpr("event_id AS e2", "user_id AS u2", "ts AS ts2")
    val direct = a.join(b,
        col("u1") === col("u2") && col("e1") < col("e2") &&
        col("ts2") >= col("ts1") - expr("INTERVAL '5' MINUTE") &&
        col("ts2") <= col("ts1") + expr("INTERVAL '5' MINUTE"))
      .select(col("e1"), col("e2"))
    assert(banded.count() === direct.count())
    assert(banded.select("e1", "e2").except(direct).count() === 0)
  }

  test("dedup_clusters: representative is the component minimum") {
    val reps = Dedup.clusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(reps.nonEmpty)
    reps.foreach { case (doc, rep) =>
      assert(rep <= doc)
      assert(reps.getOrElse(rep, rep) === rep, "rep of rep must be itself")
    }
  }

  test("setops_all preserves multiplicity: |F \\ P| + |F ∩ P| = |F|") {
    val all = Relational.setopsAll(spark, sf)
    val exceptN = all.filter(col("op") === "except_all").count()
    val intersectN = all.filter(col("op") === "intersect_all").count()
    val fN = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F").count()
    assert(exceptN + intersectN === fN)
  }

  test("mm_resize_real halves dimensions through a real decode → " +
      "resample → re-encode chain with analytically exact sums") {
    val rows = Multimodal.mmResizeReal(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === w / 2 && r.getLong(4) === h / 2)
      val band = h / 4
      assert(r.getLong(5) ===
        (w / 2) * band * ((id % 256) + (id * 3 % 256)))
      assert(r.getLong(6) ===
        (w / 2) * band * ((id * 7 % 256) + (id * 11 % 256)))
      assert(r.getLong(7) ===
        (w / 2) * band * ((id * 13 % 256) + (id * 17 % 256)))
    }
  }

  test("csv ingest round-trips the projection exactly") {
    val out = Coverage.csvIngest(spark, sf)
    val src = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_name", "p_brand", "p_size")
    assert(out.count() === src.count())
    assert(out.except(src).count() === 0)
  }

  test("windowed funnel stages shrink monotonically and never exceed " +
    "the unbounded funnel's ordered-stage counts") {
    val rows = Coverage.funnelWindowed(spark, sf).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("1_view", "2_click", "3_purchase"))
    val Array(v, c, p) = rows.map(_.getAs[Long]("n_users"))
    assert(v >= c && c >= p && p >= 0)
    // every view-stage user is a user with >=1 view event
    val nViewUsers = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(v === nViewUsers)
  }

  test("dq constraint report: violation counts match independent " +
      "recounts; passed flags are consistent") {
    val out = Coverage.dqConstraintReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out.map(_._1) === out.map(_._1).sorted)
    assert(out.forall { case (_, n, p) => p === (n == 0L) })
    val m = out.map(t => t._1 -> t._2).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val od = spark.read.parquet(s"$sf/orders.parquet")
    val dup = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(m("pk_unique_orderkey_linenumber") === dup)
    assert(dup > 0L, "harness data should violate the PK constraint")
    val shipBefore = li.join(od,
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).count()
    assert(m("ship_on_or_after_orderdate") === shipBefore)
    assert(shipBefore > 0L)
    assert(m("fk_orderkey_in_orders") === 0L)
    assert(m("range_quantity_1_to_50") === 0L)
    assert(m("not_null_qty_price_shipdate") === 0L)
  }

  test("event transition matrix conserves mass: row shares sum to ~1e6 " +
    "and transition count equals events minus users") {
    val out = Coverage.eventTransitions(spark, sf).collect()
    val n = out.map(_.getAs[Long]("n")).sum
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(n === expected) // lead() drops exactly one event per user
    // integer-floor division loses < |row| micro-units per from_type
    out.groupBy(_.getAs[String]("from_type")).foreach { case (_, rows) =>
      val share = rows.map(_.getAs[Long]("p_micro")).sum
      assert(share <= 1000000L && share > 1000000L - rows.length)
    }
  }

  test("parameterized SQL binds values as literals — an injection " +
      "payload cannot alter the query shape") {
    graft.sources.Tables.t(spark, sf, "orders")
      .createOrReplaceTempView("orders_param_probe")
    val payload = "F' OR '1'='1"
    val n = spark.sql(
      "SELECT CAST(count(*) AS BIGINT) AS n FROM orders_param_probe " +
        "WHERE o_orderstatus = :status",
      Map("status" -> payload)).head.getLong(0)
    assert(n === 0L) // matched as a literal string, not parsed as SQL
    val legit = spark.sql(
      "SELECT CAST(count(*) AS BIGINT) AS n FROM orders_param_probe " +
        "WHERE o_orderstatus = :status",
      Map("status" -> "F")).head.getLong(0)
    assert(legit > 0L)
  }

  test("mm_audio_roundtrip: decoded stats satisfy the square-wave " +
      "invariants, and the WAV parser rejects a corrupted container") {
    val rows = Multimodal.mmAudioRoundtrip(spark, sf).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, amp) = (r.getAs[Long]("n_samples"), r.getAs[Long]("amp"))
      assert(r.getAs[Long]("sum_abs") === n * amp,
        s"doc ${r.getAs[Long]("doc_id")}: lossy round-trip")
      assert(r.getAs[Long]("first_s") === amp) // wave starts high
      assert(math.abs(r.getAs[Long]("last_s")) === amp)
    }
    // honesty probe: a real RIFF parser must refuse a corrupted header
    // (a byte-pass-through fake would happily "decode" it)
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](64)), fmt, 32L),
      AudioFileFormat.Type.WAVE, bos): Unit
    val wav = bos.toByteArray
    wav(8) = 'X' // clobber the WAVE form-type magic
    intercept[UnsupportedAudioFileException] {
      AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
    }
  }

  test("mm_codec_capabilities reports this sandbox truthfully: " +
      "JDK codecs available and bound, ffmpeg-class codecs unbound") {
    val caps = graft.operators.Multimodal
      .mmCodecCapabilities(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(2), r.getString(3)))).toMap
    // uncompressed/JDK paths are REAL here (mm_codec_roundtrip etc.)
    Seq("png", "gif", "bmp", "jpeg").foreach { c =>
      assert(caps(c) === ((true, "jdk:javax.imageio")), s"$c: ${caps(c)}")
    }
    assert(caps("wav") === ((true, "jdk:javax.sound.sampled")))
    // compressed codecs: no ffmpeg-class decoder on the JVM or system
    // path in this sandbox — the surface must say so, not pretend
    Seq("mp3", "aac", "h264", "vp9").foreach { c =>
      assert(caps(c) === ((false, "unbound")), s"$c: ${caps(c)}")
    }
  }

  test("corpus_split_grouped: normalized duplicates never straddle " +
      "splits, and the representative is the group min") {
    val rows = graft.functions.TextAnalysis.corpusSplitGrouped(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    // group_rep is the min doc_id of its group, and every member of a
    // group carries the SAME split — the leakage-safety contract
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._1).min === rep,
        s"group $rep: representative is not the min doc_id")
      assert(members.map(_._4).distinct.length === 1,
        s"group $rep straddles splits: ${members.map(_._4).toSet}")
    }
    // the split is a pure function of the representative: recompute it
    val buckets = rows.map(_._2).distinct.toSeq.sorted
    val bdf = buckets.toDF("rep").selectExpr("rep",
      graft.functions.TextAnalysis
        .hex60("concat('gsplit_', CAST(rep AS STRING))") + " % 100 AS b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (_, rep, bucket, split) =>
      assert(bucket === bdf(rep))
      val want = if (bucket < 80) "train" else if (bucket < 90) "val"
        else "test"
      assert(split === want)
    }
    // and the grouping is real on harness data: compare group count to
    // distinct normalized hashes
    val nGroups = graft.functions.TextAnalysis.dedupNormalized(spark, sf)
      .count()
    assert(rows.map(_._2).distinct.length.toLong === nGroups)
  }

  test("corpus_mix_temperature: tempered shares recompute exactly and " +
      "temperature boosts the low-resource tail") {
    val rows = graft.functions.TextAnalysis
      .corpusMixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byLang = toks.groupBy(_._1).map { case (l, v) =>
      l -> ((v.length.toLong, v.map(_._2).sum)) }
    // tie guard (ADVICE r15): the single libm call per language must
    // not sit on a .5 rounding boundary, where a 1-ulp pow difference
    // between Spark's Math.pow and DuckDB's libm would flip wi by one
    // unit and cascade into temp_ppm — surface a future tie as THIS
    // named failure instead of a gate hash mismatch
    byLang.foreach { case (l, (_, nt)) =>
      val x = math.pow(nt.toDouble, 0.7) * 1e3
      assert(math.abs(x - math.floor(x) - 0.5) > 1e-6,
        s"lang $l: pow weight $x sits on a rounding tie")
    }
    val wi = byLang.map { case (l, (nd, nt)) =>
      l -> ((nd, nt, math.round(math.pow(nt.toDouble, 0.7) * 1e3))) }
    val tw = wi.values.map(_._3).sum
    val tt = wi.values.map(_._2).sum
    val expect = wi.toSeq.sortBy(_._1).map { case (l, (nd, nt, w)) =>
      val raw = nt * 1000000L / tt
      val tmp = w * 1000000L / tw
      (l, nd, nt, raw, tmp, tmp * 1000L / math.max(raw, 1L))
    }
    assert(rows.toSeq === expect,
      s"mixture mismatch:\n got=${rows.toSeq}\n exp=$expect")
    // α < 1 compresses the distribution: the smallest-mass language is
    // upsampled (boost > 1×), the largest damped (boost < 1×)
    val byMass = rows.sortBy(_._3)
    assert(byMass.head._6 > 1000L, s"tail not boosted: ${byMass.head}")
    assert(byMass.last._6 < 1000L, s"head not damped: ${byMass.last}")
    // ppm shares tile to 1e6 within the floor truncation slack
    assert(math.abs(rows.map(_._5).sum - 1000000L) <= rows.length.toLong)
  }

  test("corpus_length_buckets: buckets tile by 32, counts and waste " +
      "recompute from raw token counts") {
    val rows = graft.functions.TextAnalysis.corpusLengthBuckets(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map(_.getLong(0))
    val expect = toks.groupBy(n => ((math.max(n, 1) + 31) / 32) * 32)
      .toSeq.sortBy(_._1)
      .map { case (cap, ns) =>
        val (nd, st) = (ns.length.toLong, ns.sum)
        val padded = cap * nd
        (cap, nd, st, padded, (padded - st) * 1000000L / padded)
      }
    assert(rows.toSeq === expect)
    // every doc's tokens fit its bucket: waste is non-negative and the
    // bucket is the tightest multiple of 32
    rows.foreach { case (cap, _, _, _, waste) =>
      assert(cap % 32 === 0 && waste >= 0L && waste < 1000000L)
    }
  }
}
