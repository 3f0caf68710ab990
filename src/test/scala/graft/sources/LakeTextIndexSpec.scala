package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted inverted-index lifecycle ([[GraftLakeTextIndex]]): build
  * via CALL, term-shard-pruned probes, tombstone deletion semantics
  * (the Lucene live-docs model), and the O(delta) `$changes` advance —
  * an update's stale postings stay on disk but never score, and the
  * source is never re-tokenized past the cursor. */
class LakeTextIndexSpec extends SparkSpec {
  import spark.implicits._

  test("build_text_index persists term-hash-sharded postings + doc " +
      "lengths; refresh advances from $changes with tombstone masking; " +
      "a term probe plans only the term's shard") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_tix_src"
    for (t <- Seq("spec_tix_src", "spec_tix_ix", "spec_tix_ix_docs",
        "spec_tix_ix_tomb", "spec_tix_ix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql(s"""CREATE TABLE $src (doc_id BIGINT, text STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='2')""")
    Seq(
      (0L, "alpha beta alpha"),
      (1L, "beta gamma"),
      (2L, "alpha delta delta delta"),
      (3L, "gamma gamma beta")
    ).toDF("doc_id", "text").createOrReplaceTempView("spec_tix_v1")
    spark.sql(s"INSERT INTO $src SELECT * FROM spec_tix_v1")

    val built = spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_tix_src', index_table => 'spec_tix_ix')""").head
    // distinct (doc, term) pairs: d0{alpha,beta} d1{beta,gamma}
    // d2{alpha,delta} d3{gamma,beta} = 8 postings over 4 docs at v1
    assert(built.getLong(1) === 8L, s"postings: $built")
    assert(built.getLong(2) === 4L, "docs")
    assert(built.getInt(3) === 1, "built at source v1")

    // postings carry exact tf and the graft_hex60 term hash
    val post = spark.table("graft_lake.lake.spec_tix_ix")
    val tf = post.select("term", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tf(("alpha", 0L)) === 2L && tf(("delta", 2L)) === 3L)
    val hOk = post.selectExpr(
      "count_if(term_h != graft_hex60(term)) AS bad").head.getLong(0)
    assert(hOk === 0L, "term_h must be the graft_hex60 of term")
    // positional postings: ascending 0-based token positions, and
    // tf is exactly the position count
    val posMap = post.select("term", "doc_id", "positions").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(posMap(("alpha", 0L)) === "0,2")
    assert(posMap(("delta", 2L)) === "1,2,3")
    assert(post.selectExpr(
      "count_if(tf != size(split(positions, ','))) AS bad")
      .head.getLong(0) === 0L, "tf must equal the position count")

    // a one-term probe is a point-lookup-pruned scan: postings are
    // sharded by term_h (8 shards), so exactly 1 shard plans
    val alphaH = graft.plans.HashUtil.hex60md5(
      org.apache.spark.unsafe.types.UTF8String.fromString("alpha"))
    GraftLakeScanMetrics.reset()
    assert(spark.sql(s"""SELECT count(*) AS n FROM
      graft_lake.lake.spec_tix_ix WHERE term_h = ${alphaH}L""")
      .head.getLong(0) === 2L)
    assert(GraftLakeScanMetrics.planned.get() === 1L,
      "a one-term probe must plan exactly the term's shard")

    // lifecycle: delete d1, update d2 (drops 'delta', gains 'beta'),
    // insert d4 — then advance from $changes
    spark.sql(s"DELETE FROM $src WHERE doc_id = 1")
    spark.sql(s"UPDATE $src SET text = 'beta beta' WHERE doc_id = 2")
    spark.sql(s"INSERT INTO $src VALUES (4L, 'alpha epsilon')")
    val ref = spark.sql("""CALL graft_lake.system.refresh_text_index(
      index_table => 'spec_tix_ix')""").head
    assert(ref.getLong(0) === 1L && ref.getLong(1) === 4L,
      s"cursor must advance 1 -> 4, got $ref")
    assert(ref.getLong(2) === 3L,
      "postings added: d2{beta} + d4{alpha, epsilon}")
    assert(ref.getLong(3) === 2L, "docs tombstoned: d1 (delete) + " +
      "d2 (update preimage)")

    // tombstones mask, they do not erase: the dead postings are still
    // on disk (resolved at the next rebuild), but liveness hides them
    val tomb = GraftLakeTextIndex.tombstones(spark, "spec_tix_ix")
    val livePost = GraftLakeTextIndex.live(
      spark.table("graft_lake.lake.spec_tix_ix"), tomb)
    val liveDocs = GraftLakeTextIndex.live(
      spark.table("graft_lake.lake.spec_tix_ix_docs"), tomb)
    assert(spark.table("graft_lake.lake.spec_tix_ix").count() === 11L,
      "8 build postings + 3 delta postings all persist")
    val liveByDoc = livePost.select("doc_id", "term").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (d, ts) => d -> ts.map(_._2).toSet }
    assert(!liveByDoc.contains(1L), "deleted doc must not be live")
    assert(liveByDoc(2L) === Set("beta"),
      s"updated doc serves ONLY its new postings: ${liveByDoc(2L)}")
    assert(liveByDoc(4L) === Set("alpha", "epsilon"))
    assert(liveByDoc(0L) === Set("alpha", "beta"),
      "untouched docs keep their build-time postings")
    // doc lengths follow the same mask: d2's dl is the new 2, not 4
    val dls = liveDocs.select("doc_id", "dl").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dls === Map(0L -> 3L, 2L -> 2L, 3L -> 3L, 4L -> 2L))

    // a second refresh with no source commits is a no-op
    val ref2 = spark.sql("""CALL graft_lake.system.refresh_text_index(
      index_table => 'spec_tix_ix')""").head
    assert(ref2.getLong(0) === 4L && ref2.getLong(1) === 4L &&
      ref2.getLong(2) === 0L && ref2.getLong(3) === 0L)

    // index health: 7 live + 4 dead postings (d1's 2 + d2's old 2),
    // 4 live docs, 2 tombstoned — dead/live is the rebuild trigger
    val st = spark.sql("""CALL graft_lake.system.text_index_stats(
      index_table => 'spec_tix_ix')""").head
    assert((st.getLong(0), st.getLong(1), st.getLong(2),
      st.getLong(3)) === ((7L, 4L, 4L, 2L)), s"stats: $st")

    // rebuild folds the tombstones away: postings collapse to the
    // live set and the tombstone table is empty
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_tix_src', index_table => 'spec_tix_ix')""")
    assert(spark.table("graft_lake.lake.spec_tix_ix").count() === 7L,
      "rebuild persists exactly the live postings")
    assert(spark.table("graft_lake.lake.spec_tix_ix_tomb").count()
      === 0L)
    val st2 = spark.sql("""CALL graft_lake.system.text_index_stats(
      index_table => 'spec_tix_ix')""").head
    assert((st2.getLong(0), st2.getLong(1), st2.getLong(3))
      === ((7L, 0L, 0L)), "rebuild zeroes the dead/tombstone counts")
  }

  /** The fixture's edited corpus, recomputed from the raw parquet —
    * the same three edits textIndexFixture commits. */
  private def editedDocs: Map[Long, Array[String]] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      .-(11L)
      .updated(12L, "join hash vector stream scan filter slow join")
      .updated(100000L, "join join hash vector slow scan")
      .map { case (d, t) => d -> t.split(" ") }

  test("search_phrase_indexed equals a raw-text adjacency recompute " +
      "over the edited corpus") {
    val out = Lake.searchPhraseIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val phrases = Seq(
      (1L, "vector", "stream"), (2L, "table", "hash"),
      (3L, "slow", "key"))
    val docs = editedDocs
    val expect = phrases.flatMap { case (q, w1, w2) =>
      docs.toSeq.map { case (d, toks) =>
        val n = (0 until toks.length - 1)
          .count(i => toks(i) == w1 && toks(i + 1) == w2).toLong
        (q, d, n)
      }.filter(_._3 > 0).sortBy(_._2)
    }
    assert(out.nonEmpty, "phrase queries must hit at sf0.001")
    assert(out.toSeq === expect,
      s"phrase mismatch:\n got=${out.toSeq}\n exp=$expect")
  }

  test("search_indexed_bm25 equals the raw-corpus recompute after the " +
      "fixture's delete/update/insert lifecycle") {
    val out = Lake.searchIndexedBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // independent single-machine BM25 over the EDITED corpus (the
    // fixture's three source commits), 6dp-rounded DECIMAL partials —
    // the same recompute discipline as the text_bm25_topk spec
    val qterms = Map(
      1L -> Seq("join", "hash"),
      2L -> Seq("vector", "stream"),
      3L -> Seq("scan", "filter", "slow"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      .-(11L)
      .updated(12L, "join hash vector stream scan filter slow join")
      .updated(100000L, "join join hash vector slow scan")
      .map { case (d, t) => d -> t.split(" ").toSeq }
    val n = docs.size.toLong
    val sumDl = docs.values.map(_.size.toLong).sum
    val dfAll = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    val expect = qterms.keys.toSeq.sorted.flatMap { q =>
      docs.toSeq.flatMap { case (d, toks) =>
        val dl = toks.size.toLong
        val parts = qterms(q).flatMap { term =>
          val tfc = toks.count(_ == term).toLong
          if (tfc == 0 || !dfAll.contains(term)) None
          else {
            val idf = math.log(1 + (n.toDouble - dfAll(term) + 0.5) /
              (dfAll(term).toDouble + 0.5))
            val w = (tfc.toDouble * 2.2) / (tfc.toDouble + 1.2 *
              (0.25 + 0.75 * dl.toDouble * n.toDouble / sumDl.toDouble))
            Some(BigDecimal(idf * w)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP))
          }
        }
        if (parts.isEmpty) None
        else Some((d, parts.sum, parts.length.toLong))
      }.sortBy { case (d, sc, _) => (-sc, d) }.take(5)
        .zipWithIndex.map { case ((d, sc, nt), i) =>
          (q, i + 1L, d, nt, sc.toDouble)
        }
    }
    assert(out.toSeq === expect,
      s"indexed BM25 mismatch:\n got=${out.toSeq}\n exp=$expect")
  }

  test("search_indexed_conjunctive keeps only all-terms docs and is " +
      "the BM25 ranking restricted to them") {
    val out = Lake.searchIndexedConjunctive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val need = Map(1L -> 2L, 2L -> 2L, 3L -> 3L)
    out.foreach { case (q, _, _, nt, _) =>
      assert(nt === need(q), s"q=$q: non-conjunctive doc survived")
    }
    // the conjunctive list is the disjunctive list filtered to
    // full-match docs, re-ranked (same scores, tighter candidate set)
    val all = Lake.searchIndexedBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    out.foreach { case (q, _, d, nt, s) =>
      all.get((q, d)).foreach { case (nt2, s2) =>
        assert(nt === nt2 && s === s2,
          s"conjunctive row (q=$q, d=$d) disagrees with the " +
            "disjunctive score")
      }
    }
  }

  test("search_hybrid_indexed is exactly the integer-RRF fusion of the " +
      "two persisted-index rank lists (both independently oracled)") {
    val lex = Lake.searchIndexedBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val dense = Lake.annIndexedTopk(spark, sf).collect()
      .filter(r => Set(1L, 2L, 3L)(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val expect = Seq(1L, 2L, 3L).flatMap { q =>
      val ids = (lex.keySet ++ dense.keySet).filter(_._1 == q).map(_._2)
      ids.toSeq.map { d =>
        val lr = lex.get((q, d))
        val dr = dense.get((q, d))
        val score = lr.map(r => 1000000L / (60L + r)).getOrElse(0L) +
          dr.map(r => 1000000L / (60L + r)).getOrElse(0L)
        (q, d, score, lr.getOrElse(0L), dr.getOrElse(0L))
      }.sortBy { case (_, d, sc, _, _) => (-sc, d) }.take(5)
        .zipWithIndex.map { case ((qq, d, sc, l, dn), i) =>
          (qq, i + 1L, d, sc, l, dn)
        }
    }
    val got = Lake.searchHybridIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expect,
      s"indexed hybrid fusion mismatch:\n got=${got.toSeq}\n exp=$expect")
  }

  test("search_proximity_indexed equals the ordered per-step-window " +
      "chain recomputed from the edited raw corpus (slop 0 = phrase)") {
    val out = Lake.searchProximityIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val queries = Seq(
      (1L, Seq("join", "vector"), 2L),
      (2L, Seq("join", "vector", "scan"), 2L),
      (3L, Seq("hash", "stream"), 0L))
    val docs = editedDocs
    val expect = queries.flatMap { case (q, terms, slop) =>
      docs.toSeq.map { case (d, toks) =>
        val pos = terms.map(w =>
          toks.indices.filter(i => toks(i) == w))
        val fin = pos.tail.foldLeft(pos.head) { (prev, cur) =>
          cur.filter(p => prev.exists(qp =>
            p > qp && p - qp <= slop + 1))
        }
        (q, d, fin.length.toLong)
      }.filter(_._3 > 0).sortBy(_._2)
    }
    assert(out.nonEmpty, "proximity queries must hit")
    assert(out.toSeq === expect,
      s"proximity mismatch:\n got=${out.toSeq}\n exp=$expect")
    // the 3-term chain is genuinely stricter than its 2-term prefix:
    // every q2 hit is a q1 hit, not vice versa
    val q1Docs = out.filter(_._1 == 1L).map(_._2).toSet
    val q2Docs = out.filter(_._1 == 2L).map(_._2).toSet
    assert(q2Docs.subsetOf(q1Docs) && q2Docs.size < q1Docs.size,
      s"expected q2 strictly inside q1: ${q2Docs.size} vs ${q1Docs.size}")
  }

  test("tombstone-growth guard: past the broadcast cap a probe " +
      "degrades to a shuffle-join mask (same rows), and a rebuild " +
      "restores broadcastability") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_tixg_src"
    for (t <- Seq("spec_tixg_src", "spec_tixg_ix", "spec_tixg_ix_docs",
        "spec_tixg_ix_tomb", "spec_tixg_ix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql(s"""CREATE TABLE $src (doc_id BIGINT, text STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='2')""")
    spark.sql(s"""INSERT INTO $src SELECT id,
      concat('alpha w', CAST(id AS STRING)) FROM range(0, 20)""")
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_tixg_src', index_table => 'spec_tixg_ix')""")
    spark.sql(s"DELETE FROM $src WHERE doc_id >= 15")
    spark.sql("""CALL graft_lake.system.refresh_text_index(
      index_table => 'spec_tixg_ix')""")
    assert(spark.table("graft_lake.lake.spec_tixg_ix_tomb").count()
      === 5L)
    val tomb = GraftLakeTextIndex.tombstones(spark, "spec_tixg_ix")
    val post = spark.table("graft_lake.lake.spec_tixg_ix")
    def liveRows(bcast: Boolean): Seq[(Long, String)] =
      GraftLakeTextIndex.live(post, tomb, bcast)
        .select("doc_id", "term").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    // below the default cap: broadcastable, mask joins as broadcast
    assert(GraftLakeTextIndex.maskBroadcastable(spark, "spec_tixg_ix"))
    try {
      spark.conf.set("spark.graft.textIndex.maxBroadcastTombstones", "4")
      // 5 tombstones > cap 4: the guard trips
      assert(!GraftLakeTextIndex
        .maskBroadcastable(spark, "spec_tixg_ix"))
      // the guard drops the FORCED broadcast hint past the cap — the
      // logical join carries no strategy hint, so Spark's own
      // size-based planning decides (here the 5-row mask still
      // broadcasts; a 100-TB-scale mask with real stats would not —
      // the point is the mask can no longer FORCE a driver OOM)
      val hinted = GraftLakeTextIndex.live(post, tomb, true)
        .queryExecution.optimizedPlan.toString
      val unhinted = GraftLakeTextIndex.live(post, tomb, false)
        .queryExecution.optimizedPlan.toString
      assert(hinted.contains("strategy=broadcast"),
        s"below-cap mask must carry the broadcast hint:\n$hinted")
      assert(!unhinted.contains("strategy=broadcast"),
        s"degraded mask must not force a broadcast:\n$unhinted")
      // degraded plan, identical rows — correctness is mode-free
      assert(liveRows(bcast = false) === liveRows(bcast = true))
      assert(liveRows(bcast = false).map(_._1).toSet ===
        (0L until 15L).toSet)
      // rebuild folds tombstones away and the guard clears at the
      // same tight cap
      spark.sql("""CALL graft_lake.system.build_text_index(
        table => 'spec_tixg_src', index_table => 'spec_tixg_ix')""")
      assert(spark.table("graft_lake.lake.spec_tixg_ix_tomb").count()
        === 0L)
      assert(GraftLakeTextIndex
        .maskBroadcastable(spark, "spec_tixg_ix"))
    } finally
      spark.conf.unset("spark.graft.textIndex.maxBroadcastTombstones")
  }

  test("CALL refresh_indexes advances a table's text AND ANN cursors " +
      "to the SAME pinned source version (the index-group contract)") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_ixg_src"
    for (t <- Seq("spec_ixg_src", "spec_ixg_tix", "spec_ixg_tix_docs",
        "spec_ixg_tix_tomb", "spec_ixg_tix_meta", "spec_ixg_aix",
        "spec_ixg_aix_centroids", "spec_ixg_aix_codebooks",
        "spec_ixg_aix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    // one table carrying BOTH retrieval modalities: text + embedding
    spark.sql(s"""CREATE TABLE $src
      (doc_id BIGINT, text STRING, vec_id BIGINT, emb STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='2')""")
    spark.sql(s"""INSERT INTO $src VALUES
      (0L, 'alpha beta', 0L, '1000000,0,0,0'),
      (1L, 'beta gamma', 1L, '0,1000000,0,0'),
      (2L, 'alpha alpha', 2L, '900000,100000,0,0'),
      (3L, 'gamma delta', 3L, '0,900000,100000,0')""")
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_ixg_src', index_table => 'spec_ixg_tix')""")
    spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_ixg_src', index_table => 'spec_ixg_aix',
      k => 2, iters => 1, pq_m => 2, pq_k => 2, pq_iters => 1)""")
    // two edits = two MORE source commits after both builds
    spark.sql(s"DELETE FROM $src WHERE doc_id = 1")
    spark.sql(s"""INSERT INTO $src VALUES
      (4L, 'delta alpha', 4L, '500000,500000,0,0')""")
    val r = spark.sql("""CALL graft_lake.system.refresh_indexes(
      table => 'spec_ixg_src', text_index => 'spec_ixg_tix',
      ann_index => 'spec_ixg_aix')""").head
    val v = r.getLong(0)
    assert(v === 3L, s"head after create+insert+delete+insert: $r")
    assert(r.getLong(1) === 2L, "text postings added: d4{delta,alpha}")
    assert(r.getLong(2) === 1L, "text docs tombstoned: d1")
    assert(r.getLong(3) === 1L && r.getLong(4) === 1L,
      s"ann delta: +vec4 -vec1, got $r")
    def cursor(meta: String): Long =
      spark.sql(s"""SELECT max(last_version) FROM
        graft_lake.lake.$meta""").head.getLong(0)
    assert(cursor("spec_ixg_tix_meta") === v)
    assert(cursor("spec_ixg_aix_meta") === v,
      "both cursors must land on the pinned version")
    // a mismatched table refuses loudly instead of desyncing cursors
    val e = intercept[Exception] {
      spark.sql("""CALL graft_lake.system.refresh_indexes(
        table => 'spec_tix_src', text_index => 'spec_ixg_tix',
        ann_index => 'spec_ixg_aix')""").collect()
    }
    assert(e.getMessage.contains("does not source"))
  }

  test("refresh_indexes atomicity: a doomed ANN side fails the verb " +
      "BEFORE the text cursor moves, and retry is idempotent") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_ixa_src"
    for (t <- Seq("spec_ixa_src", "spec_ixa_tix", "spec_ixa_tix_docs",
        "spec_ixa_tix_tomb", "spec_ixa_tix_meta", "spec_ixa_aix",
        "spec_ixa_aix_centroids", "spec_ixa_aix_codebooks",
        "spec_ixa_aix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql(s"""CREATE TABLE $src
      (doc_id BIGINT, text STRING, vec_id BIGINT, emb STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='2')""")
    spark.sql(s"""INSERT INTO $src VALUES
      (0L, 'alpha beta', 0L, '1000000,0,0,0'),
      (1L, 'beta gamma', 1L, '0,1000000,0,0'),
      (2L, 'alpha alpha', 2L, '900000,100000,0,0'),
      (3L, 'gamma delta', 3L, '0,900000,100000,0')""")
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_ixa_src', index_table => 'spec_ixa_tix')""")
    spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_ixa_src', index_table => 'spec_ixa_aix',
      k => 2, iters => 1, pq_m => 2, pq_k => 2, pq_iters => 1)""")
    spark.sql(s"""INSERT INTO $src VALUES
      (4L, 'delta alpha', 4L, '500000,500000,0,0')""")
    def textCursor: Long = spark.sql(
      """SELECT max(last_version)
         FROM graft_lake.lake.spec_ixa_tix_meta""").head.getLong(0)
    val before = textCursor
    // swap the ANN _meta for a pre-r14 LEGACY schema (no
    // build_mean_d2): the ANN refresh is now doomed — the verb must
    // discover that BEFORE the text cursor commits
    spark.sql("DROP TABLE graft_lake.lake.spec_ixa_aix_meta")
    spark.sql("""CREATE TABLE graft_lake.lake.spec_ixa_aix_meta
      (source STRING, k BIGINT, last_version BIGINT)
      TBLPROPERTIES ('shard_key'='last_version', 'n_shards'='1')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_ixa_aix_meta
      VALUES ('spec_ixa_src', 2L, 2L)""")
    val e = intercept[Exception] {
      spark.sql("""CALL graft_lake.system.refresh_indexes(
        table => 'spec_ixa_src', text_index => 'spec_ixa_tix',
        ann_index => 'spec_ixa_aix')""").collect()
    }
    assert(e.getMessage.contains("predates drift tracking"))
    assert(textCursor === before,
      "text cursor advanced despite the doomed ANN side — the group " +
        "is version-skewed, the exact state the verb must prevent")
    // heal the ANN side by rebuilding, then the documented crash
    // recovery: re-running the CALL re-pins the same head and an
    // already-current cursor reports a ZERO delta (idempotent retry)
    spark.sql("DROP TABLE graft_lake.lake.spec_ixa_aix_meta")
    spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_ixa_src', index_table => 'spec_ixa_aix',
      k => 2, iters => 1, pq_m => 2, pq_k => 2, pq_iters => 1)""")
    val r1 = spark.sql("""CALL graft_lake.system.refresh_indexes(
      table => 'spec_ixa_src', text_index => 'spec_ixa_tix',
      ann_index => 'spec_ixa_aix')""").head
    val r2 = spark.sql("""CALL graft_lake.system.refresh_indexes(
      table => 'spec_ixa_src', text_index => 'spec_ixa_tix',
      ann_index => 'spec_ixa_aix')""").head
    assert(r2.getLong(0) === r1.getLong(0), "retry re-pins the head")
    assert(r2.getLong(1) === 0L && r2.getLong(2) === 0L &&
      r2.getLong(3) === 0L && r2.getLong(4) === 0L,
      s"already-advanced cursors must report a zero delta, got $r2")
  }

  test("streaming index freshness: a $changes stream consumer " +
      "advances the cursor ONE COMMIT PER MICRO-BATCH and converges " +
      "to the clean-rebuild state") {
    Lake.registerCatalog(spark)
    for (t <- Seq("spec_six_src", "spec_six_ix", "spec_six_ix_docs",
        "spec_six_ix_tomb", "spec_six_ix_meta", "spec_six_rb",
        "spec_six_rb_docs", "spec_six_rb_tomb", "spec_six_rb_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql("""CREATE TABLE graft_lake.lake.spec_six_src
      (doc_id BIGINT, text STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='2')""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_six_src VALUES
      (0L, 'alpha beta'), (1L, 'beta gamma'), (2L, 'gamma alpha'),
      (3L, 'delta beta')""")
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_six_src', index_table => 'spec_six_ix')""")
    spark.sql("DELETE FROM graft_lake.lake.spec_six_src WHERE doc_id = 1")
    spark.sql("""UPDATE graft_lake.lake.spec_six_src
      SET text = 'epsilon alpha' WHERE doc_id = 2""")
    spark.sql("""INSERT INTO graft_lake.lake.spec_six_src
      VALUES (4L, 'beta epsilon')""")
    val root = spark.conf.get("spark.sql.catalog.graft_lake.path")
    val walk =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream
      .table("graft_lake.lake.`spec_six_src$changes`")
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val v = batch.agg(
            org.apache.spark.sql.functions.max("_commit_version"))
            .head()
          if (!v.isNullAt(0)) {
            GraftLakeTextIndex.refresh(root, "spec_six_ix",
              v.getLong(0))
            val cur = spark.sql("""SELECT max(last_version) FROM
              graft_lake.lake.spec_six_ix_meta""").head.getLong(0)
            walk.add((v.getLong(0), cur)): Unit
          }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one commit per micro-batch, cursor tracking each version
    // exactly (commit 1 is the initial insert — already indexed, the
    // refresh is a recorded no-op at v1)
    val steps = walk.toArray(Array.empty[(Long, Long)]).toSeq
    assert(steps.map(_._1) === Seq(1L, 2L, 3L, 4L),
      s"expected one micro-batch per commit, got $steps")
    assert(steps.forall { case (v, cur) => cur == v },
      s"cursor must land on each batch's version: $steps")
    // convergence: the followed index serves the same live postings
    // as a clean rebuild at head
    def livePostings(ix: String): Seq[(Long, String, Long)] = {
      val tomb = GraftLakeTextIndex.tombstones(spark, ix)
      GraftLakeTextIndex
        .live(spark.table(s"graft_lake.lake.$ix"), tomb)
        .selectExpr("doc_id", "term", "CAST(tf AS BIGINT) AS tf")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2))).toSeq.sorted
    }
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_six_src', index_table => 'spec_six_rb')""")
    assert(livePostings("spec_six_ix") === livePostings("spec_six_rb"),
      "streamed cursor advance diverged from the clean rebuild")
  }

  test("crash between the group refresh's two cursor commits leaves " +
      "an OPEN INTENT: maintenance_plan reports it, the next " +
      "refresh_indexes self-heals and clears it") {
    Lake.registerCatalog(spark)
    val src = "graft_lake.lake.spec_ixc_src"
    for (t <- Seq("spec_ixc_src", "spec_ixc_tix", "spec_ixc_tix_docs",
        "spec_ixc_tix_tomb", "spec_ixc_tix_meta", "spec_ixc_tix_bm",
        "spec_ixc_aix", "spec_ixc_aix_centroids",
        "spec_ixc_aix_codebooks", "spec_ixc_aix_meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql(s"""CREATE TABLE $src
      (doc_id BIGINT, text STRING, vec_id BIGINT, emb STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='2')""")
    spark.sql(s"""INSERT INTO $src VALUES
      (0L, 'alpha beta', 0L, '1000000,0,0,0'),
      (1L, 'beta gamma', 1L, '0,1000000,0,0'),
      (2L, 'alpha alpha', 2L, '900000,100000,0,0'),
      (3L, 'gamma delta', 3L, '0,900000,100000,0')""")
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_ixc_src', index_table => 'spec_ixc_tix')""")
    spark.sql("""CALL graft_lake.system.build_ann_index(
      table => 'spec_ixc_src', index_table => 'spec_ixc_aix',
      k => 2, iters => 1, pq_m => 2, pq_k => 2, pq_iters => 1)""")
    spark.sql(s"""INSERT INTO $src VALUES
      (4L, 'delta alpha', 4L, '500000,500000,0,0')""") // source v2
    val root = spark.conf.get("spark.sql.catalog.graft_lake.path")
    def cursor(meta: String): Long =
      spark.sql(s"""SELECT max(last_version) FROM
        graft_lake.lake.$meta""").head.getLong(0)
    // SIMULATE the crash: intent written, text cursor committed, ANN
    // cursor never advanced (the exact state a retry must repair)
    GraftLakeProcedures.writeIntent(root, "spec_ixc_tix",
      "spec_ixc_aix", "spec_ixc_src", 2L)
    GraftLakeTextIndex.refresh(root, "spec_ixc_tix", 2L)
    assert(cursor("spec_ixc_tix_meta") === 2L)
    assert(cursor("spec_ixc_aix_meta") === 1L, "the skew under test")
    def planRows(): Map[(String, String), (Long, String)] =
      spark.sql("""CALL graft_lake.system.maintenance_plan(
          table => 'spec_ixc_src', text_index => 'spec_ixc_tix',
          ann_index => 'spec_ixc_aix')""")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getString(4)))).toMap
    val p = planRows()
    assert(p.size === 8, s"dangling intent must surface: $p")
    assert(p(("index_group", "open_refresh_intent")) ===
      ((1000000L, "refresh_indexes")))
    // the heal: re-pin, advance both (text reports a zero delta —
    // idempotent at the version), clear the intent
    val r = spark.sql("""CALL graft_lake.system.refresh_indexes(
      table => 'spec_ixc_src', text_index => 'spec_ixc_tix',
      ann_index => 'spec_ixc_aix')""").head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L &&
      r.getLong(3) === 1L, s"heal: $r")
    assert(cursor("spec_ixc_tix_meta") === 2L)
    assert(cursor("spec_ixc_aix_meta") === 2L)
    assert(GraftLakeProcedures.openIntent(root, "spec_ixc_tix",
      "spec_ixc_aix").isEmpty, "intent must clear after the heal")
    assert(planRows().size === 7, "healthy group adds no intent row")
  }

  test("block-max WAND: low-bound blocks are SKIPPED (blocks_skipped " +
      "> 0) and the pruned top-k equals the exhaustive answer") {
    Lake.registerCatalog(spark)
    for (t <- Seq("spec_wand_src", "spec_wand_ix", "spec_wand_ix_docs",
        "spec_wand_ix_tomb", "spec_wand_ix_meta", "spec_wand_ix_bm"))
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.lake.$t")
    spark.sql("""CREATE TABLE graft_lake.lake.spec_wand_src
      (doc_id BIGINT, text STRING)
      TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='2')""")
    // skewed corpus: block 0 (docs 0-63) holds short, term-dense docs
    // (tf 8, dl 8); blocks 1-3 (docs 64-255) hold one term occurrence
    // diluted in long padding — their metadata bound can never reach
    // block 0's 5th-best score
    spark.sql("""INSERT INTO graft_lake.lake.spec_wand_src
      SELECT id, CASE WHEN id < 64
        THEN concat_ws(' ', array_repeat('alpha', 8))
        ELSE concat('alpha ', concat_ws(' ', array_repeat('pad', 100)))
        END
      FROM range(0, 256)""")
    spark.sql("""CALL graft_lake.system.build_text_index(
      table => 'spec_wand_src', index_table => 'spec_wand_ix')""")
    // 4 doc-blocks of term metadata for 'alpha'
    assert(spark.table("graft_lake.lake.spec_wand_ix_bm")
      .filter(col("term") === "alpha").count() === 4L)
    val terms = Seq((1L, "alpha"))
    val (pruned, skipped) = GraftLakeTextIndex.wandTopk(spark,
      "spec_wand_ix", terms, 5, seedBlocks = 1)
    // seeding one block establishes θ; the three diluted blocks all
    // bound below it and never reach the scoring stages
    val sk = skipped.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sk.toSeq === Seq((1L, 3L)),
      s"expected 3 skipped blocks for q1, got ${sk.toSeq}")
    // exhaustive twin: seed EVERYTHING (no block past the seed rank
    // ⇒ nothing is ever pruned) — results must agree exactly
    val (exhaustive, none) = GraftLakeTextIndex.wandTopk(spark,
      "spec_wand_ix", terms, 5, seedBlocks = Int.MaxValue)
    assert(none.collect().isEmpty)
    assert(pruned.collect().toSeq === exhaustive.collect().toSeq,
      "pruning changed the top-k — the bound is not an upper bound")
  }
}
