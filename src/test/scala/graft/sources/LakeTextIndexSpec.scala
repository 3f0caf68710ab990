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
}
