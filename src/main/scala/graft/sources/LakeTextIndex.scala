package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED INVERTED (TEXT) INDEX as incrementally-maintained lake
  * tables — the lexical twin of [[GraftLakeAnnIndex]]: where the ANN
  * index persists the trained IVF structure, this persists the BM25
  * scoring state (postings + document lengths), so a ranked text
  * search costs a point-lookup-pruned probe of the query terms'
  * shards instead of a corpus tokenize (the Lucene/ES segment model,
  * expressed as lake shard routing + snapshot isolation).
  *
  * `CALL graft_lake.system.build_text_index(table, index_table)`
  * tokenizes the source snapshot (pinned at `VERSION AS OF`) and
  * persists FIVE lake tables:
  *
  *  - `<ix>       (term_h, term, doc_id, tf, ver)` — one posting per
  *    (document, term), SHARDED BY `term_h` (the 60-bit md5 term hash
  *    — shard keys are integral; the string `term` column rides along
  *    so the final equi-join is collision-proof). A probe of k query
  *    terms plans only the shards those hashes route to.
  *  - `<ix>_docs  (doc_id, dl, ver)` — document lengths (the BM25
  *    normalizer), sharded by doc_id.
  *  - `<ix>_tomb  (doc_id, before)` — DELETION TOMBSTONES: "rows of
  *    doc_id with ver < before are dead". Inverted indexes cannot
  *    cheaply delete by doc (a document's postings spread across all
  *    term shards), so deletion is a tombstone append — O(1) per
  *    deleted doc — applied at probe time by an anti-mask against the
  *    (tiny) tombstone table and physically resolved at the next
  *    rebuild. This is the standard Lucene live-docs design.
  *  - `<ix>_meta  (source, last_version)` — the cursor (head = max).
  *  - `<ix>_bm    (term_h, term, block, max_tf, min_dl, ver)` —
  *    BLOCK-MAX skip metadata (one row per term × 64-doc block, see
  *    [[wandTopk]]), sharded by `term_h` like the postings so a probe
  *    reads only the query terms' metadata shards.
  *
  * `CALL graft_lake.system.refresh_text_index(index_table)` advances
  * from the source's `$changes` feed, O(delta): deleted/pre-image docs
  * append one tombstone row each; inserted/post-image docs tokenize
  * and append postings + length rows stamped `ver = head`, which the
  * `ver >= before` liveness rule makes visible past their own
  * tombstone (an update is delete + re-add at the same version).
  *
  * 100 TB shape: build is the one corpus tokenize-shuffle every text
  * operator already pays, persisted once; refresh reads only the
  * commits past the cursor and appends (never rewrites a posting
  * shard); probes scan only the probed terms' shards and join the
  * broadcast tombstone/stats frames. Rebuild (= build again) is the
  * compaction that folds tombstones away. */
object GraftLakeTextIndex {

  private def q(name: String) = s"graft_lake.lake.$name"

  /** Docs per BLOCK-MAX block: blocks partition DOCUMENTS
    * (`block = doc_id div blockDocs`), so a term's postings for one
    * doc always land in one block and "score block b" means "fully
    * score every doc in b". Fixed, not a conf — probe and build must
    * agree forever, and a changed width would silently mis-bucket
    * every persisted index. */
  private[sources] val blockDocs = 64L

  /** The per-(term, doc) BM25 partial — 6 dp DECIMAL, the exact
    * arithmetic `text_bm25_topk` and every indexed probe share (one
    * definition, so the block-max prune bound and the scorer can
    * never drift apart). Expects columns n_docs, df, tf, dl,
    * sum_dl in scope. */
  private[sources] val bm25PartialSql: String =
    """CAST(round(
         ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         (CAST(tf AS DOUBLE) * 2.2) /
         (CAST(tf AS DOUBLE) + 1.2 *
           (0.25 + 0.75 * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
            / CAST(sum_dl AS DOUBLE))),
       6) AS DECIMAL(18,6)) AS ps"""

  private def dataDir(root: String, table: String): String = {
    val bare = table.stripPrefix("lake.")
    require(new java.io.File(root, s"$bare.lake.json").exists(),
      s"no such lake table: $table")
    new java.io.File(root, bare).getPath
  }

  /** Whitespace tokens of a (doc_id, text) frame with their 0-based
    * positions — the SAME segmentation as `text_bm25_topk`/
    * `text_token_count`, so the indexed scores are provably the
    * recomputed scores. */
  private def tokens(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id",
      "posexplode(split(text, ' ')) AS (pos, term)")

  /** Postings + doc-length rows for a (doc_id, text) frame, stamped
    * with the source version they reflect. Each posting is
    * POSITIONAL: the ascending CSV of the term's 0-based token
    * positions (the Lucene proximity-data layout) — phrase and
    * proximity queries join positions instead of rescanning text. */
  private def indexRows(docs: DataFrame,
      ver: Long): (DataFrame, DataFrame) = {
    val toks = tokens(docs)
    val postings = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"),
        expr("concat_ws(',', sort_array(collect_list(pos)))")
          .as("positions"))
      .selectExpr("graft_hex60(term) AS term_h", "term", "doc_id",
        "tf", "positions", s"CAST($ver AS BIGINT) AS ver")
    val doclens = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"))
      .selectExpr("doc_id", "dl", s"CAST($ver AS BIGINT) AS ver")
    (postings, doclens)
  }

  /** BLOCK-MAX metadata rows for a postings/doc-length batch: per
    * (term, doc-block), the term's max tf and the block's min doc
    * length — exactly the two monotone inputs of the BM25 partial
    * (increasing in tf, decreasing in dl), so at probe time
    * `partial(max_tf, min_dl, live df/stats)` upper-bounds every
    * actual partial in the block. The bound survives maintenance
    * without rewrites: deletions only REMOVE candidates (a stale max
    * stays a valid, merely looser bound) and refresh APPENDS the
    * delta's rows — the probe folds generations with max/min. This is
    * the Block-Max WAND skip structure (Ding & Suel, SIGIR'11)
    * persisted as a lake table beside the postings. */
  private def blockRows(postings: DataFrame,
      doclens: DataFrame): DataFrame =
    postings.join(doclens.select("doc_id", "dl"), "doc_id")
      .selectExpr("term_h", "term", s"doc_id div $blockDocs AS block",
        "tf", "dl", "ver")
      .groupBy("term_h", "term", "block")
      .agg(max("tf").as("max_tf"), min("dl").as("min_dl"),
        max("ver").as("ver"))

  /** Train-free build: tokenize the pinned snapshot, DROP + recreate
    * the four index tables, persist. Returns
    * (postings, docs, sourceVersion). */
  def build(root: String, table: String, ix: String)
      : (Long, Long, Int) = {
    val s = SparkSession.active
    val src = table.stripPrefix("lake.")
    // pin the snapshot FIRST (the ANN build discipline): a commit
    // between stamp and read would desync cursor and content
    val v = GraftLakeIO.latestVersion(dataDir(root, src))
    val docs = s.sql(
      s"SELECT doc_id, text FROM ${q(src)} VERSION AS OF $v")
    val (postings, doclens) = indexRows(docs, v.toLong)
    Seq(ix, s"${ix}_docs", s"${ix}_tomb", s"${ix}_meta", s"${ix}_bm")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${q(t)}"))
    s.sql(s"""CREATE TABLE ${q(ix)}
              (term_h BIGINT, term STRING, doc_id BIGINT, tf BIGINT,
               positions STRING, ver BIGINT)
              TBLPROPERTIES ('shard_key'='term_h', 'n_shards'='8')""")
    s.sql(s"""CREATE TABLE ${q(s"${ix}_docs")}
              (doc_id BIGINT, dl BIGINT, ver BIGINT)
              TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='4')""")
    s.sql(s"""CREATE TABLE ${q(s"${ix}_tomb")}
              (doc_id BIGINT, before BIGINT)
              TBLPROPERTIES ('shard_key'='doc_id', 'n_shards'='1')""")
    s.sql(s"""CREATE TABLE ${q(s"${ix}_meta")}
              (source STRING, last_version BIGINT)
              TBLPROPERTIES ('shard_key'='last_version',
                'n_shards'='1')""")
    s.sql(s"""CREATE TABLE ${q(s"${ix}_bm")}
              (term_h BIGINT, term STRING, block BIGINT,
               max_tf BIGINT, min_dl BIGINT, ver BIGINT)
              TBLPROPERTIES ('shard_key'='term_h', 'n_shards'='8')""")
    postings.createOrReplaceTempView("graft_tix_postings_src")
    s.sql(s"""INSERT INTO ${q(ix)}
              SELECT * FROM graft_tix_postings_src""")
    doclens.createOrReplaceTempView("graft_tix_doclens_src")
    s.sql(s"""INSERT INTO ${q(s"${ix}_docs")}
              SELECT * FROM graft_tix_doclens_src""")
    blockRows(postings, doclens)
      .createOrReplaceTempView("graft_tix_bm_src")
    s.sql(s"""INSERT INTO ${q(s"${ix}_bm")}
              SELECT * FROM graft_tix_bm_src""")
    s.sql(s"""INSERT INTO ${q(s"${ix}_meta")}
              VALUES ('$src', ${v}L)""")
    val nPost = s.table(q(ix)).count()
    val nDocs = s.table(q(s"${ix}_docs")).count()
    (nPost, nDocs, v)
  }

  /** Advance from `$changes`. Returns
    * (from, to, postingsAdded, docsTombstoned).
    *
    * `headOverride` >= 0 pins the target version instead of the
    * source's current head — the snapshot-consistency hook
    * `CALL refresh_indexes` uses to advance a table's text AND ANN
    * cursors to the SAME version even while writers keep
    * committing. */
  def refresh(root: String, ix: String,
      headOverride: Long = -1L): (Long, Long, Long, Long) = {
    val s = SparkSession.active
    val meta = s.table(q(s"${ix}_meta"))
      .orderBy(col("last_version").desc).limit(1)
      .selectExpr("source", "last_version").head()
    val src = meta.getString(0)
    val last = meta.getLong(1)
    val atHead = GraftLakeIO.latestVersion(dataDir(root, src)).toLong
    require(headOverride < 0 || headOverride <= atHead,
      s"refresh target v$headOverride is past $src's head v$atHead")
    val head = if (headOverride >= 0) headOverride else atHead
    if (head <= last) return (last, head, 0L, 0L)
    val changes = s.read
      .option("startingVersion", last.toString)
      .option("endingVersion", head.toString)
      .table(s"graft_lake.lake.`$src$$changes`")
    // tombstones FIRST (one row per doc that existed before, O(1) per
    // delete): an update is preimage (tombstone: everything before
    // `head` is dead) + postimage (fresh rows at ver = head, live
    // because the liveness rule is ver >= before)
    val dead = changes
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select("doc_id").distinct()
      .selectExpr("doc_id", s"CAST($head AS BIGINT) AS before")
    val removed = dead.count()
    if (removed > 0) {
      dead.createOrReplaceTempView("graft_tix_tomb_src")
      s.sql(s"""INSERT INTO ${q(s"${ix}_tomb")}
                SELECT * FROM graft_tix_tomb_src""")
    }
    // re-add only each doc's FINAL in-window image: a doc inserted at
    // v2 and deleted at v4 has no add row at its max commit version,
    // so the multi-commit window collapses to the truth instead of
    // resurrecting the mid-window state
    val lastV = changes.groupBy("doc_id")
      .agg(max("_commit_version").as("vmax"))
    val adds = changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .join(lastV, "doc_id")
      .filter(col("_commit_version") === col("vmax"))
      .select("doc_id", "text")
    val (postings, doclens) = indexRows(adds, head)
    val added = postings.count()
    if (added > 0) {
      postings.createOrReplaceTempView("graft_tix_postings_src")
      s.sql(s"""INSERT INTO ${q(ix)}
                SELECT * FROM graft_tix_postings_src""")
      doclens.createOrReplaceTempView("graft_tix_doclens_src")
      s.sql(s"""INSERT INTO ${q(s"${ix}_docs")}
                SELECT * FROM graft_tix_doclens_src""")
      // block-max rows for the delta generation append like the
      // postings; probes fold generations with max/min, so the skip
      // bound stays valid without rewriting any published block row
      blockRows(postings, doclens)
        .createOrReplaceTempView("graft_tix_bm_src")
      s.sql(s"""INSERT INTO ${q(s"${ix}_bm")}
                SELECT * FROM graft_tix_bm_src""")
    }
    s.sql(s"""INSERT INTO ${q(s"${ix}_meta")}
              VALUES ('$src', ${head}L)""")
    (last, head, added, removed)
  }

  /** Index health: (livePostings, deadPostings, liveDocs,
    * docsTombstoned). Dead postings are rows the liveness mask hides
    * — they cost probe-side filtering until a rebuild folds them
    * away, so dead/live is the text index's "drift ratio": the metric
    * that tells the user WHEN to rebuild (the ANN index's staleness
    * analog; Lucene calls this deleted-docs percentage and triggers
    * segment merges on it). Two counts over the postings table + two
    * tiny frames — no tokenize, no corpus touch. */
  def stats(root: String, ix: String): (Long, Long, Long, Long) = {
    val s = SparkSession.active
    val tomb = tombstones(s, ix)
    val bcast = maskBroadcastable(s, ix)
    val post = s.table(q(ix))
    val total = post.count()
    val livePosts = live(post, tomb, bcast).count()
    val liveDocs =
      live(s.table(q(s"${ix}_docs")), tomb, bcast).count()
    (livePosts, total - livePosts, liveDocs, tomb.count())
  }

  /** Per-doc max tombstone bound (a tiny frame — one row per ever-
    * deleted doc until the next rebuild folds it away). */
  def tombstones(s: SparkSession, ix: String): DataFrame =
    s.table(q(s"${ix}_tomb"))
      .groupBy("doc_id").agg(max("before").as("before"))

  /** TOMBSTONE-GROWTH GUARD: broadcasting the mask is only sane while
    * the tombstone table is small, and a delete-heavy never-rebuilt
    * index grows it without bound. The cap (rows, default 1e6 ≈ a
    * few MB broadcast; `spark.graft.textIndex.maxBroadcastTombstones`
    * overrides) is checked against the table's METADATA row count
    * (DSv2 `SupportsReportStatistics` — parquet footers, no job, no
    * data pages). Past the cap the probe DEGRADES to a shuffle join —
    * still correct at any mask size, still O(probed shards) on the
    * postings side — and warns that a rebuild (`CALL
    * build_text_index`) would fold the mask away. Refusing outright
    * would trade an availability hole for the memory hole; Lucene's
    * answer (auto segment merge) is our rebuild, which stays the
    * user's explicit call. */
  def maskBroadcastable(s: SparkSession, ix: String): Boolean = {
    val cap = s.conf.getOption(
      "spark.graft.textIndex.maxBroadcastTombstones")
      .map(_.toLong).getOrElse(1000000L)
    val tombRows = s.table(q(s"${ix}_tomb"))
      .queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong)
      .getOrElse(s.table(q(s"${ix}_tomb")).count())
    val ok = tombRows <= cap
    if (!ok)
      // scalastyle:off println
      Console.err.println(s"[graft-tix] index '$ix' carries " +
        s"$tombRows tombstone rows (> cap $cap): probes fall back " +
        "to a shuffle-join mask; CALL " +
        s"graft_lake.system.build_text_index to fold tombstones away")
      // scalastyle:on println
    ok
  }

  /** Liveness mask: keep rows whose `ver` survives the doc's newest
    * tombstone (`ver >= before`; no tombstone = live). `bcast` comes
    * from [[maskBroadcastable]] — computed once per probe, shared by
    * the postings and doc-length masks. */
  def live(df: DataFrame, tomb: DataFrame,
      bcast: Boolean = true): DataFrame =
    df.join(if (bcast) broadcast(tomb) else tomb,
        Seq("doc_id"), "left_outer")
      .filter(col("before").isNull || col("ver") >= col("before"))
      .drop("before")

  /** BLOCK-MAX WAND top-k over the persisted index — the pruned twin
    * of the exhaustive BM25 probe (provably the SAME answer, cheaper):
    * instead of scoring every (query, doc) pair containing any query
    * term, the probe reads the tiny `<ix>_bm` metadata first and
    * skips whole doc-blocks that cannot reach the top-k.
    *
    *  1. UB(q, b) = Σ over the query's terms of
    *     `partial(max_tf, min_dl, live df/stats)` (+1e-6/term slack
    *     covering the scorer's 6 dp round-half-up) — an upper bound
    *     on ANY doc's score in block b, from metadata alone.
    *  2. SEED: fully score the `seedBlocks` highest-UB blocks per
    *     query; θ(q) = the k-th best seed score (absent ⇒ −∞).
    *  3. PRUNE: every remaining block with UB < θ is skipped — a doc
    *     there scores ≤ UB < θ ≤ the true k-th best (θ comes from a
    *     subset, so it can only UNDER-estimate the real bar; skipping
    *     below it is conservative). Survivors are scored via a
    *     broadcast (q, block) semi-join applied BEFORE the dl/df
    *     joins and the aggregate, so pruned blocks never enter the
    *     expensive stages; at 100 TB postings this is the standard
    *     top-k retrieval lever (the block list further admits a
    *     doc_id zone-map pushdown, since blocks are doc_id ranges).
    *
    * Returns (top-k frame `(q_id, rank, doc_id, n_terms, bm25)` —
    * schema-identical to the exhaustive probe, so they share one
    * oracle — and the per-query skipped-block counts the spec pins
    * positive). */
  def wandTopk(s: SparkSession, ix: String,
      queryTerms: Seq[(Long, String)], k: Int,
      seedBlocks: Int = 2): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val hashes = queryTerms.map(_._2).distinct.map(t =>
      graft.plans.HashUtil.hex60md5(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .asInstanceOf[Any])
    val qdf = queryTerms.toDF("q_id", "term")
    val tomb = tombstones(s, ix)
    val bcast = maskBroadcastable(s, ix)
    val post = live(s.table(q(ix))
      .filter(col("term_h").isin(hashes: _*)), tomb, bcast)
    val docs = live(s.table(q(s"${ix}_docs")), tomb, bcast)
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("bigint").as("sum_dl"))
    val dfreq = post.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    // metadata pass: fold block-max generations, bound each block.
    // A term whose live df is 0 drops out of the inner dfreq join —
    // sound: its true partial everywhere is 0, and any block it alone
    // anchored holds no positively-scoring doc.
    val ub = s.table(q(s"${ix}_bm"))
      .filter(col("term_h").isin(hashes: _*))
      .join(broadcast(qdf), "term")
      .groupBy("q_id", "term", "block")
      .agg(max("max_tf").as("max_tf"), min("min_dl").as("min_dl"))
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .selectExpr("q_id", "block",
        """ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5)
              / (CAST(df AS DOUBLE) + 0.5)) *
           (CAST(max_tf AS DOUBLE) * 2.2) /
           (CAST(max_tf AS DOUBLE) + 1.2 *
             (0.25 + 0.75 * CAST(min_dl AS DOUBLE)
              * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)))
           + 1e-6 AS ubt""")
      .groupBy("q_id", "block").agg(sum("ubt").as("ub"))
    val wb = Window.partitionBy("q_id")
      .orderBy(col("ub").desc, col("block"))
    // ranked + seed scores each feed MULTIPLE branches of the final
    // plan (seed pairs / rest / θ / union); both are metadata-sized
    // (queries × blocks, queries × seed docs), so materialize each
    // once instead of re-deriving the postings subtree per branch
    val ranked = ub.withColumn("brn", row_number().over(wb))
      .localCheckpoint()
    def score(pairs: DataFrame): DataFrame =
      post.withColumn("block", expr(s"doc_id div $blockDocs"))
        .join(broadcast(qdf), "term")
        .join(broadcast(pairs.select("q_id", "block")),
          Seq("q_id", "block"), "left_semi")
        .join(docs.select("doc_id", "dl"), "doc_id")
        .join(broadcast(dfreq), "term")
        .crossJoin(broadcast(stats))
        .selectExpr("q_id", "doc_id", bm25PartialSql)
        .groupBy("q_id", "doc_id")
        .agg(sum("ps").as("s"), count(lit(1)).as("n_terms"))
    val wk = Window.partitionBy("q_id")
      .orderBy(col("s").desc, col("doc_id"))
    val seedScores = score(ranked.filter(col("brn") <= seedBlocks))
      .localCheckpoint()
    val theta = seedScores.withColumn("rn", row_number().over(wk))
      .filter(col("rn") === k)
      .select(col("q_id"), col("s").cast("double").as("theta"))
    val rest = ranked.filter(col("brn") > seedBlocks)
      .join(broadcast(theta), Seq("q_id"), "left_outer")
    val skipped = rest
      .filter(col("theta").isNotNull && col("ub") < col("theta"))
      .groupBy("q_id").agg(count(lit(1)).as("blocks_skipped"))
    val survivorScores = score(
      rest.filter(col("theta").isNull || col("ub") >= col("theta")))
    val topk = seedScores.unionByName(survivorScores)
      .withColumn("rank", row_number().over(wk)
        .cast(org.apache.spark.sql.types.LongType))
      .filter(col("rank") <= k)
      .selectExpr("q_id", "rank", "doc_id", "n_terms",
        "CAST(s AS DOUBLE) AS bm25")
      .orderBy("q_id", "rank")
    (topk, skipped)
  }
}
