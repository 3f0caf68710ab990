package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PERSISTED ANN INDEX as incrementally-maintained lake tables — the
  * engine-side replacement for the reference's client-side model/feature
  * loop (`KubeflowStockPricePrediction.ipynb` cell-13/21: the notebook
  * pulls features out and trains/serves outside the engine; here the
  * trained structure LIVES IN the lake and advances with the data).
  *
  * `CALL graft_lake.system.build_ann_index(table, index_table, k, iters)`
  * trains the IVF coarse quantizer (the deterministic Lloyd kernel shared
  * with `embedding_kmeans` — µ-grid decimal means, vec_id<k seeding) over
  * the source snapshot pinned at `VERSION AS OF`, then persists THREE
  * lake tables:
  *
  *  - `<ix>_centroids (cell, centroid, n)` — k rows, the quantizer;
  *  - `<ix>          (cell, vec_id, emb)` — every corpus vector assigned
  *    to its nearest centroid, SHARDED BY CELL, so a probe of cell c is
  *    a point-lookup-pruned scan of the shards c routes to (the FAISS
  *    IVF inverted-list layout, expressed as lake shard routing);
  *  - `<ix>_meta (source, k, last_version)` — the index cursor: which
  *    source snapshot the index reflects (append-only; head = max).
  *
  * `CALL graft_lake.system.refresh_ann_index(index_table)` advances the
  * index from the source's `$changes` feed, O(delta) by construction:
  * the version-bounded CDF read plans only the commits PAST the cursor
  * (never a corpus rescan — the same startingVersion machinery as
  * `lake_changes_bounded`), removed rows MERGE-delete out of the
  * assignment lists, new rows assign to their nearest EXISTING centroid
  * (standard IVF append semantics — the quantizer is stable between
  * retrains) and append. Readers see index versions transactionally:
  * a probe planned mid-refresh reads the pinned snapshot (lake snapshot
  * isolation), never a half-advanced list.
  *
  * Embeddings travel as µ-quantized CSV strings (the repo-wide exact
  * serialization contract — round(x·1e6) BIGINTs — so the DuckDB oracle
  * can reproduce every value bit-for-bit from the raw corpus; the lake
  * codec is scalar-typed by design, LakeShardCodec.scala:60-88).
  *
  * 100 TB shape: build is T·(broadcast-assign + O(k·d)-state aggregate)
  * like `embedding_kmeans`, with ONE corpus materialization for the
  * parsed vectors; refresh touches only the delta's shards on both the
  * read (CDF planning) and write (hash-routed append) sides; probes read
  * only the probed cells' shards.
  */
object GraftLakeAnnIndex {

  private def q(name: String) = s"graft_lake.lake.$name"

  private def dataDir(root: String, table: String): String = {
    val bare = table.stripPrefix("lake.")
    require(new java.io.File(root, s"$bare.lake.json").exists(),
      s"no such lake table: $table")
    new java.io.File(root, bare).getPath
  }

  /** µ-CSV string → array<double> on the exact 1e-6 grid. */
  private val parseSv =
    "transform(split(emb, ','), t -> CAST(t AS DOUBLE) / 1000000.0D)"

  private def parsed(df: DataFrame): DataFrame = df
    .selectExpr("vec_id", "emb", s"$parseSv AS sv")
    .selectExpr("vec_id", "emb", "sv", "graft_dot(sv, sv) AS xx")

  /** Serialize a µ-grid array<double> column back to the CSV contract. */
  private def muCsv(col: String): String =
    s"""concat_ws(',', transform($col,
        x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS STRING)))"""

  private def centroidFrame(s: SparkSession, ix: String): DataFrame =
    s.table(q(s"${ix}_centroids"))
      .selectExpr("cell AS cid",
        s"""transform(split(centroid, ','),
            t -> CAST(t AS DOUBLE) / 1000000.0D) AS centroid""")

  private def codebookFrame(s: SparkSession, ix: String): DataFrame =
    s.table(q(s"${ix}_codebooks"))
      .selectExpr("CAST(j AS INT) AS j", "code AS cid",
        s"""transform(split(centroid, ','),
            t -> CAST(t AS DOUBLE) / 1000000.0D) AS centroid""")

  /** One row per (vector, PQ subspace): `sv` = the j-th slice. */
  private def subSlices(v: DataFrame, m: Int, sub: Int): DataFrame = {
    val structs = (0 until m).map(j =>
      s"struct(CAST($j AS INT) AS j, " +
        s"slice(sv, ${j * sub + 1}, $sub) AS sv)").mkString(", ")
    v.selectExpr("vec_id", s"explode(array($structs)) AS e")
      .selectExpr("vec_id", "e.j AS j", "e.sv AS sv")
      .selectExpr("vec_id", "j", "sv", "graft_dot(sv, sv) AS xx")
  }

  /** Encode vectors against trained codebooks: per vector, the CSV of
    * its m nearest sub-codes in subspace order. */
  private def encode(sub: DataFrame, books: DataFrame): DataFrame =
    Similarity.kmAssignSpark(sub, books, byJ = true)
      .selectExpr("vec_id", "j", "cid")
      .groupBy("vec_id")
      .agg(expr("""concat_ws(',', transform(
        sort_array(collect_list(struct(j, cid))),
        p -> CAST(p.cid AS STRING)))""").as("codes"))

  /** Train + persist. Returns (centroids, vectors, sourceVersion).
    * Alongside the IVF quantizer, PQ CODEBOOKS train per subspace
    * (`pqM` slices of the vector, `pqK` codes each, the Jégou et al.
    * product-quantization layout) and every vector's m-code encoding
    * persists WITH its assignment row — the compressed representation
    * ADC search scores through without touching the float vectors. */
  def build(root: String, table: String, ix: String, k: Int,
      iters: Int, pqM: Int = 8, pqK: Int = 32,
      pqIters: Int = 2): (Int, Long, Int) = {
    val s = SparkSession.active
    val src = table.stripPrefix("lake.")
    // pin the snapshot FIRST: a concurrent commit between the version
    // stamp and the read would otherwise desync cursor and content
    val v = GraftLakeIO.latestVersion(dataDir(root, src))
    val corpus = parsed(s.sql(
      s"SELECT vec_id, emb FROM ${q(src)} VERSION AS OF $v"))
      // ONE materialization of the parsed vectors: every Lloyd pass
      // reads arrays, never re-parses strings (HOF parse is per-element
      // interpreted — fine once, wrong k·iters times)
      .localCheckpoint()
    val dim = corpus.selectExpr("size(sv) AS d").limit(1).head.getInt(0)
    require(dim % pqM == 0,
      s"pq_m=$pqM must divide the embedding dimensionality $dim")
    var cents = corpus.filter(col("vec_id") < k)
      .selectExpr("vec_id AS cid", "sv AS centroid")
    for (_ <- 1 to iters)
      cents = Similarity.kmUpdateSpark(
        Similarity.kmAssignSpark(corpus, cents, byJ = false), Seq("cid"))
        .localCheckpoint()
    // PQ training over the SAME µ-grid corpus (per-subspace Lloyd,
    // seeds = the pqK smallest vec_ids' subvectors)
    val sub = subSlices(corpus, pqM, dim / pqM).localCheckpoint()
    var books = sub.filter(col("vec_id") < pqK)
      .selectExpr("j", "vec_id AS cid", "sv AS centroid")
    for (_ <- 1 to pqIters)
      books = Similarity.kmUpdateSpark(
        Similarity.kmAssignSpark(sub, books, byJ = true), Seq("j", "cid"))
        .localCheckpoint()
    val assigned = Similarity
      .kmAssignSpark(corpus, cents, byJ = false)
      .selectExpr("cid AS cell", "vec_id", "emb", "d2")
      .join(encode(sub, books), "vec_id")
      .selectExpr("cell", "vec_id", "emb", "codes", "d2")
      .localCheckpoint() // one pass feeds insert + counts + drift base
    // the build-time FIT QUALITY, the drift metric's baseline: mean
    // squared distance of every vector to its assigned centroid —
    // when the live mean pulls away from this, the quantizer has gone
    // stale and the user should retrain (lifecycle, round 14).
    // DECIMAL-folded at 6 dp so the mean is partition-order
    // independent (the repo-wide exactness discipline — the
    // registered drift query is oracle-checked against DuckDB)
    val meanD2 = assigned
      .selectExpr("CAST(round(d2, 6) AS DECIMAL(18,6)) AS d6")
      .agg((sum(col("d6")).cast("double") / count(lit(1))).as("m"))
      .head.getDouble(0)
    Seq(s"${ix}_centroids", s"${ix}_codebooks", ix, s"${ix}_meta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${q(t)}"))
    s.sql(s"""CREATE TABLE ${q(s"${ix}_centroids")}
              (cell BIGINT, centroid STRING, n BIGINT)
              TBLPROPERTIES ('shard_key'='cell', 'n_shards'='1')""")
    s.sql(s"""CREATE TABLE ${q(s"${ix}_codebooks")}
              (j BIGINT, code BIGINT, centroid STRING)
              TBLPROPERTIES ('shard_key'='j', 'n_shards'='1')""")
    s.sql(s"""CREATE TABLE ${q(ix)}
              (cell BIGINT, vec_id BIGINT, emb STRING, codes STRING)
              TBLPROPERTIES ('shard_key'='cell', 'n_shards'='8')""")
    s.sql(s"""CREATE TABLE ${q(s"${ix}_meta")}
              (source STRING, k BIGINT, last_version BIGINT,
               build_mean_d2 DOUBLE)
              TBLPROPERTIES ('shard_key'='last_version',
                'n_shards'='1')""")
    cents
      .join(assigned.groupBy("cell").agg(count(lit(1)).as("n")),
        col("cid") === col("cell"), "left_outer")
      .selectExpr("cid AS cell", s"${muCsv("centroid")} AS centroid",
        "coalesce(n, 0L) AS n")
      .createOrReplaceTempView("graft_annix_centroids_src")
    s.sql(s"""INSERT INTO ${q(s"${ix}_centroids")}
              SELECT * FROM graft_annix_centroids_src""")
    books
      .selectExpr("CAST(j AS BIGINT) AS j", "cid AS code",
        s"${muCsv("centroid")} AS centroid")
      .createOrReplaceTempView("graft_annix_books_src")
    s.sql(s"""INSERT INTO ${q(s"${ix}_codebooks")}
              SELECT * FROM graft_annix_books_src""")
    assigned.selectExpr("cell", "vec_id", "emb", "codes")
      .createOrReplaceTempView("graft_annix_cells_src")
    s.sql(s"""INSERT INTO ${q(ix)}
              SELECT * FROM graft_annix_cells_src""")
    s.sql(s"""INSERT INTO ${q(s"${ix}_meta")}
              VALUES ('$src', ${k}L, ${v}L, ${meanD2}D)""")
    val nCents = s.table(q(s"${ix}_centroids")).count().toInt
    val nVecs = s.table(q(ix)).count()
    (nCents, nVecs, v)
  }

  /** Pre-r14 indexes persisted a 3-column `_meta` without
    * `build_mean_d2`; selecting it there fails with an opaque
    * unresolved-column analysis error. Detect the legacy schema up
    * front and say what to do about it. */
  private def requireDriftBaseline(meta: DataFrame, ix: String): Unit =
    if (!meta.schema.fieldNames.contains("build_mean_d2"))
      throw new IllegalStateException(
        s"ANN index '$ix' predates drift tracking (its _meta table " +
          "has no build_mean_d2 column); CALL " +
          s"retrain_ann_index('$ix') to rebuild it with a drift " +
          "baseline")

  /** The preconditions [[refresh]] itself asserts — `_meta` readable
    * and the drift baseline present — WITHOUT mutating anything.
    * `CALL refresh_indexes` runs this BEFORE the text refresh commits
    * its cursor: the group's two cursor advances are separate CAS
    * commits, so an ANN-side failure discovered after the text commit
    * would leave the group half-advanced — the exact version skew the
    * verb exists to prevent. */
  def validateRefreshPreconditions(ix: String): Unit =
    requireDriftBaseline(
      SparkSession.active.table(q(s"${ix}_meta")), ix)

  /** Advance from `$changes`. Returns (from, to, added, removed).
    * `headOverride` >= 0 pins the target version (the
    * `CALL refresh_indexes` snapshot-consistency hook — see the text
    * index twin). */
  def refresh(root: String, ix: String,
      headOverride: Long = -1L): (Long, Long, Long, Long) = {
    val s = SparkSession.active
    requireDriftBaseline(s.table(q(s"${ix}_meta")), ix)
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
    // startingVersion is EXCLUSIVE by this lake's contract ("already
    // processed through v" — lake_changes_bounded pins it), so the
    // cursor value itself is the right lower bound for (last, head]
    val changes = s.read
      .option("startingVersion", last.toString)
      .option("endingVersion", head.toString)
      .table(s"graft_lake.lake.`$src$$changes`")
    // removals FIRST: an updated vector is update_preimage (delete the
    // stale assignment) + update_postimage (re-assign) — inserting
    // before deleting would let the MERGE remove the fresh row.
    // DataFrame-level MERGE/append, not temp-view SQL: a temp view
    // over a v2 relation becomes a V2TableReference, and the bounded
    // `$changes` read does not survive that re-resolution
    val dels = changes
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .selectExpr("vec_id AS del_vec_id")
    val removed = dels.count()
    if (removed > 0)
      dels.as("d")
        .mergeInto(q(ix), expr(s"$ix.vec_id = d.del_vec_id"))
        .whenMatched().delete()
        .merge()
    val adds = parsed(changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select("vec_id", "emb"))
    // nearest EXISTING centroid + EXISTING codebooks — neither
    // quantizer moves on refresh, so old and new vectors rank (and
    // ADC-score) in one consistent space
    val books = codebookFrame(s, ix)
    // the dimensionality is a property of the PERSISTED index, not of
    // the delta: m subspaces × the trained subvector length — derived
    // from the codebooks in the same tiny aggregate that finds m, so
    // no extra job (and no probe of `adds`, which may be empty)
    val bk = books
      .selectExpr("max(j) AS m", "max(size(centroid)) AS sub").head()
    val pqM = bk.getInt(0) + 1
    val dim = pqM * bk.getInt(1)
    val assigned = Similarity
      .kmAssignSpark(adds, centroidFrame(s, ix), byJ = false)
      .selectExpr("cid AS cell", "vec_id", "emb")
      .join(encode(subSlices(adds, pqM, dim / pqM), books), "vec_id")
      .selectExpr("cell", "vec_id", "emb", "codes")
    val added = assigned.count()
    if (added > 0)
      assigned.writeTo(q(ix)).append()
    s.sql(s"""INSERT INTO ${q(s"${ix}_meta")}
              SELECT source, k, ${head}L, build_mean_d2
              FROM ${q(s"${ix}_meta")}
              ORDER BY last_version DESC LIMIT 1""")
    (last, head, added, removed)
  }

  /** DRIFT METRIC — tells the user WHEN to retrain. The live mean
    * squared distance of every indexed vector to its ASSIGNED centroid
    * (not the nearest: drift shows up precisely as vectors stuck in
    * stale cells), compared to the build-time fit recorded in the
    * meta cursor. A refresh-only index over a shifted distribution
    * pulls the live mean above the baseline; `ratio` ≫ 1 = retrain.
    * One keyed aggregate over the assignment shards — no training, no
    * driver state; at 100 TB this is a single column-pruned scan
    * (emb + cell) and can be sampled per cell if even that is too
    * much. */
  def drift(root: String, ix: String): (Double, Double, Double) = {
    val s = SparkSession.active
    val metaTbl = s.table(q(s"${ix}_meta"))
    requireDriftBaseline(metaTbl, ix)
    val meta = metaTbl
      .orderBy(col("last_version").desc).limit(1)
      .selectExpr("build_mean_d2").head()
    val base = meta.getDouble(0)
    val live = s.table(q(ix))
      .selectExpr("cell", s"$parseSv AS sv")
      .join(centroidFrame(s, ix), col("cell") === col("cid"))
      .selectExpr("""CAST(round(graft_dot(sv, sv)
          - 2 * graft_dot(sv, centroid)
          + graft_dot(centroid, centroid), 6)
          AS DECIMAL(18,6)) AS d6""")
      .agg((sum(col("d6")).cast("double") / count(lit(1))).as("m"))
      .head.getDouble(0)
    (base, live, if (base > 0) live / base else Double.PositiveInfinity)
  }

  /** RETRAIN — the lifecycle completion of [[refresh]]: rebuild the
    * quantizer AND the codebooks over the source's CURRENT snapshot
    * and reassign/re-encode everything, reusing [[build]] wholesale
    * (same deterministic kernels, same tables DROPped and recreated,
    * cursor re-pinned at the retrain version). The shape parameters
    * come FROM the index itself — k from the meta cursor (overridable
    * when the corpus outgrew its cell count), pq_m/pq_k from the
    * persisted codebooks — so a plain
    * `CALL retrain_ann_index(index_table)` needs nothing the user has
    * to remember. Atomicity is PER TABLE only: build() drops and
    * recreates the four index tables sequentially, so a probe that
    * starts BETWEEN those commits can see a missing table or a
    * mixed-generation pair (new centroids against old cells); a probe
    * planned before the retrain finishes consistently against its own
    * pre-retrain snapshots (lake snapshot isolation per table).
    * Retrain is an offline maintenance verb — run it without
    * concurrent probes, or build into staging names and swap. */
  def retrain(root: String, ix: String, kOverride: Int = -1,
      iters: Int = 3, pqIters: Int = 2): (Int, Long, Int) = {
    val s = SparkSession.active
    val meta = s.table(q(s"${ix}_meta"))
      .orderBy(col("last_version").desc).limit(1)
      .selectExpr("source", "k").head()
    val src = meta.getString(0)
    val k = if (kOverride > 0) kOverride else meta.getLong(1).toInt
    val bk = codebookFrame(s, ix)
      .selectExpr("max(j) AS m", "count(DISTINCT cid) AS pqk").head()
    build(root, src, ix, k, iters,
      pqM = bk.getInt(0) + 1, pqK = bk.getLong(1).toInt,
      pqIters = pqIters)
  }
}
