package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance STORED PROCEDURES — `CALL graft_lake.system.…`
  * through Spark 4's DSv2 `ProcedureCatalog` stack, the SQL surface
  * Trino-on-Iceberg exposes as `ALTER TABLE … EXECUTE optimize` /
  * `CALL system.expire_snapshots` / `rollback_to_snapshot` /
  * `remove_orphan_files` (reference scope: the demo's tables live in
  * engine-managed storage, and these are the engine-managed-storage
  * maintenance verbs). Spark binds and coerces the arguments
  * (positional or named, with declared defaults), the procedure runs
  * driver-side against the CAS commit protocol, and the result comes
  * back as ordinary rows via a [[LocalScan]].
  *
  *  - `optimize(table, dv_threshold, max_parts)` — deletion-vector
  *    compaction then part-count compaction
  *    ([[GraftLakeMaintenance]]); one result row per phase.
  *  - `expire_snapshots(table, keep)` — drop history older than the
  *    newest `keep` versions; one row per surviving version.
  *  - `rollback_to_version(table, version)` — restore-as-new-commit;
  *    returns the new head.
  *  - `vacuum(table, older_than_ms)` — remove crash debris (stale
  *    `_build_`/`_stage_` dirs, above-pointer orphan versions); one
  *    row per removed artifact. */
object GraftLakeProcedures {

  val Names: Seq[String] =
    Seq("optimize", "expire_snapshots", "rollback_to_version",
      "vacuum", "create_tag", "drop_tag",
      "build_ann_index", "refresh_ann_index",
      "retrain_ann_index", "ann_index_drift",
      "build_text_index", "refresh_text_index", "text_index_stats",
      "refresh_indexes",
      "create_branch", "drop_branch", "fast_forward",
      "rewrite_sorted", "maintenance_plan", "maintenance_run")

  /** Resolve the `table` argument ("tbl" or "lake.tbl") to its data
    * dir under the catalog root, refusing unknown tables loudly. */
  private def dataDir(root: String, table: String): String = {
    val bare = table.stripPrefix("lake.")
    require(new java.io.File(root, s"$bare.lake.json").exists(),
      s"no such lake table: $table")
    new java.io.File(root, bare).getPath
  }

  // ---- refresh_indexes write-ahead intent ----
  // The group refresh is two CAS commits (text cursor, then ANN
  // cursor); precondition ordering makes a DOOMED refresh atomic, but
  // a CRASH between the commits still leaves text advanced / ANN
  // behind until someone retries. The verb therefore records a tiny
  // intent (source table + pinned version) BEFORE the first cursor
  // moves and clears it after the second: an intent still on disk
  // means an unfinished group refresh — `maintenance_plan` surfaces
  // it as an extra signal row, and the next `refresh_indexes` CALL
  // self-heals by re-pinning (both refreshes are idempotent at a
  // version: an already-advanced cursor reports a zero delta).

  private def intentFile(root: String, tix: String,
      aix: String): java.io.File =
    new java.io.File(root, s"${tix}__$aix.refresh_intent")

  private[sources] def writeIntent(root: String, tix: String,
      aix: String, table: String, pinned: Long): Unit = {
    val f = intentFile(root, tix, aix)
    val tmp = new java.io.File(f.getPath +
      s"._stage_${ProcessHandle.current().pid()}")
    java.nio.file.Files.writeString(tmp.toPath, s"$table\n$pinned\n")
    if (!tmp.renameTo(f)) { // a concurrent writer won the rename
      tmp.delete()
      require(f.exists(), s"intent write lost for $tix/$aix")
    }
  }

  /** The open intent's (source table, pinned version), if an
    * unfinished group refresh left one behind. */
  private[sources] def openIntent(root: String, tix: String,
      aix: String): Option[(String, Long)] = {
    val f = intentFile(root, tix, aix)
    if (!f.exists()) None
    else java.nio.file.Files.readString(f.toPath)
      .split('\n').toSeq match {
        case t +: v +: _ => Some((t, v.trim.toLong))
        case _ => None
      }
  }

  private[sources] def clearIntent(root: String, tix: String,
      aix: String): Unit = {
    intentFile(root, tix, aix).delete(): Unit
  }

  /** The advisor's signal set — (target, signal, metric_ppm,
    * threshold_ppm, resolved action: the recommended verb when
    * metric > threshold, else "ok"). Shared by `maintenance_plan`
    * (the read-only report) and `maintenance_run` (the executor,
    * which measures before AND after). All signals are O(metadata) —
    * footer/sidecar reads and two tiny stats CALLs; only the drift
    * check runs a (cell-bounded) Spark job. */
  private def planSignals(s: org.apache.spark.sql.SparkSession,
      root: String, tbl: String, tix: String, aix: String,
      budget: Int): Seq[(String, String, Long, Long, String)] = {
    require(budget > 0, s"snapshot_budget must be > 0, got $budget")
    // text index: dead fraction + tombstone fill (both O(metadata))
    val (lp, dp, _, dt) = GraftLakeTextIndex.stats(root, tix)
    val deadPpm = if (lp + dp == 0L) 0L else dp * 1000000L / (lp + dp)
    val cap = s.conf.getOption(
      "spark.graft.textIndex.maxBroadcastTombstones")
      .map(_.toLong).getOrElse(1000000L)
    val tombPpm = dt * 1000000L / cap
    // ANN index: quantizer staleness in ppm — both means rounded to
    // 6 dp FIRST (the drift oracle's cross-engine agreement point),
    // then one double division, µ-rounded
    val (b, l, _) = GraftLakeAnnIndex.drift(root, aix)
    def r6(x: Double): Double = math.round(x * 1000000d) / 1000000d
    val driftPpm = math.round(r6(l) / r6(b) * 1000000d)
    // table storage: part inventory + DVs + sorted provenance, all
    // driver-side metadata (footers/sidecars — no Spark job at all)
    val vdir = GraftLakeIO.versionDir(dataDir(root, tbl),
      GraftLakeIO.latestVersion(dataDir(root, tbl)))
    val parts = GraftLakeIO.allShardParts(vdir)
    val dv = GraftLakeIO.readDv(vdir)
    val nf = parts.valuesIterator.map(_.size.toLong).sum
    val ns = parts.size.toLong
    val nr = parts.valuesIterator.flatMap(_.iterator)
      .map(f => GraftShardCodec.footer(f)._2).sum
    val nd = dv.valuesIterator.map(_.getCardinality.toLong).sum
    val fragPpm = if (ns == 0L) 0L else nf * 1000000L / ns
    val dvPpm = if (nr == 0L) 0L else nd * 1000000L / nr
    // snapshot retention: live version dirs vs the caller's budget
    // (Iceberg's expire_snapshots is the nightly job this advises;
    // tag/branch-pinned versions survive expiry and keep counting)
    val dd = dataDir(root, tbl)
    val latest = GraftLakeIO.latestVersion(dd)
    val retained = (1 to latest)
      .count(v => GraftLakeIO.versionDir(dd, v).exists()).toLong
    val retPpm = retained * 1000000L / budget
    val sortedSet = GraftLakeIO.readSorted(vdir)
    // a table with NO sorted shard never opted into the sorted
    // layout — nothing to restore, not a degradation
    val unsorted = parts.keysIterator
      .count(k => !sortedSet.contains(k)).toLong
    val sortedPpm =
      if (sortedSet.isEmpty || ns == 0L) 0L
      else unsorted * 1000000L / ns
    def sig(target: String, signal: String, m: Long, th: Long,
        act: String): (String, String, Long, Long, String) =
      (target, signal, m, th, if (m > th) act else "ok")
    Seq(
      sig("text_index", "dead_postings", deadPpm, 100000L,
        "rebuild_text_index"),
      sig("text_index", "tombstone_fill", tombPpm, 500000L,
        "rebuild_text_index"),
      sig("ann_index", "quantizer_drift", driftPpm, 1200000L,
        "retrain_ann_index"),
      sig("table", "fragmentation", fragPpm, 1250000L, "optimize"),
      sig("table", "dv_deleted_rows", dvPpm, 50000L, "optimize"),
      sig("table", "snapshot_retention", retPpm, 1000000L,
        "expire_snapshots"),
      sig("table", "sorted_provenance", sortedPpm, 0L,
        "rewrite_sorted")) ++
      // a dangling group-refresh intent (crash between the text and
      // ANN cursor commits) is an actionable signal until the next
      // refresh_indexes CALL heals it; healthy groups add no row
      openIntent(root, tix, aix).toSeq.map(_ =>
        sig("index_group", "open_refresh_intent", 1000000L, 0L,
          "refresh_indexes"))
  }

  private def str(s: String): UTF8String = UTF8String.fromString(s)

  private def proc(pname: String, doc: String,
      params: Seq[ProcedureParameter], out: StructType)(
      body: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = doc
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          // maintenance mutates table state — never cacheable
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val resultRows = body(input).toArray
            java.util.List.of[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = resultRows
              override def readSchema(): StructType = out
              override def description(): String = s"CALL $pname"
            }).iterator()
          }
        }
    }

  def load(root: String, name: String): UnboundProcedure = name match {
    case "optimize" => proc("optimize",
      "deletion-vector compaction + part-count compaction",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("dv_threshold", DoubleType)
          .defaultValue("0.1").build(),
        ProcedureParameter.in("max_parts", IntegerType)
          .defaultValue("4").build()),
      StructType(Seq(
        StructField("phase", StringType, nullable = false),
        StructField("n_shards_compacted", IntegerType,
          nullable = false),
        StructField("shards", StringType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val dv = GraftLakeMaintenance
        .compactDeletionVectors(dir, in.getDouble(1))
      val parts = GraftLakeMaintenance.compactParts(dir, in.getInt(2))
      Seq(
        new GenericInternalRow(Array[Any](str("deletion_vectors"),
          dv.length, str(dv.mkString(",")))),
        new GenericInternalRow(Array[Any](str("part_files"),
          parts.length, str(parts.mkString(",")))))
    }

    case "rewrite_sorted" => proc("rewrite_sorted",
      "sort-rewrite shards by the plain shard key, restoring sorted " +
        "provenance (Iceberg rewrite_data_files strategy => 'sort')",
      Seq(ProcedureParameter.in("table", StringType).build()),
      StructType(Seq(
        StructField("n_shards_rewritten", IntegerType,
          nullable = false),
        StructField("shards", StringType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val done = GraftLakeMaintenance.rewriteSorted(dir)
      Seq(new GenericInternalRow(Array[Any](done.length,
        str(done.mkString(",")))))
    }

    case "expire_snapshots" => proc("expire_snapshots",
      "drop history older than the newest `keep` versions",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("keep", IntegerType)
          .defaultValue("1").build()),
      StructType(Seq(
        StructField("surviving_version", IntegerType,
          nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      GraftLakeIO.expireSnapshots(dir, in.getInt(1))
        .map(v => new GenericInternalRow(Array[Any](v)))
    }

    case "rollback_to_version" => proc("rollback_to_version",
      "restore an earlier snapshot as a NEW commit (history intact)",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("version", IntegerType).build()),
      StructType(Seq(
        StructField("new_head", IntegerType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val head = GraftLakeIO.rollbackToVersion(dir, in.getInt(1))
      Seq(new GenericInternalRow(Array[Any](head)))
    }

    case "vacuum" => proc("vacuum",
      "remove crash debris: stale _build_/_stage_ dirs, orphan versions",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue("600000").build()),
      StructType(Seq(
        StructField("removed", StringType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      GraftLakeIO.vacuumOrphans(dir, in.getLong(1))
        .map(n => new GenericInternalRow(Array[Any](str(n))))
    }

    case "create_tag" => proc("create_tag",
      "pin a named tag to a snapshot (tagged snapshots survive " +
        "expire_snapshots; read back via VERSION AS OF 'tag')",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build(),
        ProcedureParameter.in("version", IntegerType)
          .defaultValue("-1").build()), // -1 = current head
      StructType(Seq(
        StructField("tag", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val tag = in.getUTF8String(1).toString
      val v = in.getInt(2) match {
        case -1 => GraftLakeIO.latestVersion(dir)
        case x => x
      }
      GraftLakeIO.createTag(dir, tag, v)
      Seq(new GenericInternalRow(Array[Any](str(tag), v)))
    }

    case "drop_tag" => proc("drop_tag",
      "drop a named tag (its snapshot becomes expirable again)",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build()),
      StructType(Seq(
        StructField("dropped", BooleanType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val ok = GraftLakeIO.dropTag(dir, in.getUTF8String(1).toString)
      Seq(new GenericInternalRow(Array[Any](ok)))
    }

    case "create_branch" => proc("create_branch",
      "fork a named branch at main's head: writes under " +
        "spark.graft.lake.branch land on the branch, main readers " +
        "keep the published head (write-audit-publish)",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build()),
      StructType(Seq(
        StructField("branch", StringType, nullable = false),
        StructField("base_version", IntegerType, nullable = false)))) {
      in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val b = in.getUTF8String(1).toString
      val base = GraftLakeIO.createBranch(dir, b)
      Seq(new GenericInternalRow(Array[Any](str(b), base)))
    }

    case "drop_branch" => proc("drop_branch",
      "drop a branch and its unpublished commits",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build()),
      StructType(Seq(
        StructField("dropped", BooleanType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val ok = GraftLakeIO.dropBranch(dir,
        in.getUTF8String(1).toString)
      Seq(new GenericInternalRow(Array[Any](ok)))
    }

    case "fast_forward" => proc("fast_forward",
      "publish a branch: fast-forward main to the branch head as one " +
        "squashed commit (CAS — conflicts if main moved since the " +
        "fork), then drop the branch",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build()),
      StructType(Seq(
        StructField("new_head", IntegerType, nullable = false)))) { in =>
      val dir = dataDir(root, in.getUTF8String(0).toString)
      val v = GraftLakeIO.fastForward(dir,
        in.getUTF8String(1).toString)
      Seq(new GenericInternalRow(Array[Any](v)))
    }

    case "build_ann_index" => proc("build_ann_index",
      "train the IVF quantizer + PQ codebooks over a (vec_id, emb) " +
        "lake table and persist centroids, codebooks, cell-sharded " +
        "encoded assignments, and the cursor ([[GraftLakeAnnIndex]])",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("index_table", StringType).build(),
        ProcedureParameter.in("k", IntegerType)
          .defaultValue("8").build(),
        ProcedureParameter.in("iters", IntegerType)
          .defaultValue("3").build(),
        ProcedureParameter.in("pq_m", IntegerType)
          .defaultValue("8").build(),
        ProcedureParameter.in("pq_k", IntegerType)
          .defaultValue("32").build(),
        ProcedureParameter.in("pq_iters", IntegerType)
          .defaultValue("2").build()),
      StructType(Seq(
        StructField("index_table", StringType, nullable = false),
        StructField("centroids", IntegerType, nullable = false),
        StructField("vectors", LongType, nullable = false),
        StructField("source_version", IntegerType,
          nullable = false)))) { in =>
      val ix = in.getUTF8String(1).toString.stripPrefix("lake.")
      val (c, n, v) = GraftLakeAnnIndex.build(root,
        in.getUTF8String(0).toString, ix, in.getInt(2), in.getInt(3),
        in.getInt(4), in.getInt(5), in.getInt(6))
      Seq(new GenericInternalRow(Array[Any](str(ix), c, n, v)))
    }

    case "refresh_ann_index" => proc("refresh_ann_index",
      "advance an ANN index from its source's $changes feed — " +
        "O(delta): removed rows MERGE out, new rows assign to their " +
        "nearest existing centroid and append",
      Seq(
        ProcedureParameter.in("index_table", StringType).build()),
      StructType(Seq(
        StructField("from_version", LongType, nullable = false),
        StructField("to_version", LongType, nullable = false),
        StructField("rows_added", LongType, nullable = false),
        StructField("rows_removed", LongType, nullable = false)))) { in =>
      val (f, t, a, r) = GraftLakeAnnIndex.refresh(root,
        in.getUTF8String(0).toString.stripPrefix("lake."))
      Seq(new GenericInternalRow(Array[Any](f, t, a, r)))
    }

    case "retrain_ann_index" => proc("retrain_ann_index",
      "rebuild the IVF quantizer + PQ codebooks over the source's " +
        "CURRENT snapshot and reassign everything — the lifecycle " +
        "answer to quantizer staleness; k defaults to the index's " +
        "own, pq shape comes from the persisted codebooks",
      Seq(
        ProcedureParameter.in("index_table", StringType).build(),
        ProcedureParameter.in("k", IntegerType)
          .defaultValue("-1").build(), // -1 = keep the index's k
        ProcedureParameter.in("iters", IntegerType)
          .defaultValue("3").build(),
        ProcedureParameter.in("pq_iters", IntegerType)
          .defaultValue("2").build()),
      StructType(Seq(
        StructField("index_table", StringType, nullable = false),
        StructField("centroids", IntegerType, nullable = false),
        StructField("vectors", LongType, nullable = false),
        StructField("source_version", IntegerType,
          nullable = false)))) { in =>
      val ix = in.getUTF8String(0).toString.stripPrefix("lake.")
      val (c, n, v) = GraftLakeAnnIndex.retrain(root, ix,
        in.getInt(1), in.getInt(2), in.getInt(3))
      Seq(new GenericInternalRow(Array[Any](str(ix), c, n, v)))
    }

    case "build_text_index" => proc("build_text_index",
      "tokenize a (doc_id, text) lake table at its current snapshot " +
        "and persist the inverted index: term-hash-sharded postings, " +
        "doc lengths, tombstones, cursor ([[GraftLakeTextIndex]])",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("index_table", StringType).build()),
      StructType(Seq(
        StructField("index_table", StringType, nullable = false),
        StructField("postings", LongType, nullable = false),
        StructField("docs", LongType, nullable = false),
        StructField("source_version", IntegerType,
          nullable = false)))) { in =>
      val ix = in.getUTF8String(1).toString.stripPrefix("lake.")
      val (p, d, v) = GraftLakeTextIndex.build(root,
        in.getUTF8String(0).toString, ix)
      Seq(new GenericInternalRow(Array[Any](str(ix), p, d, v)))
    }

    case "refresh_text_index" => proc("refresh_text_index",
      "advance a text index from its source's $changes feed — " +
        "O(delta): deleted docs append one tombstone row each " +
        "(probe-time anti-mask, the Lucene live-docs model), new " +
        "docs tokenize and append postings + length rows",
      Seq(
        ProcedureParameter.in("index_table", StringType).build()),
      StructType(Seq(
        StructField("from_version", LongType, nullable = false),
        StructField("to_version", LongType, nullable = false),
        StructField("postings_added", LongType, nullable = false),
        StructField("docs_tombstoned", LongType,
          nullable = false)))) { in =>
      val (f, t, a, r) = GraftLakeTextIndex.refresh(root,
        in.getUTF8String(0).toString.stripPrefix("lake."))
      Seq(new GenericInternalRow(Array[Any](f, t, a, r)))
    }

    case "text_index_stats" => proc("text_index_stats",
      "text-index health: live vs tombstone-masked postings — " +
        "dead/live is the rebuild trigger (Lucene's deleted-docs " +
        "percentage, the ANN drift-ratio analog)",
      Seq(
        ProcedureParameter.in("index_table", StringType).build()),
      StructType(Seq(
        StructField("live_postings", LongType, nullable = false),
        StructField("dead_postings", LongType, nullable = false),
        StructField("live_docs", LongType, nullable = false),
        StructField("docs_tombstoned", LongType,
          nullable = false)))) { in =>
      val (lp, dp, ld, dt) = GraftLakeTextIndex.stats(root,
        in.getUTF8String(0).toString.stripPrefix("lake."))
      Seq(new GenericInternalRow(Array[Any](lp, dp, ld, dt)))
    }

    case "refresh_indexes" => proc("refresh_indexes",
      "snapshot-consistent refresh of a table's INDEX GROUP: pin the " +
        "source's current version ONCE, then advance its text AND " +
        "ANN cursors to exactly that version — hybrid retrieval over " +
        "the pair serves one source snapshot even under concurrent " +
        "writers (independently-refreshed indexes cannot promise " +
        "that: a commit can land between the two refreshes)",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("text_index", StringType).build(),
        ProcedureParameter.in("ann_index", StringType).build()),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("text_postings_added", LongType, nullable = false),
        StructField("text_docs_tombstoned", LongType,
          nullable = false),
        StructField("ann_rows_added", LongType, nullable = false),
        StructField("ann_rows_removed", LongType,
          nullable = false)))) { in =>
      val tbl = in.getUTF8String(0).toString.stripPrefix("lake.")
      val tix = in.getUTF8String(1).toString.stripPrefix("lake.")
      val aix = in.getUTF8String(2).toString.stripPrefix("lake.")
      val s = org.apache.spark.sql.SparkSession.active
      def srcOf(metaTbl: String): String = s.sql(
        s"""SELECT source FROM graft_lake.lake.$metaTbl
            ORDER BY last_version DESC LIMIT 1""").head().getString(0)
      require(srcOf(s"${tix}_meta") == tbl,
        s"text index $tix does not source $tbl")
      require(srcOf(s"${aix}_meta") == tbl,
        s"ann index $aix does not source $tbl")
      // ANN preconditions FIRST (meta readability, drift baseline):
      // the two cursor advances are separate CAS commits, so a doomed
      // ANN side must fail the verb BEFORE the text cursor moves —
      // both advance or neither does. A crash BETWEEN the commits
      // leaves the write-ahead INTENT below on disk: this CALL (any
      // retry, on any driver) self-heals by re-pinning ≥ the crashed
      // pin and advancing both — idempotent cursors make the replay
      // safe — and clears the intent only after both cursors land.
      // LakeTextIndexSpec pins the crash simulation end-to-end.
      GraftLakeAnnIndex.validateRefreshPreconditions(aix)
      openIntent(root, tix, aix).foreach { case (it, iv) =>
        require(it == tbl,
          s"open refresh intent for $tix/$aix names source '$it', " +
            s"not '$tbl' — refusing to heal across sources")
      }
      // the ONE version stamp both refreshes advance to
      val v = GraftLakeIO.latestVersion(dataDir(root, tbl)).toLong
      writeIntent(root, tix, aix, tbl, v)
      val (_, tTo, ta, tr) = GraftLakeTextIndex.refresh(root, tix, v)
      val (_, aTo, aa, ar) = GraftLakeAnnIndex.refresh(root, aix, v)
      require(tTo == v && aTo == v,
        s"cursor desync: text at v$tTo, ann at v$aTo, pinned v$v")
      clearIntent(root, tix, aix)
      Seq(new GenericInternalRow(Array[Any](v, ta, tr, aa, ar)))
    }

    case "maintenance_plan" => proc("maintenance_plan",
      "the nightly ops brain: every persisted health metric the lake " +
        "already tracks — text-index dead-posting fraction + " +
        "tombstone fill vs the broadcast cap, ANN quantizer drift, " +
        "part-file fragmentation, deletion-vector dead-row fraction, " +
        "snapshot retention vs the snapshot_budget (CALL arg, " +
        "default 4; a real deployment tunes retention per table), " +
        "sorted-provenance coverage — unified into ONE deterministic " +
        "integer-ppm report with a recommendation per signal " +
        "(rebuild_text_index / retrain_ann_index / optimize / " +
        "expire_snapshots / rewrite_sorted, or 'ok'). Read-only: " +
        "executing the recommended CALLs clears them (spec-pinned)",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("text_index", StringType).build(),
        ProcedureParameter.in("ann_index", StringType).build(),
        ProcedureParameter.in("snapshot_budget", IntegerType)
          .defaultValue("4").build()),
      StructType(Seq(
        StructField("target", StringType, nullable = false),
        StructField("signal", StringType, nullable = false),
        StructField("metric_ppm", LongType, nullable = false),
        StructField("threshold_ppm", LongType, nullable = false),
        StructField("action", StringType, nullable = false)))) { in =>
      val s = org.apache.spark.sql.SparkSession.active
      val tbl = in.getUTF8String(0).toString.stripPrefix("lake.")
      val tix = in.getUTF8String(1).toString.stripPrefix("lake.")
      val aix = in.getUTF8String(2).toString.stripPrefix("lake.")
      planSignals(s, root, tbl, tix, aix, in.getInt(3)).map {
        case (t, sig, m, th, act) =>
          new GenericInternalRow(Array[Any](str(t), str(sig), m, th,
            str(act)))
      }
    }

    case "maintenance_run" => proc("maintenance_run",
      "the nightly job itself: run maintenance_plan, EXECUTE every " +
        "recommended verb in dependency-safe order (heal an open " +
        "refresh intent first; rebuild/retrain the indexes; optimize " +
        "BEFORE rewrite_sorted so compaction cannot unsort a fresh " +
        "rewrite; expire_snapshots LAST because every other verb " +
        "commits new versions), then re-measure — one row per signal " +
        "with before/after ppm and the verb executed ('none' if the " +
        "signal was healthy). Idempotent: a second run finds every " +
        "metric under threshold and executes nothing (spec-pinned)",
      Seq(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("text_index", StringType).build(),
        ProcedureParameter.in("ann_index", StringType).build(),
        ProcedureParameter.in("snapshot_budget", IntegerType)
          .defaultValue("4").build()),
      StructType(Seq(
        StructField("target", StringType, nullable = false),
        StructField("signal", StringType, nullable = false),
        StructField("before_ppm", LongType, nullable = false),
        StructField("after_ppm", LongType, nullable = false),
        StructField("action", StringType, nullable = false)))) { in =>
      val s = org.apache.spark.sql.SparkSession.active
      val tbl = in.getUTF8String(0).toString.stripPrefix("lake.")
      val tix = in.getUTF8String(1).toString.stripPrefix("lake.")
      val aix = in.getUTF8String(2).toString.stripPrefix("lake.")
      val budget = in.getInt(3)
      val before = planSignals(s, root, tbl, tix, aix, budget)
      val actions = before.map(_._5).filter(_ != "ok").toSet
      def srcOf(metaTbl: String): String = s.sql(
        s"""SELECT source FROM graft_lake.lake.$metaTbl
            ORDER BY last_version DESC LIMIT 1""").head().getString(0)
      if (actions("refresh_indexes"))
        s.sql(s"""CALL graft_lake.system.refresh_indexes(
          table => '${srcOf(s"${tix}_meta")}', text_index => '$tix',
          ann_index => '$aix')""")
      if (actions("rebuild_text_index"))
        s.sql(s"""CALL graft_lake.system.build_text_index(
          table => '${srcOf(s"${tix}_meta")}',
          index_table => '$tix')""")
      if (actions("retrain_ann_index"))
        s.sql(s"""CALL graft_lake.system.retrain_ann_index(
          index_table => '$aix')""")
      if (actions("optimize"))
        s.sql(s"""CALL graft_lake.system.optimize(
          table => '$tbl', dv_threshold => 0.0, max_parts => 1)""")
      if (actions("rewrite_sorted"))
        s.sql(s"""CALL graft_lake.system.rewrite_sorted(
          table => '$tbl')""")
      if (actions("expire_snapshots"))
        s.sql(s"""CALL graft_lake.system.expire_snapshots(
          table => '$tbl', keep => $budget)""")
      val after = planSignals(s, root, tbl, tix, aix, budget)
        .map(x => (x._1, x._2) -> x._3).toMap
      before.map { case (t, sig, m, _, act) =>
        new GenericInternalRow(Array[Any](str(t), str(sig), m,
          after.getOrElse((t, sig), 0L),
          str(if (act == "ok") "none" else act)))
      }
    }

    case "ann_index_drift" => proc("ann_index_drift",
      "quantizer staleness: live mean squared distance-to-assigned-" +
        "centroid vs the build-time fit recorded in the cursor; " +
        "ratio >> 1 means the distribution moved — retrain",
      Seq(
        ProcedureParameter.in("index_table", StringType).build()),
      StructType(Seq(
        StructField("build_mean_d2", DoubleType, nullable = false),
        StructField("live_mean_d2", DoubleType, nullable = false),
        StructField("drift_ratio", DoubleType, nullable = false)))) {
      in =>
      val (b, l, r) = GraftLakeAnnIndex.drift(root,
        in.getUTF8String(0).toString.stripPrefix("lake."))
      Seq(new GenericInternalRow(Array[Any](b, l, r)))
    }

    case other => throw new IllegalArgumentException(
      s"no such procedure: system.$other (have: " +
        s"${Names.mkString(", ")})")
  }
}
