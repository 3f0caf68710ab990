package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions,
  NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import org.roaringbitmap.RoaringBitmap

/** MERGE-ON-READ `DELETE` — deletion vectors through Spark's DELTA
  * row-level-operation stack (`SupportsDelta`), the Iceberg v3 /
  * Delta deletion-vector design (reference scope: Trino-on-Iceberg
  * serves `DELETE` as position deletes when the table's
  * `write.delete.mode` is merge-on-read).
  *
  * Why this exists at 100 TB: the group-based path
  * ([[GraftLakeRowLevelOperation]]) rewrites every shard that holds a
  * matching row — deleting 0.1% of rows from a shard rewrites all of
  * it. Here Spark's `RewriteDeleteFromTable` plans a `WriteDelta`
  * instead: the target scan emits each matching row's ROW ID — the
  * `(_shard, _pos)` metadata pair, where `_pos` is the row's ordinal
  * in its shard's parquet file — and the commit records those
  * positions in per-shard roaring bitmaps (`_dv.json`,
  * [[GraftLakeIO.writeDv]]) while HARDLINK-carrying every data file
  * untouched. Readers mask the positions at scan time
  * ([[GraftLakePartitionReader]]), so queries, time travel, CDC
  * diffs, statistics, and DESCRIBE HISTORY all see live rows only.
  * A later rewrite of a shard (UPDATE/MERGE/OVERWRITE/recluster)
  * compacts its deletes away and clears the entry
  * ([[GraftLakeCommitter]]).
  *
  * Commit safety: positions are computed against the operation's
  * pinned snapshot, so the commit validates — per touched shard —
  * that the current head still carries the SAME file (hardlink
  * identity) before publishing; any concurrent rewrite of a touched
  * shard raises [[GraftLakeCommitConflict]] instead of deleting the
  * wrong rows (Iceberg's position-delete conflict rule). Concurrent
  * APPENDS to a touched shard produce a new merged file and likewise
  * conflict — strictness over cleverness; the loser re-runs its
  * DELETE against the new head. */
class GraftLakeDeltaDeleteOperation(table: GraftLakeTable,
    dataDir: String, info: RowLevelOperationInfo)
    extends RowLevelOperation with SupportsDelta {

  /** Snapshot isolation for the whole operation (scan + commit
    * validation), like the group-based op. */
  private[sources] val snapshotV = GraftLakeIO.latestVersion(dataDir)

  override def command(): RowLevelOperation.Command = info.command()

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLakeScanBuilder(table.schema(), dataDir, Some(snapshotV),
      None, table.shardKey)

  /** The row id IS the physical position: shard file + ordinal. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_shard"), Expressions.column("_pos"))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  override def newWriteBuilder(
      info: LogicalWriteInfo): DeltaWriteBuilder = {
    val li = info
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new GraftLakeDvBatchWrite(dataDir, snapshotV, li)
      }
    }
  }

  override def description(): String =
    s"GraftLakeDeltaDeleteOperation(${table.name()}, " +
      s"snapshot=v$snapshotV, merge-on-read)"
}

/** One task's position deletes: shard -> serialized roaring bitmap. */
case class GraftLakeDvCommit(dvs: Map[Int, Array[Byte]])
    extends WriterCommitMessage

case class GraftLakeDvWriterFactory(shardIdx: Int, posIdx: Int)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftLakeDvWriter(shardIdx, posIdx)
}

/** Accumulates deleted positions per shard — O(live bitmap) memory,
  * no row payloads ever buffered or shuffled. */
class GraftLakeDvWriter(shardIdx: Int, posIdx: Int)
    extends DeltaWriter[InternalRow] {
  private val dvs = scala.collection.mutable.Map[Int, RoaringBitmap]()

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val shard = id.getInt(shardIdx)
    val pos = id.getLong(posIdx)
    require(pos >= 0L && pos <= Int.MaxValue.toLong,
      s"deletion-vector position $pos out of the 32-bit bitmap range")
    dvs.getOrElseUpdate(shard, new RoaringBitmap()).add(pos.toInt)
  }

  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "merge-on-read delta write handles DELETE only")

  override def insert(row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "merge-on-read delta write handles DELETE only")

  override def commit(): WriterCommitMessage =
    GraftLakeDvCommit(dvs.view.mapValues { bm =>
      bm.runOptimize()
      val buf = new Array[Byte](bm.serializedSizeInBytes())
      bm.serialize(java.nio.ByteBuffer.wrap(buf))
      buf
    }.toMap)

  override def abort(): Unit = ()
  override def close(): Unit = ()
}

class GraftLakeDvBatchWrite(dataDir: String, snapshotV: Int,
    info: LogicalWriteInfo) extends DeltaBatchWrite {

  override def createBatchWriterFactory(
      physical: PhysicalWriteInfo): DeltaWriterFactory = {
    // field positions of the row id columns as Spark will deliver
    // them (rowIdSchema when present; the declared order otherwise)
    val idSchema: StructType = {
      val opt = info.rowIdSchema()
      if (opt.isPresent) opt.get()
      else StructType(Seq(
        org.apache.spark.sql.types.StructField("_shard",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_pos",
          org.apache.spark.sql.types.LongType)))
    }
    GraftLakeDvWriterFactory(idSchema.fieldIndex("_shard"),
      idSchema.fieldIndex("_pos"))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newDeletes = scala.collection.mutable.Map[Int, RoaringBitmap]()
    messages.foreach {
      case GraftLakeDvCommit(dvs) => dvs.foreach { case (k, bytes) =>
        val bm = new RoaringBitmap()
        bm.deserialize(java.nio.ByteBuffer.wrap(bytes))
        newDeletes.get(k) match {
          case Some(acc) => acc.or(bm)
          case None => newDeletes.update(k, bm)
        }
      }
      case other => throw new IllegalStateException(
        s"unexpected commit message $other")
    }
    if (newDeletes.isEmpty) return // DELETE matched nothing: no commit
    val snapDir = GraftLakeIO.versionDir(dataDir, snapshotV)
    var attempts = 0
    while (true) {
      val headV = GraftLakeIO.latestVersion(dataDir)
      val headDir = GraftLakeIO.versionDir(dataDir, headV)
      // position validity: a touched shard's head file must still BE
      // the snapshot's file (hardlink identity) — a concurrent
      // rewrite/append produced a different file and the recorded
      // ordinals may name the wrong rows there
      newDeletes.keys.foreach { k =>
        val snap = GraftLakeIO.shardFile(snapDir, k)
        val head = GraftLakeIO.shardFile(headDir, k)
        if (!snap.exists() || !head.exists() ||
          !java.nio.file.Files.isSameFile(snap.toPath, head.toPath))
          throw new GraftLakeCommitConflict(
            s"$dataDir: shard $k changed between snapshot " +
              s"v$snapshotV and head v$headV — the position deletes " +
              "no longer bind; re-run the DELETE against the new head")
      }
      val build = GraftLakeIO.newBuildDir(dataDir)
      try {
        // hardlink-carry EVERY head file: data shards untouched,
        // stats/routing/txn sidecars verbatim (zone maps become
        // over-approximate for DV'd shards — may fail to skip, never
        // wrong). Only _dv.json and _commit are written fresh.
        Option(headDir.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && f.getName != "_commit" &&
            f.getName != GraftLakeIO.dvFile(headDir).getName)
          .foreach { f =>
            val dst = new java.io.File(build, f.getName)
            try java.nio.file.Files.createLink(dst.toPath, f.toPath): Unit
            catch {
              case _: UnsupportedOperationException |
                  _: java.io.IOException =>
                java.nio.file.Files.copy(f.toPath, dst.toPath): Unit
            }
          }
        // merged vectors: the head's surviving deletes UNION this
        // operation's — commutative, so two DELETEs racing on
        // DISJOINT shards both land (the validation above only
        // conflicts on same-shard file changes)
        val merged = GraftLakeIO.readDv(headDir).foldLeft(
          newDeletes.toMap) { case (acc, (k, bm)) =>
          acc.get(k) match {
            case Some(mine) =>
              val u = mine.clone()
              u.or(bm)
              acc.updated(k, u)
            case None => acc.updated(k, bm)
          }
        }
        GraftLakeIO.writeDv(build, merged)
        GraftLakeIO.writeCommitMeta(build,
          GraftLakeIO.nextCommitStamp(dataDir, headV), "delete")
        GraftLakeIO.commitVersion(dataDir, headV, build): Unit
        return
      } catch {
        case _: GraftLakeCommitConflict if attempts < 5 =>
          // commitVersion cleans the build on CAS loss; revalidate
          // against the new head and retry
          attempts += 1
        case e: Throwable =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(): Unit
          }
          if (build.exists()) rm(build)
          throw e
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
