package graft.sources

import org.apache.spark.sql.types._

import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter,
  GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter,
  ParquetReader, ParquetWriter}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.io.{LocalInputFile, LocalOutputFile}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType,
  Types}

/** COLUMNAR shard payloads for the lake catalog: each
  * `v<N>/shard-K.parquet` is a real parquet file written and read
  * executor-side through the public parquet-hadoop Group API — no
  * Spark job, no Hadoop FileSystem (`LocalInputFile`/`LocalOutputFile`,
  * so no `.crc` sidecar noise in version dirs), no full-text parse.
  *
  * Why this matters at 100 TB (the reference ingests into real
  * engine storage — `fill_postgresql.sql:1-10`'s tables are heap
  * pages, not text): the previous JSON-lines payload forced a full
  * parse of every byte of every row on every read. Parquet gives
  *
  *  - COLUMN PRUNING: a pruned scan decodes only the requested
  *    columns' pages ([[projectionFor]] intersects the request with
  *    the file footer's schema, so schema-evolved old shards serve
  *    missing columns as NULL without decoding anything extra);
  *  - COUNT FROM METADATA: a projection-empty read (`count(*)`, or a
  *    `_shard`-only probe) is served from footer row counts without
  *    touching a single data page ([[rowCount]]);
  *  - ENCODED + COMPRESSED pages (dictionary + snappy) instead of
  *    decimal-rendered text;
  *  - APPEND WITHOUT RE-ENCODE: commit-time shard merging copies raw
  *    row groups ([[ParquetFileWriter.appendFile]]) when schemas
  *    match — I/O-bound byte movement, the same cost class as the old
  *    text concatenation — and falls back to a Group-level re-encode
  *    only for schema-evolved bases ([[mergeShardFiles]]).
  *
  * The commit protocol above this layer (CAS publish, hardlink
  * carrying, zone-map sidecars, routing provenance) is
  * format-agnostic and unchanged; `Files.isSameFile` hardlink
  * identity keeps proving unchanged shards diff-free for `$changes`
  * without opening them.
  *
  * Types are the lake's declared SQL surface (BIGINT, INT, DATE,
  * DOUBLE, STRING) mapped to canonical parquet physical+logical
  * types, so external tools could read the shards as ordinary
  * parquet. */
object GraftShardCodec {

  /** Canonical parquet schema of a shard file: every declared column
    * except the `_shard` metadata column (physical routing is carried
    * by the FILE NAME, never stored). All fields optional — the lake
    * surface is nullable throughout. */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.iterator.filter(_.name != "_shard").foreach { f =>
      f.dataType match {
        case LongType =>
          b.addField(Types.optional(PrimitiveTypeName.INT64)
            .named(f.name)): Unit
        case IntegerType =>
          b.addField(Types.optional(PrimitiveTypeName.INT32)
            .named(f.name)): Unit
        case DateType =>
          b.addField(Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()).named(f.name)): Unit
        case DoubleType =>
          b.addField(Types.optional(PrimitiveTypeName.DOUBLE)
            .named(f.name)): Unit
        case StringType =>
          b.addField(Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name)): Unit
        case TimestampType =>
          b.addField(Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS))
            .named(f.name)): Unit
        case BooleanType =>
          b.addField(Types.optional(PrimitiveTypeName.BOOLEAN)
            .named(f.name)): Unit
        case other => throw new IllegalArgumentException(
          s"unsupported lake type for ${f.name}: $other")
      }
    }
    b.named("graft_lake_shard")
  }

  /** Row-group target kept small relative to parquet's 128 MB default:
    * a data writer holds one open ParquetWriter PER SHARD it routes
    * rows to, and each buffers up to a row group — 16 MB bounds task
    * memory at (shards touched × 16 MB). A production deployment
    * would additionally request a task-level clustering on the shard
    * key (DSv2 RequiresDistributionAndOrdering) so each task touches
    * few shards; at the demo scale the bound alone is plenty. */
  val RowGroupBytes: Long = 16L * 1024 * 1024

  def openWriter(file: java.io.File,
      schema: MessageType): ParquetWriter[Group] =
    ExampleParquetWriter.builder(new LocalOutputFile(file.toPath))
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withRowGroupSize(RowGroupBytes)
      .build()

  def groupFactory(schema: MessageType): SimpleGroupFactory =
    new SimpleGroupFactory(schema)

  /** Published shard parts are IMMUTABLE (commits only ever hardlink
    * or create files), so footer metadata is memoized on the file's
    * identity — (fileKey = device+inode, size, mtime) — across paths,
    * versions, and queries. Without this, every commit's live-row
    * stamp and every scan's statistics estimate would re-open O(total
    * parts) footers: measured super-linear append-commit cost as
    * parts accumulate (BenchDml). Bounded LRU; hardlinked copies of
    * one part share the entry (same inode). The mtime term guards the
    * rare inode-reuse-after-delete case. */
  private val footerMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Object, Long, Long),
      (MessageType, Long)](256, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Object, Long, Long),
            (MessageType, Long)]): Boolean = size() > 8192
    })

  private def identityKey(file: java.io.File): (Object, Long, Long) = {
    val a = java.nio.file.Files.readAttributes(file.toPath,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    (a.fileKey(), a.size(), a.lastModifiedTime().toMillis)
  }

  /** Footer-only metadata of a shard file: (schema, total row count).
    * At most one small tail read per immutable part — memoized on
    * file identity, never touches data pages. */
  def footer(file: java.io.File): (MessageType, Long) = {
    val key = identityKey(file)
    val hit = footerMemo.get(key)
    if (hit != null) return hit
    val r = ParquetFileReader.open(new LocalInputFile(file.toPath))
    try {
      val md = r.getFooter
      val n = md.getBlocks.stream().mapToLong(_.getRowCount).sum()
      val v = (md.getFileMetaData.getSchema, n)
      footerMemo.put(key, v): Unit
      v
    } finally r.close()
  }

  /** Footer-only metadata PLUS per-column null counts summed across
    * row groups: (schema, total rows, column name -> Some(nulls) when
    * every chunk of that column carries a null count in its
    * statistics, None otherwise). parquet-mr stamps chunk statistics
    * (min/max/nulls) at write time, so `None` only appears for files
    * produced by stats-suppressing writers — callers must then fall
    * back to reading pages. One small tail read, no data pages. */
  def footerWithNulls(file: java.io.File)
      : (MessageType, Long, Map[String, Option[Long]]) = {
    val r = ParquetFileReader.open(new LocalInputFile(file.toPath))
    try {
      val md = r.getFooter
      val schema = md.getFileMetaData.getSchema
      var rows = 0L
      val nulls = scala.collection.mutable.Map[String, Option[Long]]()
      md.getBlocks.forEach { b =>
        rows += b.getRowCount
        b.getColumns.forEach { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          val chunk =
            if (st != null && st.isNumNullsSet) Some(st.getNumNulls)
            else None
          nulls.update(name, (nulls.getOrElse(name, Some(0L)), chunk)
            match {
              case (Some(a), Some(b2)) => Some(a + b2)
              case _ => None
            })
        }
      }
      (schema, rows, nulls.toMap)
    } finally r.close()
  }

  private val rangesMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Object, Long, Long),
      (Map[String, GraftLakeIO.ColRange], Set[String])](256, 0.75f,
      /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Object, Long, Long),
            (Map[String, GraftLakeIO.ColRange], Set[String])])
          : Boolean = size() > 8192
    })

  /** PER-PART zone ranges from the parquet footer's OWN column-chunk
    * statistics (parquet-mr stamps min/max/nulls at write time):
    * `(column -> merged range across row groups, columns that are
    * ALL-NULL in this file)`. The shard-level `_stats.json` merges
    * every part's values, so an append-heavy shard's ranges go wide;
    * these per-part ranges are what lets a scan skip the COLD PARTS
    * of a planned shard (a time-correlated append stream leaves each
    * part covering a narrow ts band). Memoized on file identity like
    * [[footer]] — one small tail read per immutable part, ever.
    *
    * Conservatism ledger (a part skip must never lose rows):
    *  - a column is in the map ONLY when every row group's chunk has
    *    usable stats — any statless/foreign chunk drops it (never
    *    skip);
    *  - DOUBLE/FLOAT never enter (parquet writers' NaN-in-stats
    *    behavior is not uniformly trustworthy — same refusal as the
    *    shard zone maps' NaN discipline);
    *  - string min/max past [[GraftLakeIO.ColRange.MaxStatsStringLen]]
    *    drop the column (mirror the sidecar's exactly-or-nothing
    *    rule);
    *  - all-NULL columns are reported separately: a null-rejecting
    *    conjunct on one proves the part row-free for that scan. */
  def footerRanges(file: java.io.File)
      : (Map[String, GraftLakeIO.ColRange], Set[String]) = {
    val key = identityKey(file)
    val hit = rangesMemo.get(key)
    if (hit != null) return hit
    val r = ParquetFileReader.open(new LocalInputFile(file.toPath))
    try {
      // per column: (unusable, merged range or null, any non-null
      // chunk seen)
      val acc = scala.collection.mutable.LinkedHashMap[String,
        (Boolean, GraftLakeIO.ColRange, Boolean)]()
      r.getFooter.getBlocks.forEach { b =>
        b.getColumns.forEach { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          val prev = acc.getOrElse(name, (false, null, false))
          val next =
            if (prev._1 || st == null) (true, null, false)
            else if (st.hasNonNullValue) {
              val tn = c.getPrimitiveType.getPrimitiveTypeName
              val isStr = c.getPrimitiveType
                .getLogicalTypeAnnotation != null &&
                c.getPrimitiveType.getLogicalTypeAnnotation.toString
                  .toLowerCase(java.util.Locale.ROOT)
                  .startsWith("string")
              val chunk: GraftLakeIO.ColRange = tn match {
                case org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.INT64 =>
                  val lo = st.genericGetMin
                    .asInstanceOf[java.lang.Long].longValue()
                  val hi = st.genericGetMax
                    .asInstanceOf[java.lang.Long].longValue()
                  GraftLakeIO.ColRange(isFloat = false, lo, hi,
                    lo.toDouble, hi.toDouble)
                case org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.INT32 =>
                  val lo = st.genericGetMin
                    .asInstanceOf[java.lang.Integer].longValue()
                  val hi = st.genericGetMax
                    .asInstanceOf[java.lang.Integer].longValue()
                  GraftLakeIO.ColRange(isFloat = false, lo, hi,
                    lo.toDouble, hi.toDouble)
                case org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.BINARY if isStr =>
                  GraftLakeIO.ColRange.ofString(st.genericGetMin
                      .asInstanceOf[org.apache.parquet.io.api.Binary]
                      .toStringUsingUTF8)
                    .merge(GraftLakeIO.ColRange.ofString(st
                      .genericGetMax
                      .asInstanceOf[org.apache.parquet.io.api.Binary]
                      .toStringUsingUTF8))
                case _ => null // DOUBLE/FLOAT/other: never skip
              }
              if (chunk == null || GraftLakeIO.rangeUnusable(chunk))
                (true, null, false)
              else (false,
                if (prev._2 == null) chunk else prev._2.merge(chunk),
                true)
            } else if (st.isNumNullsSet &&
              st.getNumNulls == b.getRowCount)
              prev // all-null chunk: contributes nothing, stays sound
            else (true, null, false)
          acc.update(name, next)
        }
      }
      val ranges = acc.collect {
        case (n, (false, rg, true)) if rg != null &&
          !GraftLakeIO.rangeUnusable(rg) => n -> rg
      }.toMap
      val allNull = acc.collect {
        case (n, (false, null, false)) => n
      }.toSet
      val v = (ranges, allNull)
      rangesMemo.put(key, v): Unit
      v
    } finally r.close()
  }

  /** The projection actually readable from `file`: the requested
    * column names that exist in the file's own schema, carrying the
    * FILE's field types (strict projection checking requires it).
    * Names absent from the file (columns ADDed after the shard was
    * written) are the caller's to serve as NULL. Field order follows
    * `names`. */
  def projectionFor(fileSchema: MessageType,
      names: Seq[String]): MessageType = {
    val present = names.filter(fileSchema.containsField)
    val b = Types.buildMessage()
    present.foreach(n =>
      b.addField(fileSchema.getType(fileSchema.getFieldIndex(n))): Unit)
    b.named(fileSchema.getName)
  }

  def openReader(file: java.io.File,
      projection: MessageType): ParquetReader[Group] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport
      .PARQUET_READ_SCHEMA, projection.toString)
    ParquetReader
      .builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(file.getPath))
      .withConf(conf)
      .build()
  }

  /** One field of a Group as the JVM value the lake's InternalRows
    * carry (java.lang boxes + UTF8String); null when unset. `idx` is
    * the field's position in the READ projection. */
  def value(g: Group, idx: Int, dt: DataType): Any = {
    if (g.getFieldRepetitionCount(idx) == 0) return null
    dt match {
      case LongType | TimestampType => g.getLong(idx, 0)
      case IntegerType | DateType => g.getInteger(idx, 0)
      case DoubleType => g.getDouble(idx, 0)
      case StringType => org.apache.spark.unsafe.types.UTF8String
        .fromBytes(g.getBinary(idx, 0).getBytes)
      case BooleanType => g.getBoolean(idx, 0)
      case other => throw new IllegalArgumentException(
        s"unsupported lake type: $other")
    }
  }

  /** One field of a Group decoded by the FILE's own primitive type —
    * for callers (the equality-delete key mask) that address a column
    * without carrying its declared Spark type. Strings come back as
    * java.lang.String (not UTF8String — key encoding wants the
    * canonical form anyway). */
  def rawValue(g: Group, idx: Int): Any = {
    if (g.getFieldRepetitionCount(idx) == 0) return null
    g.getType.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
      case PrimitiveTypeName.INT64 =>
        java.lang.Long.valueOf(g.getLong(idx, 0))
      case PrimitiveTypeName.INT32 =>
        java.lang.Integer.valueOf(g.getInteger(idx, 0))
      case PrimitiveTypeName.BINARY =>
        g.getBinary(idx, 0).toStringUsingUTF8
      case PrimitiveTypeName.DOUBLE =>
        java.lang.Double.valueOf(g.getDouble(idx, 0))
      case PrimitiveTypeName.BOOLEAN =>
        java.lang.Boolean.valueOf(g.getBoolean(idx, 0))
      case other => throw new IllegalArgumentException(
        s"unsupported raw column type: $other")
    }
  }

  /** Append one JVM value (the same representation [[value]] reads)
    * to a group under `name`; nulls are simply not added. */
  def add(g: Group, name: String, v: Any): Unit = v match {
    case null => ()
    case l: java.lang.Long => g.add(name, l.longValue())
    case i: java.lang.Integer => g.add(name, i.intValue())
    case d: java.lang.Double => g.add(name, d.doubleValue())
    case s: org.apache.spark.unsafe.types.UTF8String =>
      g.add(name, Binary.fromConstantByteArray(s.getBytes))
    case b: java.lang.Boolean => g.add(name, b.booleanValue())
    case other => throw new IllegalArgumentException(
      s"unsupported lake value $other (${other.getClass})")
  }

  /** Read a whole shard file into JVM-typed rows laid out as
    * `schema` (missing columns NULL) — the $changes differ and spec
    * helpers use this; scans stream instead. */
  def readRows(file: java.io.File,
      schema: StructType): Iterator[Array[Any]] =
    readRowsCloseable(file, schema)._1

  /** [[readRows]] plus the underlying reader handle, for callers that
    * may stop consuming early (a LIMITed scan) and must still release
    * the file. The iterator also self-closes on exhaustion; closing
    * twice is safe. */
  def readRowsCloseable(file: java.io.File,
      schema: StructType): (Iterator[Array[Any]], AutoCloseable) = {
    val names = schema.fields.iterator.map(_.name).toSeq
    val (fileSchema, _) = footer(file)
    val proj = projectionFor(fileSchema, names)
    val projIdx: Array[Int] = schema.fields.map(f =>
      if (proj.containsField(f.name)) proj.getFieldIndex(f.name)
      else -1)
    val reader = openReader(file, proj)
    var closed = false
    val closer = new AutoCloseable {
      override def close(): Unit =
        if (!closed) { closed = true; reader.close() }
    }
    val it = new Iterator[Array[Any]] {
      private var g: Group = reader.read()
      override def hasNext: Boolean = {
        if (g == null) closer.close()
        g != null
      }
      override def next(): Array[Any] = {
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          vals(i) =
            if (projIdx(i) < 0) null
            else value(g, projIdx(i), schema(i).dataType)
          i += 1
        }
        g = reader.read()
        vals
      }
    }
    (it, closer)
  }

  /** Materialize `target` as the concatenation of `sources` (in
    * order) under `targetSchema`. Sources whose file schema EQUALS the
    * target schema are appended as raw row groups — no decode, no
    * re-encode, pure I/O (the commit-time cost class of the old text
    * concatenation). A schema-evolved source (columns since ADDed /
    * DROPped) takes the Group re-encode fallback: rows are read under
    * its own schema and rewritten under the target's, missing columns
    * NULL, dropped columns gone. */
  def mergeShardFiles(target: java.io.File, targetSchema: MessageType,
      sources: Seq[java.io.File]): Unit = {
    val metas = sources.map(f => f -> footer(f)._1)
    if (metas.forall(_._2 == targetSchema)) {
      val w = new ParquetFileWriter(
        new LocalOutputFile(target.toPath), targetSchema,
        ParquetFileWriter.Mode.CREATE, RowGroupBytes,
        /* maxPaddingSize = parquet's default */ 8388608)
      w.start()
      sources.foreach(f =>
        w.appendFile(new LocalInputFile(f.toPath)))
      w.end(java.util.Collections.emptyMap[String, String]())
    } else {
      val kinds: Seq[(String, PrimitiveTypeName, Boolean)] =
        (0 until targetSchema.getFieldCount).map { i =>
          val t = targetSchema.getType(i).asPrimitiveType()
          (t.getName, t.getPrimitiveTypeName,
            t.getLogicalTypeAnnotation ==
              LogicalTypeAnnotation.stringType())
        }
      val names = kinds.map(_._1)
      val w = openWriter(target, targetSchema)
      try {
        val fac = groupFactory(targetSchema)
        metas.foreach { case (f, fileSchema) =>
          val proj = projectionFor(fileSchema, names)
          val r = openReader(f, proj)
          try {
            var g = r.read()
            while (g != null) {
              val out = fac.newGroup()
              kinds.foreach { case (n, ptn, isStr) =>
                if (proj.containsField(n)) {
                  val i = proj.getFieldIndex(n)
                  if (g.getFieldRepetitionCount(i) > 0) ptn match {
                    case PrimitiveTypeName.INT64 =>
                      out.add(n, g.getLong(i, 0))
                    case PrimitiveTypeName.INT32 =>
                      out.add(n, g.getInteger(i, 0))
                    case PrimitiveTypeName.DOUBLE =>
                      out.add(n, g.getDouble(i, 0))
                    case PrimitiveTypeName.BOOLEAN =>
                      out.add(n, g.getBoolean(i, 0))
                    case PrimitiveTypeName.BINARY if isStr =>
                      out.add(n, g.getBinary(i, 0))
                    case other =>
                      throw new IllegalArgumentException(
                        s"unsupported shard column $n: $other")
                  }
                }
              }
              w.write(out)
              g = r.read()
            }
          } finally r.close()
        }
      } finally w.close()
    }
  }
}
