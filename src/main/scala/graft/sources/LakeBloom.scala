package graft.sources

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Per-(shard, column) BLOOM FILTER sidecar (`_bloom.json` per
  * version) — equality/IN file skipping where zone maps cannot help.
  *
  * Zone maps prune ORDERED predicates; on a hash-sharded table every
  * shard's [min,max] for a non-key column typically spans the whole
  * domain, so `col = v` reads all shards. Columns listed in the
  * `bloom_columns` table property instead get an 8 KB bloom filter
  * per shard, built by the writers and merged at commit like the zone
  * maps: a shard whose filter provably lacks every probed value is
  * never planned. This is parquet's column bloom filter / Iceberg's
  * puffin blob at the shard granularity the lake prunes by
  * (`trino/catalog/trinodemo.properties`' store exposes the same
  * point-lookup skipping to Trino's planner).
  *
  * Soundness ledger (skips must never lose rows):
  *  - bits only ever turn ON (adds + OR merges) → a recorded filter
  *    is always a SUPERSET of the shard's live values (deletes and
  *    deletion vectors leave it stale-but-superset);
  *  - a shard/column WITHOUT an entry is never skipped;
  *  - at commit, an appended shard keeps only columns present in BOTH
  *    the carried half's entry and the staged half's observations —
  *    enabling `bloom_columns` later can therefore never fabricate
  *    coverage for rows written before it (the intersection rule; a
  *    fresh or fully-rewritten shard takes the staged side verbatim);
  *  - only null-rejecting shapes probe (`=`, `IN`), and filters
  *    record every non-null value, so NULL rows can't be lost;
  *  - only integral/date/string columns are filtered — float equality
  *    (NaN, -0.0) is refused at DDL, mirroring the zone maps' NaN
  *    discipline.
  *
  * Scale: 8 KB × shards × bloom columns of metadata, read once per
  * scan plan; hashing is XXH64 (two seeds, Kirsch–Mitzenmacher double
  * hashing into K=4 probes), the same family parquet/Iceberg use —
  * no md5 in the ingest hot path. */
object GraftLakeBloom {
  val Words = 1024 // 65536 bits = 8 KB per (shard, column)
  val K = 4
  private val Seed1 = 0x9e3779b97f4a7c15L
  private val Seed2 = 0xc2b2ae3d27d4eb4fL
  private val Bits = Words * 64

  def empty(): Array[Long] = new Array[Long](Words)

  private def set(buf: Array[Long], h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < K) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2,
        Bits.toLong).toInt
      buf(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  private def test(buf: Array[Long], h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < K) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2,
        Bits.toLong).toInt
      if ((buf(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def addLong(buf: Array[Long], v: Long): Unit =
    set(buf, XXH64.hashLong(v, Seed1), XXH64.hashLong(v, Seed2))

  def addUtf8(buf: Array[Long], u: UTF8String): Unit =
    set(buf,
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), Seed1),
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), Seed2))

  def mightContainLong(buf: Array[Long], v: Long): Boolean =
    test(buf, XXH64.hashLong(v, Seed1), XXH64.hashLong(v, Seed2))

  def mightContainUtf8(buf: Array[Long], u: UTF8String): Boolean =
    test(buf,
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), Seed1),
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), Seed2))

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](Words)
    var i = 0
    while (i < Words) { out(i) = a(i) | b(i); i += 1 }
    out
  }

  def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * Words)
    var i = 0
    while (i < Words) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == 8 * Words,
      s"bloom sidecar entry must be ${8 * Words} bytes, " +
        s"got ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Words)
    var i = 0
    while (i < Words) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  def bloomFile(vdir: java.io.File): java.io.File =
    new java.io.File(vdir, "_bloom.json")

  def write(vdir: java.io.File,
      m: Map[Int, Map[String, Array[Long]]]): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val b64 = java.util.Base64.getEncoder
    m.toSeq.sortBy(_._1).foreach { case (shard, cols) =>
      val s = root.putObject(shard.toString)
      cols.toSeq.sortBy(_._1).foreach { case (name, bits) =>
        s.put(name, b64.encodeToString(toBytes(bits))): Unit
      }
    }
    java.nio.file.Files.writeString(bloomFile(vdir).toPath,
      om.writeValueAsString(root)): Unit
  }

  def read(vdir: java.io.File): Map[Int, Map[String, Array[Long]]] = {
    val f = bloomFile(vdir)
    if (!f.exists()) return Map.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readString(f.toPath))
    val b64 = java.util.Base64.getDecoder
    val out = Map.newBuilder[Int, Map[String, Array[Long]]]
    root.properties().forEach { e =>
      val cols = Map.newBuilder[String, Array[Long]]
      e.getValue.properties().forEach(c =>
        cols += c.getKey -> fromBytes(b64.decode(c.getValue.asText())))
      out += e.getKey.toInt -> cols.result()
    }
    out.result()
  }
}
