package graft.sources

import java.io.File

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the columnar shard codec — the storage layer
  * every lake/document byte now rides. Random typed rows (unicode
  * strings, NaN/±0.0/extreme doubles, nulls everywhere) must
  * round-trip VALUE-EXACTLY through write→read, through the raw
  * row-group append path, and through the schema-evolution re-encode
  * path. Pure JVM — no SparkSession. */
class ShardCodecSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("i", IntegerType),
    StructField("d", DateType),
    StructField("x", DoubleType),
    StructField("s", StringType),
    StructField("ts", TimestampType),
    StructField("b", BooleanType)))

  private def tmp(name: String): File = {
    val f = File.createTempFile(name, ".parquet")
    f.delete()
    f.deleteOnExit()
    f
  }

  private def randRow(rnd: scala.util.Random): Array[Any] = {
    def maybe[T](v: => T): Any =
      if (rnd.nextInt(5) == 0) null else v.asInstanceOf[Any]
    Array(
      maybe(java.lang.Long.valueOf(rnd.nextLong())),
      maybe(java.lang.Integer.valueOf(rnd.nextInt())),
      maybe(java.lang.Integer.valueOf(rnd.nextInt(40000))),
      maybe(java.lang.Double.valueOf(rnd.nextInt(8) match {
        case 0 => Double.NaN
        case 1 => Double.PositiveInfinity
        case 2 => Double.NegativeInfinity
        case 3 => -0.0
        case 4 => Double.MinPositiveValue
        case _ => rnd.nextDouble() * math.pow(10, rnd.nextInt(300))
      })),
      maybe(UTF8String.fromString(rnd.nextInt(4) match {
        case 0 => "héllo é世界😀" // unicode+emoji
        case 1 => "" // empty, distinct from null
        case 2 => "line\nbreak\ttab\"quote"
        case _ => rnd.alphanumeric.take(rnd.nextInt(64)).mkString
      })),
      maybe(java.lang.Long.valueOf(rnd.nextLong() / 1000L)),
      maybe(java.lang.Boolean.valueOf(rnd.nextBoolean())))
  }

  private def writeRows(f: File, sch: StructType,
      rows: Seq[Array[Any]]): Unit = {
    val mt = GraftShardCodec.messageType(sch)
    val fac = GraftShardCodec.groupFactory(mt)
    val w = GraftShardCodec.openWriter(f, mt)
    try rows.foreach { vals =>
      val g = fac.newGroup()
      sch.fields.zipWithIndex.foreach { case (fld, i) =>
        GraftShardCodec.add(g, fld.name, vals(i))
      }
      w.write(g)
    } finally w.close()
  }

  /** Bit-level equality (NaN == NaN, -0.0 != 0.0 — storage must not
    * normalize). */
  private def sameCell(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.doubleToLongBits(x.doubleValue()) ==
        java.lang.Double.doubleToLongBits(y.doubleValue())
    case (x, y) => x == y
  }

  private def assertSame(got: Seq[Array[Any]],
      want: Seq[Array[Any]], ctx: String): Unit = {
    assert(got.length === want.length, s"$ctx: row count")
    got.zip(want).zipWithIndex.foreach { case ((g, w), r) =>
      g.zip(w).zipWithIndex.foreach { case ((gc, wc), c) =>
        assert(sameCell(gc, wc), s"$ctx row $r col $c: $gc != $wc")
      }
    }
  }

  test("random rows round-trip value-exactly (NaN, ±0.0, infinities, " +
      "unicode, empty-vs-null strings) across seeds") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(200 + rnd.nextInt(200))(randRow(rnd))
      val f = tmp(s"codec_rt_$seed")
      writeRows(f, schema, rows)
      val got = GraftShardCodec.readRows(f, schema).toSeq
      assertSame(got, rows, s"seed $seed")
      val (fs, n) = GraftShardCodec.footer(f)
      assert(n === rows.length.toLong &&
        fs.getFieldCount === schema.length)
      assert(f.delete())
    }
  }

  test("raw row-group append preserves order and values; evolved " +
      "sources re-encode with missing columns NULL and dropped " +
      "columns gone") {
    val rnd = new scala.util.Random(42)
    val a = Seq.fill(100)(randRow(rnd))
    val b = Seq.fill(50)(randRow(rnd))
    val fa = tmp("codec_a"); val fb = tmp("codec_b")
    writeRows(fa, schema, a)
    writeRows(fb, schema, b)
    // fast path: identical schemas — raw row-group copy, a ++ b
    val merged = tmp("codec_m")
    GraftShardCodec.mergeShardFiles(merged,
      GraftShardCodec.messageType(schema), Seq(fa, fb))
    assertSame(GraftShardCodec.readRows(merged, schema).toSeq,
      a ++ b, "append")
    // evolution path: target drops `i` and adds `z` — the old-schema
    // source re-encodes, `z` reads NULL, `i` disappears
    val evolved = StructType(
      schema.fields.filterNot(_.name == "i") :+
        StructField("z", LongType))
    val fe = tmp("codec_e")
    GraftShardCodec.mergeShardFiles(fe,
      GraftShardCodec.messageType(evolved), Seq(fa))
    val keep = schema.fields.zipWithIndex.filterNot(_._1.name == "i")
    val want = a.map(r => keep.map { case (_, i) => r(i) } :+ null)
    assertSame(GraftShardCodec.readRows(fe, evolved).toSeq,
      want.map(_.toArray), "evolution")
    // projection: reading only (s, x) decodes a 2-field group
    val proj = StructType(Seq(schema("s"), schema("x")))
    val got = GraftShardCodec.readRows(merged, proj).toSeq
    assertSame(got,
      (a ++ b).map(r => Array(r(4), r(3))), "projection")
    Seq(fa, fb, merged, fe).foreach(f => assert(f.delete()))
  }
}
