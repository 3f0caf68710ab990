package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pins the Bloom-filter aggregate to its definitional layout (the one
  * the DuckDB oracle spells out as md5 hex substrings), and its
  * partition-independence + no-false-negative contracts. */
class BloomSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Definitional bit positions: bytes 2j..2j+1 of md5("bf_" + tok)
    * big-endian = hex chars 4j+1..4j+4 — what the oracle CASTs. */
  private def refBits(tok: String): Seq[Int] = {
    val h = md5hex("bf_" + tok)
    (0 until BloomUtil.K).map(j =>
      Integer.parseInt(h.substring(4 * j, 4 * j + 4), 16))
  }

  private val toks = Seq("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "", "tök unicode ✓", "1234567890")

  private def buildFilter(parts: Int): Array[Byte] = {
    import spark.implicits._
    toks.toDF("tok").repartition(parts)
      .agg(expr("graft_bloom_build(tok)")).head.getAs[Array[Byte]](0)
  }

  test("bloom filter bytes match the oracle's md5-substring definition") {
    val bf = buildFilter(1)
    assert(bf.length === 8 * BloomUtil.WORDS)
    // exactly the union of the tokens' definitional bits is set
    val want = toks.flatMap(refBits).toSet
    val setBits = (0 until 8 * 8 * BloomUtil.WORDS).filter { bit =>
      // BloomBuild serializes big-endian longs: byte index within the
      // long is flipped, mirroring BloomUtil.contains
      val byteIdx = ((bit >>> 6) << 3) + (7 - ((bit >>> 3) & 7))
      (bf(byteIdx) & (1 << (bit & 7))) != 0
    }.toSet
    assert(setBits === want)
  }

  test("bloom filter is partition-count independent (OR merge)") {
    val one = buildFilter(1)
    val many = buildFilter(7)
    assert(java.util.Arrays.equals(one, many))
  }

  test("no false negatives; definitional membership for probes") {
    val bf = buildFilter(3)
    toks.foreach { t =>
      assert(BloomUtil.contains(bf, UTF8String.fromString(t)), s"lost $t")
    }
    // a probe is reported present iff ALL its definitional bits are set
    // (false positives allowed, and decided by the same bit layout)
    val setBits = toks.flatMap(refBits).toSet
    (1 to 200).map(i => s"absent_$i").foreach { p =>
      val expect = refBits(p).forall(setBits.contains)
      assert(BloomUtil.contains(bf, UTF8String.fromString(p)) === expect,
        s"probe $p")
    }
  }

  test("graft_bloom_contains SQL probe agrees with BloomUtil.contains") {
    import spark.implicits._
    val bf = buildFilter(1)
    val probes = toks ++ (1 to 50).map(i => s"probe_$i")
    val got = probes.toDF("p")
      .select(col("p"),
        call_function("graft_bloom_contains", lit(bf), col("p")).as("hit"))
      .collect().map { case Row(p: String, hit: Boolean) => p -> hit }
      .toMap
    probes.foreach { p =>
      assert(got(p) === BloomUtil.contains(bf, UTF8String.fromString(p)))
    }
  }

  test("decontam_bloom flags every true-overlap doc (no false negatives)") {
    val overlap = graft.functions.TextAnalysis.decontamOverlap(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = graft.functions.TextAnalysis.decontamBloom(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(overlap.subsetOf(bloom),
      s"missed ${overlap -- bloom} — bloom may false-positive, never miss")
  }

  test("type errors are analysis-time and descriptive") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1, 2).toDF("x").agg(expr("graft_bloom_build(x)")).head
    }
    assert(e.getMessage.contains("graft_bloom_build"))
  }
}
