package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the native hash kernels to their definitional
  * formulas (the same definitions the DuckDB oracles use). Pure JVM — no
  * SparkSession needed. */
class HashPropertiesSpec extends AnyFunSuite {

  private val P = 2147483647L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refHex60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))

  private val text: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n * 3).flatMap(i => g.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong))).take(n)

  test("hex60md5 equals the md5-hex-prefix definition") {
    samples(text, 200).foreach { s =>
      assert(HashUtil.hex60md5(UTF8String.fromString(s)) === refHex60(s),
        s"for input '$s'")
    }
    assert(HashUtil.hex60md5(UTF8String.fromString("hello")) ===
      419982666956583591L) // cross-checked against DuckDB
  }

  test("native shingle hashes equal the split/3-gram/md5 chain") {
    samples(text, 200).foreach { s =>
      val toks = s.split(" ", -1)
      val expect =
        if (toks.length < 3) null
        else toks.sliding(3).map(w => refHex60(w.mkString(" ")) % P).toArray
      val got = HashUtil.shingleHashes(UTF8String.fromString(s))
      if (expect == null) assert(got === null, s"for '$s'")
      else assert(got.toSeq === expect.toSeq, s"for '$s'")
    }
  }

  test("native n-gram hashes equal the distinct split/slice/md5 chain") {
    for (n <- Seq(1, 2, 5)) {
      samples(text, 200).foreach { s =>
        val toks = s.split(" ", -1)
        val expect =
          if (toks.length < n) Array.emptyLongArray
          else toks.sliding(n).map(w => refHex60(w.mkString(" ")))
            .toSeq.distinct.toArray
        val got = HashUtil.ngramHashes(UTF8String.fromString(s), n)
        assert(got.toSeq === expect.toSeq, s"for n=$n '$s'")
      }
    }
  }

  test("minhashSigs equals the 16 universal-hash minima") {
    samples(text, 100).foreach { s =>
      val hs = HashUtil.shingleHashes(UTF8String.fromString(s))
      if (hs != null && hs.nonEmpty) {
        val sigs = HashUtil.minhashSigs(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(hs))
        (0 until 16).foreach { j =>
          val a = (2654435761L * (j + 1)) % P
          val b = (40503L * (j + 1) + 17L) % P
          val expect = hs.map(h => (a * h + b) % P).min
          assert(sigs(j) === expect, s"perm $j for '$s'")
        }
      }
    }
  }

  test("simhash48FromText equals the distinct-shingle majority-vote bits") {
    samples(text, 100).foreach { s =>
      val toks = s.split(" ", -1)
      val expect =
        if (toks.length < 3) 0L
        else {
          val hs = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
            .map(sh => refHex60(sh) % 281474976710656L)
          (0 until 48).foldLeft(0L) { (acc, b) =>
            val cnt = hs.count(h => ((h >>> b) & 1L) == 1L)
            if (2 * cnt - hs.size > 0) acc | (1L << b) else acc
          }
        }
      assert(HashUtil.simhash48FromText(UTF8String.fromString(s)) === expect,
        s"for '$s'")
    }
  }

  test("sq8 code equals BigDecimal HALF_UP rounding of v/max*127, " +
      "ties away from zero") {
    // explicit ties: ±63.5 must round AWAY from zero (±64), the case
    // where Math.round-style floor(v+0.5) would give -63 for -63.5
    assert(Sq8Quantize.code(1.0, 2.0) === 64)   //  63.5 →  64
    assert(Sq8Quantize.code(-1.0, 2.0) === -64) // −63.5 → −64
    assert(Sq8Quantize.code(0.0, 2.0) === 0)
    assert(Sq8Quantize.code(2.0, 2.0) === 127)
    assert(Sq8Quantize.code(0.5, 0.0) === 0)    // zero vector guard
    val vals = samples(Gen.chooseNum(-1e3, 1e3), 300)
    val maxes = samples(Gen.chooseNum(1e-3, 1e3), 300)
    vals.zip(maxes).foreach { case (v, m) =>
      val x = v / m * 127.0
      val expect = BigDecimal(x)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
      assert(Sq8Quantize.code(v, m) === expect, s"v=$v m=$m x=$x")
    }
  }
}
