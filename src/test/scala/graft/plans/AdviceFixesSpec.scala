package graft.plans

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the round-2 semantics fixes:
  *  - graft_dot NULLs out on length mismatch / null elements (identical to
  *    the `aggregate(zip_with(...))` HOF formulation it replaces);
  *  - RewriteRankOneToMaxBy leaves DESC NULLS FIRST windows untouched
  *    (max_by's struct comparison is NULLS LAST — rewriting would pick a
  *    different row when sort keys contain nulls). */
class AdviceFixesSpec extends SparkSpec {

  private def mkVecs(rows: Seq[Row]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def dotAndHof(rows: Seq[Row]): Seq[(Any, Any)] =
    mkVecs(rows).selectExpr(
      "graft_dot(a, b) AS native",
      """aggregate(zip_with(a, b, (x, y) -> x * y),
         CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS hof""")
      .collect().toSeq.map(r => (r.get(0), r.get(1)))

  test("graft_dot matches aggregate(zip_with) on clean vectors") {
    val out = dotAndHof(Seq(Row(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))))
    assert(out === Seq((32.0, 32.0)))
  }

  test("graft_dot is NULL on length mismatch, same as the HOF fold") {
    val out = dotAndHof(Seq(Row(Array(1.0, 2.0, 3.0), Array(4.0, 5.0))))
    assert(out === Seq((null, null)))
  }

  test("graft_dot is NULL on null elements, same as the HOF fold") {
    val out = dotAndHof(Seq(Row(Array(1.0, null, 3.0), Array(4.0, 5.0, 6.0))))
    assert(out === Seq((null, null)))
  }

  test("graft_dot propagates NULL input arrays") {
    val out = dotAndHof(Seq(Row(null, Array(1.0))))
    assert(out === Seq((null, null)))
  }

  private def rankOne(nullOrder: String) = {
    import spark.implicits._
    Seq(
      ("k1", Some(5L), "null-last-loser"),
      ("k1", None, "the-null"),
      ("k2", Some(1L), "only")).toDF("k", "v", "tag")
      .createOrReplaceTempView("advice_rank_src")
    spark.sql(
      s"""SELECT k, v, tag FROM (
            SELECT *, row_number() OVER
              (PARTITION BY k ORDER BY v DESC $nullOrder) AS rn
            FROM advice_rank_src) WHERE rn = 1""")
  }

  test("rank-1 rewrite fires on DESC (NULLS LAST default) and is correct") {
    val df = rankOne("NULLS LAST")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("max_by"), s"rewrite did not fire:\n$p")
    val got = df.collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(got === Map("k1" -> "null-last-loser", "k2" -> "only"))
  }

  test("rank-1 rewrite leaves DESC NULLS FIRST untouched and row is the null one") {
    val df = rankOne("NULLS FIRST")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("max_by"),
      s"rewrite must not fire on NULLS FIRST:\n$p")
    val got = df.collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(got === Map("k1" -> "the-null", "k2" -> "only"))
  }

  // ---- round-3: CosineTopKJoinExec mirrors the window plan's edge cases
  // (NaN similarity ranks first, dim-mismatch/NULL scores NULL and ranks
  // last) so RewriteCosineTopK's identity claim holds on malformed data ----

  private def vecDf(rows: Seq[Row],
      session: org.apache.spark.sql.SparkSession = spark) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("nrm", DoubleType)))
    session.createDataFrame(session.sparkContext.parallelize(rows, 2), schema)
  }

  test("CosineTopKJoinExec matches the brute window plan on NaN/dim-mismatch/null data") {
    import org.apache.spark.sql.expressions.Window
    val corpus = vecDf(Seq(
      Row(10L, Array(1.0f, 0.0f), 1.0),          // valid
      Row(11L, Array(Float.NaN, 0.0f), 1.0),     // NaN element → NaN sim
      Row(12L, Array(1.0f, 2.0f, 3.0f), 3.74),   // dim mismatch → NULL sim
      Row(13L, Array(0.6f, 0.8f), 1.0),          // valid
      Row(14L, null, null)))                     // NULL embedding → NULL sim
      .selectExpr("vec_id AS c_id", "embedding", "nrm")
    val queries = vecDf(Seq(Row(1L, Array(0.0f, 1.0f), 1.0)))
      .selectExpr("vec_id AS q_id", "embedding", "nrm")
    val k = 4
    def rank(df: org.apache.spark.sql.DataFrame, cidSort: Column) = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, cidSort)
      df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("q_id", "rank", "c_id", "cos_sim")
        .orderBy("q_id", "rank")
    }
    // c_id ASC NULLS LAST keeps RewriteCosineTopK from ALSO rewriting the
    // brute plan (its guard wants the NULLS FIRST default) without changing
    // results — c_id is never null here
    val brute = rank(
      corpus.crossJoin(queries.selectExpr(
          "q_id", "embedding AS q_emb", "nrm AS q_nrm"))
        .selectExpr("q_id", "c_id",
          "graft_dot(embedding, q_emb) / (nrm * q_nrm) AS cos_sim"),
      col("c_id").asc_nulls_last)
    assert(!brute.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
      .contains("CosineTopKJoin"),
      "brute plan must stay brute for this comparison")
    val custom = rank(org.apache.spark.sql.graft.Bridge.ofRows(spark,
      graft.plans.CosineTopKJoin(
        corpus.queryExecution.analyzed,
        queries.queryExecution.analyzed, k)),
      col("c_id").asc)
    def show(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) "NULL" else r.getDouble(3).toString))
    val (b, c) = (show(brute), show(custom))
    assert(b === c, s"brute=$b custom=$c")
    // and the expected shape: NaN first, two valid, then a NULL survivor
    assert(b.map(_._3) === Seq(11L, 13L, 10L, 12L))
    assert(b.head._4 === "NaN" && b.last._4 === "NULL")
  }

  test("CosineTopKJoinExec throws on zero norms under ANSI, like the window plan") {
    val corpus = vecDf(Seq(Row(10L, Array(0.0f, 0.0f), 0.0)))
      .selectExpr("vec_id AS c_id", "embedding", "nrm")
    val queries = vecDf(Seq(Row(1L, Array(0.0f, 1.0f), 1.0)))
      .selectExpr("vec_id AS q_id", "embedding", "nrm")
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val custom = org.apache.spark.sql.graft.Bridge.ofRows(spark,
      graft.plans.CosineTopKJoin(
        corpus.queryExecution.analyzed,
        queries.queryExecution.analyzed, 1))
    val e = intercept[Throwable] { custom.collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("DIVIDE_BY_ZERO"), msgs)
  }

  test("quantile_hist_auto survives empty and all-equal events input") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_qha").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def write(rows: Seq[Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    write(Nil)
    assert(graft.operators.Aggregates.quantileHistAuto(spark, dir)
      .collect().isEmpty)
    write(Seq(
      Row(1L, 1000000000L, 1L, "click", 7.0, "{}"),
      Row(2L, 2000000000L, 2L, "click", 7.0, "{}")))
    val r = graft.operators.Aggregates.quantileHistAuto(spark, dir)
      .collect()
    assert(r.length === 1 && r(0).getLong(1) === 2L)
    // all-equal input: interpolated p50 stays within one (widened) bucket
    // width of the exact quantile 7.0
    assert(math.abs(r(0).getDouble(2) - 7.0) <= 1.0 / 256 + 1e-9)
    // all-NULL values: min/max are NULL on a NON-empty table; the oracle
    // filters value IS NOT NULL and emits zero rows — so must the engine
    // (not one (event_type, n, NULL) row per group)
    write(Seq(
      Row(1L, 1000000000L, 1L, "click", null, "{}"),
      Row(2L, 2000000000L, 2L, "view", null, "{}")))
    assert(graft.operators.Aggregates.quantileHistAuto(spark, dir)
      .collect().isEmpty)
  }

  test("CosineTopKJoinExec scores zero norms NULL with ANSI off, like Divide") {
    // non-ANSI Spark Divide yields NULL on a zero divisor (never IEEE
    // Inf/NaN), so the zero-norm candidate must rank LAST as a NULL,
    // not FIRST as NaN
    // isolated session: suites share the session and may run in parallel
    // threads, so the non-ANSI conf must never touch the global conf.
    // REGRESSION GUARD: the selectExpr of a SUBSET of the node's output
    // below is load-bearing — it is what once made ColumnPruning plant
    // empty Projects under the node's children (empty `references`) and
    // SIGSEGV the exec's raw field reads. Fixed by CosineTopKJoin's
    // `references` override; keep the sub-output projection here.
    val iso = spark.newSession()
    iso.conf.set("spark.sql.ansi.enabled", "false")
    val corpus = vecDf(Seq(
      Row(10L, Array(0.0f, 0.0f), 0.0),
      Row(11L, Array(0.6f, 0.8f), 1.0)), iso)
      .selectExpr("vec_id AS c_id", "embedding", "nrm")
    val queries = vecDf(Seq(Row(1L, Array(0.0f, 1.0f), 1.0)), iso)
      .selectExpr("vec_id AS q_id", "embedding", "nrm")
    val custom = org.apache.spark.sql.graft.Bridge.ofRows(iso,
      graft.plans.CosineTopKJoin(
        corpus.queryExecution.analyzed,
        queries.queryExecution.analyzed, 2))
    val rows = custom.selectExpr("c_id", "cos_sim")
      .collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) "NULL" else r.getDouble(1).toString))
      .sortBy(_._1)
    assert(rows(0)._1 === 10L && rows(0)._2 === "NULL", rows.toSeq)
    assert(rows(1)._1 === 11L && rows(1)._2 != "NULL", rows.toSeq)
  }

  test("Bridge.ofRows rejects a plan whose leaves belong to another session") {
    // the session-affinity contract is runtime-enforced now (was
    // doc-only): executing session-bound leaves under a foreign session
    // must throw a diagnosable IllegalArgumentException up front, not
    // risk a codegen/state crash later
    val corpus = vecDf(Seq(Row(10L, Array(1.0f, 0.0f), 1.0)))
      .selectExpr("vec_id AS c_id", "embedding", "nrm")
    val queries = vecDf(Seq(Row(1L, Array(0.0f, 1.0f), 1.0)))
      .selectExpr("vec_id AS q_id", "embedding", "nrm")
    val other = spark.newSession()
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.Bridge.ofRows(other,
        graft.plans.CosineTopKJoin(
          corpus.queryExecution.analyzed,
          queries.queryExecution.analyzed, 1))
    }
    assert(e.getMessage.contains("different SparkSession"))
    // and the same plan on its owning session still builds
    assert(org.apache.spark.sql.graft.Bridge.ofRows(spark,
      graft.plans.CosineTopKJoin(
        corpus.queryExecution.analyzed,
        queries.queryExecution.analyzed, 1)).collect().nonEmpty)
  }

  // ---- round-7 ADVICE pins: the registerCatalog rebind guard fails
  // closed, and the content fingerprint that keys every memo/fixture
  // actually changes when a corpus is regenerated in place ----

  test("registerCatalog rejects a second data dir and stays idempotent on the first") {
    // isolated session: the guard is per-session conf state and the
    // shared session may already be bound by other suites
    val iso = spark.newSession()
    graft.sources.Jdbc.registerCatalog(iso, sf)
    // same dir again: idempotent, no throw
    graft.sources.Jdbc.registerCatalog(iso, sf)
    // different dir: the lazily-loaded plugin would keep serving the
    // FIRST dir's rows, so the rebind must fail closed
    val e = intercept[IllegalStateException] {
      graft.sources.Jdbc.registerCatalog(iso, "/root/testdata/sf0.01")
    }
    assert(e.getMessage.contains("already bound"), e.getMessage)
  }

  test("Tables.fingerprint changes when the file at the same path is rewritten") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_fp").toString
    val dst = Paths.get(dir, "documents.parquet")
    Files.write(dst, Array[Byte](1, 2, 3))
    val before = graft.sources.Tables.fingerprint(dir, "documents")
    // regenerate in place: longer content → new fingerprint → memo rebuild
    Files.write(dst, Array[Byte](1, 2, 3, 4))
    val after = graft.sources.Tables.fingerprint(dir, "documents")
    assert(before !== after,
      "fingerprint must change on rewrite or memos serve stale pairs")
    // and same content at a DIFFERENT path never aliases (the dir.hashCode
    // collision class ADVICE flagged): path is part of the digest key
    Files.copy(dst, Paths.get(dir, "documents2.parquet"),
      StandardCopyOption.COPY_ATTRIBUTES)
    assert(graft.sources.Tables.fingerprint(dir, "documents2") !== after)
  }

  test("CosineTopKJoinExec rejects a mis-shaped child with a clear error") {
    // the guard that replaced the old SIGSEGV: a child without the
    // (id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE) shape must throw,
    // never read raw fields off the wrong layout
    val bad = spark.range(3)
      .selectExpr("id AS c_id", "CAST(id AS DOUBLE) AS nrm")
    val queries = vecDf(Seq(Row(1L, Array(0.0f, 1.0f), 1.0)))
      .selectExpr("vec_id AS q_id", "embedding", "nrm")
    val custom = org.apache.spark.sql.graft.Bridge.ofRows(spark,
      graft.plans.CosineTopKJoin(
        bad.queryExecution.analyzed,
        queries.queryExecution.analyzed, 1))
    val e = intercept[Throwable] { custom.collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("corpus child must be"), msgs)
  }

  // ---- round-9 advice fixes (FrequentItemsAgg hardening) ----

  test("graft_frequent_items rejects a non-string term at ANALYSIS " +
      "time, not with an executor ClassCastException") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L).toDF("k")
    val e = intercept[Exception] {
      df.agg(expr("graft_frequent_items(k, 4)")).queryExecution.analyzed
    }
    assert(e.getMessage.contains("STRING") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
    // and a non-integral capacity is refused the same way
    val e2 = intercept[Exception] {
      Seq("a").toDF("t").agg(expr("graft_frequent_items(t, 'x')"))
        .queryExecution.analyzed
    }
    assert(e2.getMessage.contains("integral") ||
      e2.getMessage.contains("DATATYPE_MISMATCH"), e2.getMessage)
  }

  test("graft_frequent_items survives terms over 65535 UTF-8 bytes " +
      "through the serialized-buffer exchange (writeUTF would throw)") {
    import spark.implicits._
    val big = "x" * 70000
    val df = Seq(big, big, "small").toDF("t").repartition(3)
    val got = df.agg(expr("graft_frequent_items(t, 4)").as("hh"))
      .selectExpr("explode(hh) AS e").select("e.term", "e.cnt")
      .collect().map(r => r.getString(0).length -> r.getLong(1)).toMap
    assert(got === Map(70000 -> 2L, 5 -> 1L))
  }

  test("graft_frequent_items tie-breaks equal counts in UTF-8 binary " +
      "order (supplementary plane sorts after BMP, unlike UTF-16)") {
    import spark.implicits._
    // U+10000 (surrogate pair 𐀀) vs U+FF5E: UTF-16 code-unit
    // order puts the surrogate FIRST (0xD800 < 0xFF5E); UTF-8 binary
    // order (and DuckDB collation) puts it LAST (F0 90... > EF BD...)
    val supp = new String(Character.toChars(0x10000))
    val bmp = "～"
    val df = Seq(supp, bmp).toDF("t")
    val terms = df.agg(expr("graft_frequent_items(t, 4)").as("hh"))
      .selectExpr("explode(hh) AS e").select("e.term")
      .collect().map(_.getString(0)).toSeq
    assert(terms === Seq(bmp, supp),
      s"tie-break not UTF-8 binary: ${terms.map(_.codePointAt(0))}")
  }
}
