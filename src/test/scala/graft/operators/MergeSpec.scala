package graft.operators

import java.io.File
import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins MERGE/upsert semantics ([[Merge.mergeUpsert]]): a second batch
  * UPDATES matched keys and INSERTS new ones (never duplicates), the
  * combine resolution keeps the min, re-merging the same batch is a
  * no-op, and — the copy-on-write contract — shards untouched by a
  * batch keep their files byte-identical (partition-pruned rewrite,
  * not a full-table rewrite). */
class MergeSpec extends SparkSpec {

  private def freshRoot(tag: String): File = {
    val f = new File(System.getProperty("java.io.tmpdir"),
      s"graft_mergespec_${tag}_${ProcessHandle.current().pid()}" +
        s"_${System.nanoTime()}")
    f
  }

  private def d(s: String): Date = Date.valueOf(s)

  test("second batch updates matched keys and inserts new ones — " +
      "no duplicates, min kept") {
    import spark.implicits._
    val root = freshRoot("upd")
    val b1 = Seq((0L, d("2024-01-05")), (1L, d("2024-01-03")),
      (9L, d("2024-01-09"))).toDF("user_id", "cohort_d")
    Merge.initTarget(spark, root, b1, "user_id", 4)
    // key 1: earlier day arrives late (matched, update to min);
    // key 9: later day (matched, keep existing); key 6: new (insert)
    val b2 = Seq((1L, d("2024-01-01")), (9L, d("2024-01-31")),
      (6L, d("2024-01-07"))).toDF("user_id", "cohort_d")
    val stats = Merge.mergeUpsert(spark, root, b2, "user_id", 4,
      (t, v) => least(t, v))
    assert(stats.affectedShards === Seq(1L, 2L))
    val rows = Merge.readTarget(spark, root)
      .orderBy("user_id").collect()
      .map(r => r.getLong(0) -> r.getDate(1).toString)
    assert(rows.toSeq === Seq(0L -> "2024-01-05", 1L -> "2024-01-01",
      6L -> "2024-01-07", 9L -> "2024-01-09"))
    // exactly one row per key survived the merge
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("re-merging the same batch is a no-op (idempotent combine)") {
    import spark.implicits._
    val root = freshRoot("idem")
    val b1 = Seq((2L, d("2024-02-02")), (5L, d("2024-02-05")))
      .toDF("user_id", "cohort_d")
    Merge.initTarget(spark, root, b1, "user_id", 4)
    val b2 = Seq((2L, d("2024-02-01")), (7L, d("2024-02-07")))
      .toDF("user_id", "cohort_d")
    Merge.mergeUpsert(spark, root, b2, "user_id", 4, (t, v) => least(t, v))
    val once = Merge.readTarget(spark, root).orderBy("user_id").collect()
      .map(_.toSeq).toSeq
    Merge.mergeUpsert(spark, root, b2, "user_id", 4, (t, v) => least(t, v))
    val twice = Merge.readTarget(spark, root).orderBy("user_id").collect()
      .map(_.toSeq).toSeq
    assert(once === twice)
  }

  test("copy-on-write rewrites ONLY the shards the batch touches — " +
      "untouched partition files stay byte-identical") {
    import spark.implicits._
    val root = freshRoot("cow")
    // keys 0..7 cover all 4 shards (pmod(k, 4))
    val b1 = (0L until 8L).map(k => (k, d("2024-03-01")))
      .toDF("user_id", "cohort_d")
    Merge.initTarget(spark, root, b1, "user_id", 4)
    def snapshot(shard: Long): Map[String, (Long, Long)] = {
      val dir = new File(root, s"shard=$shard")
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val before = (0L until 4L).map(k => k -> snapshot(k)).toMap
    // the batch touches only shard 1 (keys 1 and 5)
    val b2 = Seq((1L, d("2024-02-15")), (5L, d("2024-03-20")))
      .toDF("user_id", "cohort_d")
    val stats = Merge.mergeUpsert(spark, root, b2, "user_id", 4,
      (t, v) => least(t, v))
    assert(stats.affectedShards === Seq(1L))
    // shard 1 was rewritten; shards 0, 2, 3 kept the same files
    assert(snapshot(1L) !== before(1L))
    for (k <- Seq(0L, 2L, 3L))
      assert(snapshot(k) === before(k), s"shard $k was rewritten")
    // and the data in untouched shards is intact
    val all = Merge.readTarget(spark, root).orderBy("user_id").collect()
      .map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    assert(all(1L) === "2024-02-15") // earlier day won
    assert(all(5L) === "2024-03-01") // existing min kept
    assert(all(0L) === "2024-03-01" && all(7L) === "2024-03-01")
    assert(all.size === 8)
  }

  test("property fuzz: random batch sequences through mergeUpsert " +
      "equal an in-memory Map fold at every step") {
    import spark.implicits._
    for (seed <- Seq(11, 47)) {
      val rnd = new scala.util.Random(seed)
      val root = freshRoot(s"fuzz$seed")
      var model = Map.empty[Long, Int] // key -> min day-offset
      var first = true
      for (_ <- 1 to 5) {
        // skewed keyspace so batches hit matched, unmatched and
        // unread-shard cases; values as day offsets from one epoch
        val batch = Seq.fill(1 + rnd.nextInt(12))(
          (rnd.nextInt(40).toLong, rnd.nextInt(365)))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
        val df = batch.toSeq.toDF("user_id", "off")
          .selectExpr("user_id",
            "date_add(DATE '2024-01-01', off) AS cohort_d")
        if (first) { Merge.initTarget(spark, root, df, "user_id", 4); first = false }
        else Merge.mergeUpsert(spark, root, df, "user_id", 4,
          (t, v) => least(t, v)): Unit
        model = batch.foldLeft(model) { case (m, (k, v)) =>
          m.updated(k, m.get(k).fold(v)(math.min(v, _)))
        }
        val got = Merge.readTarget(spark, root).collect()
          .map(r => r.getLong(0) ->
            (r.getDate(1).toLocalDate.toEpochDay -
              java.time.LocalDate.parse("2024-01-01").toEpochDay).toInt)
          .toMap
        assert(got === model, s"seed $seed diverged from the model")
      }
    }
  }

  test("merge_upsert_firstseen equals the flat first-seen recompute " +
      "on harness events") {
    val merged = Merge.mergeUpsertFirstSeen(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    val flat = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(to_date(ts) AS DATE) AS d")
      .groupBy("user_id").agg(min("d").as("cohort_d"))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    assert(merged === flat)
  }
}
