package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Checkpoint/restart semantics — the operational property that makes a
  * streaming pipeline production-grade: a query stopped after batch A
  * and restarted after batch B lands must (1) recover its operator
  * state from the checkpoint and (2) process only the new file, giving
  * an exactly-once sink. Proven with stateful dropDuplicates: users
  * present in BOTH batches are re-offered on restart and must NOT be
  * re-emitted — that only holds if the dedup state survived the stop. */
class StreamsRestartSpec extends SparkSpec {

  private val sch = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  private def publish(df: org.apache.spark.sql.DataFrame,
      srcDir: String, name: String): Unit = {
    val stage = Files.createTempDirectory("graft_restart_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).toArray.map(_.toString)
      .find(_.matches(".*part-.*\\.parquet$")).get
    Files.move(Paths.get(part), Paths.get(srcDir, name + ".parquet"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def runOnce(srcDir: String, ckpt: String, sink: String): Unit = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val q = ss.readStream.schema(sch).parquet(srcDir)
      .dropDuplicates("user_id")
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("restarted checkpointed dedup stream recovers state and stays " +
      "exactly-once") {
    val base = Files.createTempDirectory("graft_restart_").toString
    val srcDir = s"$base/src"
    Files.createDirectories(Paths.get(srcDir))
    val ckpt = s"$base/ckpt"
    val sink = s"$base/sink"

    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
    // split by user so batch B both RE-OFFERS users from A (state
    // recovery) and contributes users A never saw (real progress)
    val mid = ev.agg(expr("percentile_approx(user_id, 0.6)"))
      .head().getLong(0)
    val a = ev.filter(col("user_id") <= mid)
    val b = ev.filter(col("user_id") >= mid - 1)
    val usersA = a.select("user_id").distinct().count()
    val usersAll = ev.select("user_id").distinct().count()
    assert(usersAll > usersA, "batch B must contribute new users")
    // the restart only proves state recovery if some users span batches
    val overlap = a.select("user_id").intersect(b.select("user_id")).count()
    assert(overlap > 0, "batches must share users")

    publish(a, srcDir, "a")
    runOnce(srcDir, ckpt, sink)
    val afterA = spark.read.parquet(sink)
    assert(afterA.count() === usersA)

    publish(b, srcDir, "b")
    runOnce(srcDir, ckpt, sink) // fresh session, same checkpoint
    val afterB = spark.read.parquet(sink)
    // exactly-once: every user exactly one row, despite `overlap` users
    // being re-offered in batch B — dedup state came back from the
    // checkpoint, and file A was not re-read
    assert(afterB.count() === usersAll)
    assert(afterB.select("user_id").distinct().count() === usersAll)
  }
}
