package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONE registered query (repeatedly) in a fresh JVM —
  * `sbt "runMain graft.RunOne <name> [sfDir] [reps]"`. Separates
  * first-touch fixture/memo cost (reported by the `[graft-memo]` lines)
  * from the steady-state plan time, which a full Bench run can't do
  * when the build lands on whichever query runs first. */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <query> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val q = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    // SPARK_GRAFT_SHUFFLE: scaled-parallelism sampling (BASELINE.md sf1
    // table) — on a cluster partitions scale with data; this knob is
    // how the fixed-local contract simulates that.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_EXPLAIN=1: dump the executed plan before timing (PLANS.md
    // evidence comes from here, not from hand-written trees). The
    // explained DataFrame is reused for rep 1 — rebuilding would run
    // streaming queries (runToTable) twice and double side effects.
    var prebuilt: Option[org.apache.spark.sql.DataFrame] =
      if (sys.env.get("GRAFT_EXPLAIN").contains("1")) {
        val df = q(spark, sfDir)
        System.err.println(df.queryExecution.executedPlan.toString)
        Some(df)
      } else None
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val df = prebuilt.getOrElse(q(spark, sfDir))
      prebuilt = None
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.err.println(f"[run-one] $name rep $i: $dt%.3f s ($n rows)")
      dt
    }
    spark.stop()
    val cold = times.head
    val best = times.min
    println(
      f"""{"query":"$name","cold":$cold%.3f,"best":$best%.3f,"reps":$reps}""")
  }
}
