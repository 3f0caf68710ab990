package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-execution robustness: a shared SparkSession serves many
  * clients at once (the Thrift-server / notebook-gateway deployment the
  * reference runs — several users against one coordinator), so a
  * diverse set of registered queries must produce serial-identical
  * results when raced on one session. This guards the isolation
  * decisions made for exactly this reason: per-stream child sessions
  * pinning their own shuffle partitions, conf-driven catalog binding
  * (first registration wins), memoized fixtures behind
  * content-fingerprint + atomic-rename publication. */
class ConcurrencySpec extends SparkSpec {

  // diverse on purpose: batch agg, join+sort, window, dedup chain,
  // streaming (child session + state store), JDBC catalog, document
  // catalog, custom-exec ANN, sketch aggregate
  private val names = Seq(
    "groupby_agg", "q1_join_filter_sort", "window_rank_lag_lead",
    "dedup_exact", "stream_tumbling_counts", "jdbc_scan_agg",
    "mongo_catalog_scan", "ann_custom_exec_topk", "quantile_hist_sketch",
    "bitmap_exact_distinct64", "text_bm25_topk", "graph_triangle_count",
    // round 10: DDL-bearing writers (lake MERGE, JDBC ingest) racing
    // the readers — both serialize internally, results must not change
    "merge_sql_firstseen", "jdbc_ingest_roundtrip")

  test("diverse registered queries race on one session with " +
      "serial-identical results") {
    val serial = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
    }.toMap
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(names.length))
    val raced = Future.sequence(names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, sf)
        .collect().map(_.toString).sorted.toSeq)
    })
    val results = Await.result(raced, 5.minutes).toMap
    names.foreach { n =>
      assert(results(n) === serial(n), s"$n diverged under concurrency")
      assert(results(n).nonEmpty, s"$n returned nothing")
    }
  }
}
