package graft

import org.apache.spark.connect.proto
import org.apache.spark.sql.connect.service.SparkConnectService
import org.sparkproject.connect.grpc.ManagedChannelBuilder

/** Wire-protocol surface, modern binding: next to the HiveServer2 hop
  * (ThriftServerSpec — the direct analog of the reference's
  * client⇄coordinator HTTP/JDBC hop, SURVEY §3.1), Spark Connect is the
  * protocol a current client library would actually speak. The sandbox
  * ships the SERVER artifact (spark-connect jar, with its shaded gRPC
  * runtime) but not the separate connect-client jar, so this spec talks
  * the protocol itself: it starts the Connect service in-process on the
  * shared context, opens a real gRPC channel through localhost, submits
  * the flagship query as an ExecutePlan(SQL) request, and counts the
  * rows the server streams back in its Arrow batch headers — proving a
  * reference user could point any Spark Connect client (PySpark,
  * spark-connect-go, JDBC-over-Connect) at this engine. */
class ConnectServerSpec extends SparkSpec {

  test("flagship query is served over a real Spark Connect gRPC hop") {
    val df = SparkEntry.queries("q1_join_filter_sort")(spark, sf)
    // global temp views span the context's sessions, including the
    // per-(user, session) SparkSessions the Connect service spawns
    df.createOrReplaceGlobalTempView("graft_q1_connect")
    val expectRows = df.count()
    assert(expectRows > 0)

    SparkConnectService.start(spark.sparkContext)
    try {
      val channel = ManagedChannelBuilder
        .forAddress("localhost", 15937).usePlaintext().build()
      try {
        val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
        val req = proto.ExecutePlanRequest.newBuilder()
          .setSessionId(java.util.UUID.randomUUID().toString)
          .setUserContext(
            proto.UserContext.newBuilder().setUserId("graft"))
          .setPlan(proto.Plan.newBuilder().setRoot(
            proto.Relation.newBuilder().setSql(proto.SQL.newBuilder()
              .setQuery("SELECT * FROM global_temp.graft_q1_connect"))))
          .build()
        // the server binds synchronously in start(), but guard the first
        // RPC against a slow accept loop anyway
        var attempt = 0
        var rows = -1L
        var sawMetrics = false
        while (rows < 0) {
          try {
            val it = stub.executePlan(req)
            var n = 0L
            while (it.hasNext) {
              val resp = it.next()
              if (resp.hasArrowBatch) n += resp.getArrowBatch.getRowCount
              // the execution's closing message in the non-reattachable
              // protocol (ResultComplete only ships when reattachable
              // execution is requested)
              if (resp.hasMetrics) sawMetrics = true
            }
            rows = n
          } catch {
            case e: Exception if attempt < 20 =>
              attempt += 1; Thread.sleep(500)
          }
        }
        assert(rows === expectRows)
        assert(sawMetrics)
        // custom Catalyst expressions must also resolve in the
        // Connect-spawned session (GraftExtensions ride the SparkConf,
        // so every session built from this context registers them)
        val req2 = proto.ExecutePlanRequest.newBuilder()
          .setSessionId(java.util.UUID.randomUUID().toString)
          .setUserContext(
            proto.UserContext.newBuilder().setUserId("graft"))
          .setPlan(proto.Plan.newBuilder().setRoot(
            proto.Relation.newBuilder().setSql(proto.SQL.newBuilder()
              .setQuery("SELECT graft_hex60('abc') AS h"))))
          .build()
        val it2 = stub.executePlan(req2)
        var rows2 = 0L
        while (it2.hasNext) {
          val resp = it2.next()
          if (resp.hasArrowBatch) rows2 += resp.getArrowBatch.getRowCount
        }
        assert(rows2 === 1L)
      } finally { channel.shutdownNow(); () }
    } finally SparkConnectService.stop(None, None)
  }
}
