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

  test("a client-COMPOSED relational proto plan (NamedTable -> Filter " +
      "-> Project -> Sort, no SQL string) executes against a lake " +
      "table — the DataFrame-API wire path PySpark clients send") {
    graft.sources.Lake.registerCatalog(spark)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake.path",
      spark.conf.get("spark.sql.catalog.graft_lake.path"))
    val tbl = "graft_lake.lake.spec_cx_proto"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl (user_id BIGINT, v BIGINT)
      TBLPROPERTIES ('shard_key'='user_id', 'n_shards'='2')""")
    spark.sql(s"""INSERT INTO $tbl
      SELECT id AS user_id, id * 3 AS v FROM range(0, 20)""")

    def attr(n: String) = proto.Expression.newBuilder()
      .setUnresolvedAttribute(proto.Expression.UnresolvedAttribute
        .newBuilder().setUnparsedIdentifier(n))
    def litL(x: Long) = proto.Expression.newBuilder()
      .setLiteral(proto.Expression.Literal.newBuilder().setLong(x))
    val read = proto.Relation.newBuilder().setRead(
      proto.Read.newBuilder().setNamedTable(
        proto.Read.NamedTable.newBuilder()
          .setUnparsedIdentifier(tbl)))
    val filtered = proto.Relation.newBuilder().setFilter(
      proto.Filter.newBuilder()
        .setInput(read)
        .setCondition(proto.Expression.newBuilder()
          .setUnresolvedFunction(
            proto.Expression.UnresolvedFunction.newBuilder()
              .setFunctionName(">")
              .addArguments(attr("v")).addArguments(litL(30L)))))
    val projected = proto.Relation.newBuilder().setProject(
      proto.Project.newBuilder()
        .setInput(filtered)
        .addExpressions(attr("user_id"))
        .addExpressions(attr("v")))
    val sorted = proto.Relation.newBuilder().setSort(
      proto.Sort.newBuilder()
        .setInput(projected)
        .setIsGlobal(true) // default false = sortWithinPartitions
        .addOrder(proto.Expression.SortOrder.newBuilder()
          .setChild(attr("user_id"))
          .setDirection(proto.Expression.SortOrder.SortDirection
            .SORT_DIRECTION_ASCENDING)))

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
          .setPlan(proto.Plan.newBuilder().setRoot(sorted))
          .build()
        var attempt = 0
        var got: Seq[Seq[Long]] = null
        while (got == null) {
          try {
            val it = stub.executePlan(req)
            val batches = Seq.newBuilder[Array[Byte]]
            while (it.hasNext) {
              val resp = it.next()
              if (resp.hasArrowBatch)
                batches += resp.getArrowBatch.getData.toByteArray
            }
            val alloc = new org.apache.arrow.memory.RootAllocator()
            try got = batches.result().flatMap { data =>
              val rd = new org.apache.arrow.vector.ipc.ArrowStreamReader(
                new java.io.ByteArrayInputStream(data), alloc)
              try {
                val root = rd.getVectorSchemaRoot
                val out = Seq.newBuilder[Seq[Long]]
                while (rd.loadNextBatch()) {
                  if (!root.getSchema.getFields.isEmpty)
                    (0 until root.getRowCount).foreach(i =>
                      out += Seq(
                        root.getVector(0).getObject(i)
                          .asInstanceOf[Long],
                        root.getVector(1).getObject(i)
                          .asInstanceOf[Long]))
                }
                out.result()
              } finally rd.close()
            } finally alloc.close()
          } catch {
            case _: Exception if attempt < 20 =>
              attempt += 1; Thread.sleep(500)
          }
        }
        // v = 3*id > 30 -> ids 11..19, ascending
        assert(got === (11L until 20L).map(i => Seq(i, i * 3)),
          s"proto-composed plan diverged: $got")
      } finally { channel.shutdownNow(); () }
    } finally {
      SparkConnectService.stop(None, None)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  // ---- promoted round-14 drive: a REPRESENTATIVE registry sample +
  // the lakehouse verbs over the same gRPC hop ----

  /** Decode the single STRING column of Connect Arrow batches (each
    * ArrowBatch.data is a self-contained IPC stream). */
  private def arrowStrings(
      batches: Seq[Array[Byte]]): Seq[String] = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try batches.flatMap { data =>
      val rd = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(data), alloc)
      try {
        val root = rd.getVectorSchemaRoot
        val out = Seq.newBuilder[String]
        while (rd.loadNextBatch()) {
          // command results ship field-less batches — nothing to read
          if (!root.getSchema.getFields.isEmpty) {
            val v = root.getVector(0)
            (0 until root.getRowCount).foreach(i =>
              out += (if (v.isNull(i)) "<null>"
                      else v.getObject(i).toString))
          }
        }
        out.result()
      } finally rd.close()
    } finally alloc.close()
  }

  test("a representative registry sample (12 queries) plus lake DML, " +
      "CALL procedures, time travel, and an ANN index probe all run " +
      "over one Spark Connect gRPC session, row-hash-equal to the " +
      "local engine") {
    // catalog binding at CONTEXT level: Connect spawns fresh sessions
    // that inherit only spark-defaults-style conf (same discipline as
    // the Thrift hop)
    graft.sources.Lake.registerCatalog(spark)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake.path",
      spark.conf.get("spark.sql.catalog.graft_lake.path"))

    val sample = Seq("q1_join_filter_sort", "groupby_agg",
      "distinct_rows", "join_left_outer", "union_all", "top_k",
      "having_filter", "subquery_exists", "filter_in_between_like",
      "orderby_multi", "case_when_project", "scalar_string_funcs")
    // publish each query's UNEXECUTED plan as a global temp view: the
    // Connect-side SELECT re-executes the full plan (scans, joins,
    // aggregates) inside the server-spawned session — the hop carries
    // real execution, not a cached result
    val canonical = sample.map { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.createOrReplaceGlobalTempView(s"graft_cx_$name")
      val casts = df.columns.map(c =>
        s"coalesce(CAST(`$c` AS STRING), '<null>')").mkString(", ")
      val sql = s"SELECT concat_ws('', $casts) AS r " +
        s"FROM global_temp.graft_cx_$name"
      name -> (sql, df.sparkSession.sql(sql).collect()
        .map(_.getString(0)).toSeq)
    }

    SparkConnectService.start(spark.sparkContext)
    try {
      val channel = ManagedChannelBuilder
        .forAddress("localhost", 15937).usePlaintext().build()
      try {
        val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
        // ONE session id for the whole drive: catalog state (created
        // tables, tags) must persist across statements like any
        // client session
        val sid = java.util.UUID.randomUUID().toString
        def run(sql: String): Seq[String] = {
          val req = proto.ExecutePlanRequest.newBuilder()
            .setSessionId(sid)
            .setUserContext(
              proto.UserContext.newBuilder().setUserId("graft"))
            .setPlan(proto.Plan.newBuilder().setRoot(
              proto.Relation.newBuilder().setSql(
                proto.SQL.newBuilder().setQuery(sql))))
            .build()
          var attempt = 0
          while (true) {
            try {
              val it = stub.executePlan(req)
              val batches = Seq.newBuilder[Array[Byte]]
              while (it.hasNext) {
                val resp = it.next()
                if (resp.hasArrowBatch)
                  batches += resp.getArrowBatch.getData.toByteArray
              }
              return arrowStrings(batches.result())
            } catch {
              case _: Exception if attempt < 20 =>
                attempt += 1; Thread.sleep(500)
            }
          }
          Nil // unreachable
        }

        // 1) the registry sample, hash-equal (ordered row-string
        // comparison — every registry query ends in a total ORDER BY)
        canonical.foreach { case (name, (sql, expect)) =>
          val got = run(sql)
          assert(got === expect,
            s"$name over Connect diverged: ${got.take(3)} vs " +
              s"${expect.take(3)}")
        }

        // 2) lakehouse verbs through the same session
        val t = "graft_lake.lake.cx_lake"
        run(s"DROP TABLE IF EXISTS $t")
        run(s"""CREATE TABLE $t (user_id BIGINT, v BIGINT)
                TBLPROPERTIES ('shard_key'='user_id','n_shards'='2')""")
        run(s"INSERT INTO $t VALUES (1, 10), (2, 20), (3, 30)")
        run(s"UPDATE $t SET v = 99 WHERE user_id = 1")
        run(s"""MERGE INTO $t x USING (
                  SELECT * FROM VALUES (2L, 22L), (4L, 44L) AS s(k, nv)
                ) s ON x.user_id = s.k
                WHEN MATCHED THEN UPDATE SET v = s.nv
                WHEN NOT MATCHED THEN INSERT (user_id, v)
                  VALUES (s.k, s.nv)""")
        def state(q: String): Seq[String] = run(
          s"SELECT concat_ws(',', CAST(user_id AS STRING), " +
            s"CAST(v AS STRING)) AS r FROM ($q) ORDER BY r")
        assert(state(s"SELECT * FROM $t") ===
          Seq("1,99", "2,22", "3,30", "4,44"))
        // time travel via a named tag, CALLed over the wire
        run(s"""CALL graft_lake.system.create_tag(
                table => 'cx_lake', tag => 'first', version => 1)""")
        assert(state(s"SELECT * FROM $t VERSION AS OF 'first'") ===
          Seq("1,10", "2,20", "3,30"))
        // maintenance + storage inventory
        run(s"CALL graft_lake.system.optimize(table => 'cx_lake')")
        assert(state(s"SELECT * FROM $t") ===
          Seq("1,99", "2,22", "3,30", "4,44"))
        assert(run(s"SELECT CAST(count(*) AS STRING) AS r FROM " +
          s"graft_lake.lake.`cx_lake$$files`").head.toLong >= 1L)

        // 3) ANN: build the persisted index over the wire, probe it
        val vt = "graft_lake.lake.cx_vecs"
        run(s"DROP TABLE IF EXISTS $vt")
        run(s"""CREATE TABLE $vt (vec_id BIGINT, emb STRING)
                TBLPROPERTIES ('shard_key'='vec_id','n_shards'='2')""")
        val rows = (0 until 16).map { i =>
          val base = if (i < 8) Seq(1.0, 0.0, 0.0, 0.0)
                     else Seq(0.0, 0.0, 0.0, 1.0)
          val emb = base.zipWithIndex.map { case (b, j) =>
            math.round((b + 0.01 * ((i + j) % 5)) * 1e6).toString
          }.mkString(",")
          s"(${i}L, '$emb')"
        }.mkString(", ")
        run(s"INSERT INTO $vt VALUES $rows")
        run("""CALL graft_lake.system.build_ann_index(
               table => 'cx_vecs', index_table => 'cx_ix',
               k => 2, iters => 2, pq_m => 2, pq_k => 4,
               pq_iters => 1)""")
        // probe vector 0's cell: its whole 8-member blob, nobody else
        val cell = run("""SELECT CAST(cell AS STRING) AS r
          FROM graft_lake.lake.cx_ix WHERE vec_id = 0""").head
        val members = run(s"""SELECT CAST(vec_id AS STRING) AS r
          FROM graft_lake.lake.cx_ix WHERE cell = $cell
          ORDER BY vec_id""")
        assert(members === (0 until 8).map(_.toString))
        // 4) TEXT-INDEX lifecycle CALL verbs — the admin surface a
        // remote client actually drives: build, source edits, refresh,
        // health stats, and an INDEXED shard-pruned search, all over
        // the same gRPC session (run() reads result column 0)
        val dt = "graft_lake.lake.cx_docs"
        run(s"DROP TABLE IF EXISTS $dt")
        run(s"""CREATE TABLE $dt (doc_id BIGINT, text STRING)
                TBLPROPERTIES ('shard_key'='doc_id','n_shards'='2')""")
        run(s"""INSERT INTO $dt VALUES (0L, 'alpha beta'),
                (1L, 'beta gamma'), (2L, 'alpha delta'),
                (3L, 'gamma beta')""")
        val builtTix = run("""CALL graft_lake.system.build_text_index(
               table => 'cx_docs', index_table => 'cx_tix')""")
        assert(builtTix === Seq("cx_tix"), s"build returned $builtTix")
        run(s"DELETE FROM $dt WHERE doc_id = 1")
        run(s"INSERT INTO $dt VALUES (4L, 'alpha alpha')")
        // refresh over the wire: col 0 = from_version (the cursor
        // before the advance — built at source v1)
        assert(run("""CALL graft_lake.system.refresh_text_index(
               index_table => 'cx_tix')""") === Seq("1"))
        assert(run("SELECT CAST(count(*) AS STRING) AS r FROM " +
          "graft_lake.lake.cx_tix_tomb") === Seq("1"))
        // health stats over the wire: live postings of the edited
        // corpus = d0{alpha,beta} d2{alpha,delta} d3{gamma,beta}
        // d4{alpha} = 7 (col 0 = live_postings)
        assert(run("""CALL graft_lake.system.text_index_stats(
               index_table => 'cx_tix')""") === Seq("7"))
        // indexed search over the hop: shard-pruned literal term-hash
        // probe + the tombstone liveness rule, ranked by tf — the
        // deleted doc 1 is masked, the refreshed doc 4 leads
        val alphaH = graft.plans.HashUtil.hex60md5(
          org.apache.spark.unsafe.types.UTF8String.fromString("alpha"))
        assert(run(s"""SELECT CAST(p.doc_id AS STRING) AS r
          FROM graft_lake.lake.cx_tix p
          LEFT JOIN (SELECT doc_id, max(before) AS b
                     FROM graft_lake.lake.cx_tix_tomb
                     GROUP BY doc_id) t ON p.doc_id = t.doc_id
          WHERE p.term_h = ${alphaH}L AND p.term = 'alpha'
            AND (t.b IS NULL OR p.ver >= t.b)
          ORDER BY p.tf DESC, p.doc_id""") === Seq("4", "0", "2"))
        // sort-rewrite maintenance over the wire (col 0 = shard count)
        assert(run("CALL graft_lake.system.rewrite_sorted(" +
          "table => 'cx_lake')").head.toInt >= 1)
        assert(state(s"SELECT * FROM $t") ===
          Seq("1,99", "2,22", "3,30", "4,44"))

        // 5) snapshot-consistent INDEX-GROUP refresh over the wire:
        // one table carrying both modalities, both cursors advance to
        // the same pinned version (col 0 = version)
        val bt = "graft_lake.lake.cx_both"
        run(s"DROP TABLE IF EXISTS $bt")
        run(s"""CREATE TABLE $bt
                (doc_id BIGINT, text STRING, vec_id BIGINT, emb STRING)
                TBLPROPERTIES ('shard_key'='doc_id','n_shards'='2')""")
        run(s"""INSERT INTO $bt VALUES
                (0L, 'alpha beta', 0L, '1000000,0,0,0'),
                (1L, 'beta gamma', 1L, '0,1000000,0,0'),
                (2L, 'alpha alpha', 2L, '900000,100000,0,0'),
                (3L, 'gamma delta', 3L, '0,900000,100000,0')""")
        run("""CALL graft_lake.system.build_text_index(
               table => 'cx_both', index_table => 'cx_btix')""")
        run("""CALL graft_lake.system.build_ann_index(
               table => 'cx_both', index_table => 'cx_baix',
               k => 2, iters => 1, pq_m => 2, pq_k => 2,
               pq_iters => 1)""")
        run(s"DELETE FROM $bt WHERE doc_id = 1")
        run(s"""INSERT INTO $bt VALUES
                (4L, 'delta alpha', 4L, '500000,500000,0,0')""")
        assert(run("""CALL graft_lake.system.refresh_indexes(
               table => 'cx_both', text_index => 'cx_btix',
               ann_index => 'cx_baix')""") === Seq("3"))
        Seq("tix_meta" -> "cx_btix_meta", "aix_meta" -> "cx_baix_meta")
          .foreach { case (what, meta) =>
            assert(run(s"SELECT CAST(max(last_version) AS STRING) " +
              s"AS r FROM graft_lake.lake.$meta") === Seq("3"),
              s"$what cursor must land on the pinned v3")
          }

        Seq("cx_lake", "cx_vecs", "cx_ix", "cx_ix_centroids",
          "cx_ix_codebooks", "cx_ix_meta",
          "cx_docs", "cx_tix", "cx_tix_docs", "cx_tix_tomb",
          "cx_tix_meta", "cx_both", "cx_btix", "cx_btix_docs",
          "cx_btix_tomb", "cx_btix_meta", "cx_baix",
          "cx_baix_centroids", "cx_baix_codebooks", "cx_baix_meta")
          .foreach(n =>
            run(s"DROP TABLE IF EXISTS graft_lake.lake.$n"))
      } finally { channel.shutdownNow(); () }
    } finally SparkConnectService.stop(None, None)
  }
}
