package graft

import java.sql.DriverManager

import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** Wire-protocol surface: the reference is reachable as a SERVER (its
  * notebook clients speak HTTP/JDBC to the Trino coordinator,
  * `localTrinoTest.ipynb` trino.dbapi cell, SURVEY §3.1) — this engine's
  * equivalent hop is Spark's Thrift server bound to the SAME session
  * serving the registered queries. The spec starts it in-process, makes
  * a real JDBC (HiveServer2 protocol) connection through localhost, and
  * runs the flagship query's result through the wire — proving a
  * reference user can point any beeline/JDBC client at this engine. */
class ThriftServerSpec extends SparkSpec {

  test("flagship query is served over a real Thrift/JDBC connection") {
    val port = 10917
    // the flagship result, published cross-session (thrift connections
    // get their own session; global temp views span them)
    val df = SparkEntry.queries("q1_join_filter_sort")(spark, sf)
    df.createOrReplaceGlobalTempView("graft_q1_wire")
    // bind the lake catalog at the CONTEXT conf level BEFORE the
    // server starts: thrift connections open FRESH sessions that do
    // NOT inherit runtime session conf — the binding a server
    // deployment puts in spark-defaults.conf is the one they fall
    // back to (Bridge.setContextConf models exactly that)
    graft.sources.Lake.registerCatalog(spark)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake.path",
      spark.conf.get("spark.sql.catalog.graft_lake.path"))
    val expectRows = df.count()
    val expectSum = df.selectExpr("sum(o_orderkey)").head().getLong(0)

    spark.conf.set("hive.server2.thrift.port", port.toString)
    spark.conf.set("hive.server2.thrift.bind.host", "localhost")
    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously — poll until the socket serves
      var conn: java.sql.Connection = null
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (conn == null) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "graft", "")
        catch {
          case e: Exception if System.nanoTime() < deadline =>
            Thread.sleep(500)
          case e: Exception => throw e
        }
      }
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          """SELECT count(*) AS n, sum(o_orderkey) AS key_sum
             FROM global_temp.graft_q1_wire""")
        assert(rs.next())
        assert(rs.getLong("n") === expectRows)
        assert(rs.getLong("key_sum") === expectSum)
        rs.close()

        // the LAKEHOUSE over the same wire: a beeline-class client
        // drives CREATE / INSERT / MERGE / time travel against the
        // DSv2 lake catalog through its own server-side session
        // (catalog binding rides the session conf the server cloned)
        val tbl = "graft_lake.lake.spec_wire_lake"
        st.execute(s"DROP TABLE IF EXISTS $tbl"): Unit
        st.execute(s"""CREATE TABLE $tbl (user_id BIGINT, cohort_d
          DATE) TBLPROPERTIES ('shard_key'='user_id',
          'n_shards'='4')"""): Unit
        st.execute(s"""INSERT INTO $tbl VALUES
          (1, DATE '2024-03-01'), (2, DATE '2024-03-02')"""): Unit
        st.execute(s"""MERGE INTO $tbl t USING (
            SELECT * FROM VALUES (1L, DATE '2024-02-01'),
              (3L, DATE '2024-03-03') AS s(user_id, cohort_d)) s
          ON t.user_id = s.user_id
          WHEN MATCHED THEN UPDATE SET
            cohort_d = least(t.cohort_d, s.cohort_d)
          WHEN NOT MATCHED THEN INSERT *"""): Unit
        val head = st.executeQuery(
          s"SELECT user_id, cohort_d FROM $tbl ORDER BY user_id")
        val got = Iterator.continually(head)
          .takeWhile(_.next())
          .map(r => r.getLong(1) -> r.getDate(2).toString).toSeq
        assert(got === Seq(1L -> "2024-02-01", 2L -> "2024-03-02",
          3L -> "2024-03-03"))
        head.close()
        // time travel through the wire: v1 predates the merge
        val tt = st.executeQuery(
          s"SELECT count(*) AS n FROM $tbl VERSION AS OF 1")
        assert(tt.next() && tt.getLong("n") === 2L)
        tt.close()
        // round-12 maintenance + view surfaces over the SAME wire:
        // CALL procedures, named tags, catalog views — a beeline
        // client gets the full Trino-style verbs
        val tag = st.executeQuery("""CALL graft_lake.system
          .create_tag('spec_wire_lake', 'audited', version => 2)""")
        assert(tag.next() && tag.getString(1) === "audited" &&
          tag.getInt(2) === 2)
        tag.close()
        val tagRead = st.executeQuery(
          s"SELECT count(*) AS n FROM $tbl VERSION AS OF 'audited'")
        assert(tagRead.next() && tagRead.getLong("n") === 3L)
        tagRead.close()
        val opt = st.executeQuery("""CALL graft_lake.system
          .optimize('spec_wire_lake', max_parts => 1)""")
        assert(opt.next(), "optimize must report its phases")
        opt.close()
        st.execute("""CREATE VIEW graft_lake.lake.spec_wire_view AS
          SELECT user_id FROM graft_lake.lake.spec_wire_lake
          WHERE user_id <= 2"""): Unit
        val vr = st.executeQuery("SELECT count(*) AS n " +
          "FROM graft_lake.lake.spec_wire_view")
        assert(vr.next() && vr.getLong("n") === 2L)
        vr.close()
        st.execute("DROP VIEW graft_lake.lake.spec_wire_view"): Unit
        st.execute(s"DROP TABLE $tbl"): Unit
        st.close()
      } finally conn.close()
    } finally server.stop()
  }
}
