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
        rs.close(); st.close()
      } finally conn.close()
    } finally server.stop()
  }
}
