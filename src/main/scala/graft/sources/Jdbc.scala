package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables.t

/** JDBC source binding — the Spark side of the reference's PostgreSQL
  * connector (`trino/catalog/trinodemo.properties:1-6`, table DDL
  * `local_demo_setup/fill_postgresql.sql:1-10`). Unlike the other
  * connector analogs this one is exercised against a REAL JDBC engine:
  * Spark ships embedded Derby (it backs the Hive metastore), so the
  * scan below goes through the genuine `format("jdbc")` path — driver
  * registration, dialect type mapping (DECIMAL/DATE/VARCHAR),
  * predicate pushdown into the remote SQL, and bounded partitioned
  * parallel reads — with zero network, which is what this sandbox
  * allows. Swapping to PostgreSQL is the documented one-line change:
  * the `url`/`driver` options (the reference's `connection-url`,
  * `trinodemo.properties:2`).
  *
  * Scale posture: the read is PARTITIONED (`partitionColumn` /
  * `lowerBound` / `upperBound` / `numPartitions`), the shape that lets
  * 1000 executors each pull a key range instead of one task draining
  * the whole table through a single connection; filters are pushed into
  * the remote engine (PlanSpec asserts `PushedFilters`), so the
  * database — not Spark — prunes.
  */
object Jdbc {

  private def tag(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode)

  /** One embedded database per sf dir, living for the JVM's lifetime —
    * the analog of the reference's always-on Postgres service. */
  private def url(dir: String): String =
    s"jdbc:derby:memory:graft_${tag(dir)};create=true"

  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  /** Rows mirrored into the JDBC engine (a bounded slice: the reference
    * DB holds 2.5 k rows — `fill_postgresql.sql`'s applehistory). */
  private val KeyBound = 5000L

  /** Idempotently create + fill the Derby-side orders mirror (the
    * `fill_postgresql.sql` analog): explicit DDL with the WIRE types the
    * reference maps (DECIMAL(12,2) price, DATE, VARCHAR status), then an
    * appended Spark JDBC write. */
  private def ensureMirror(s: SparkSession, dir: String): Unit =
    Jdbc.synchronized {
      val conn = DriverManager.getConnection(url(dir))
      try {
        val meta = conn.getMetaData.getTables(null, null, "GRAFT_ORDERS", null)
        val exists = meta.next()
        meta.close()
        if (!exists) {
          val st = conn.createStatement()
          st.execute(
            """CREATE TABLE graft_orders (
               o_orderkey BIGINT NOT NULL PRIMARY KEY,
               o_custkey BIGINT,
               o_orderstatus VARCHAR(1),
               o_totalprice DECIMAL(12,2),
               o_orderdate DATE)""")
          st.close()
          t(s, dir, "orders")
            .filter(col("o_orderkey") < KeyBound)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderstatus"),
              col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
              col("o_orderdate").cast("date").as("o_orderdate"))
            .write.format("jdbc")
            .option("url", url(dir))
            .option("driver", driver)
            .option("dbtable", "graft_orders")
            .mode("append")
            .save()
        }
      } finally conn.close()
    }

  /** Partitioned JDBC scan of the mirror. Derby reports uppercase
    * identifiers; project back to the harness's lowercase names. */
  def ordersJdbc(s: SparkSession, dir: String): DataFrame = {
    ensureMirror(s, dir)
    s.read.format("jdbc")
      .option("url", url(dir))
      .option("driver", driver)
      .option("dbtable", "graft_orders")
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", "0")
      .option("upperBound", KeyBound.toString)
      .option("numPartitions", "4")
      .load()
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
  }

  /** Q4-analog over the JDBC source: remote-filtered, partition-parallel
    * scan → hash aggregate. The date predicate and key bound are pushed
    * into Derby's SQL (PushedFilters), so the JDBC engine prunes before
    * rows cross the wire — the exact shape of the reference's federated
    * `WHERE` queries against Postgres. */
  val jdbcScanAgg: Q = (s, dir) =>
    ordersJdbc(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("date"))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice")).cast("decimal(18,2)").as("sum_price"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("o_orderstatus")

  val jdbcScanAggOracle: String =
    s"""SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
         AS sum_price,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
       FROM orders
       WHERE o_orderkey < $KeyBound
         AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val queries: Map[String, Q] = Map("jdbc_scan_agg" -> jdbcScanAgg)
  val oracles: Map[String, String] = Map("jdbc_scan_agg" -> jdbcScanAggOracle)
}
