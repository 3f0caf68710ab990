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

  private[sources] val derbyDriver =
    "org.apache.derby.iapi.jdbc.AutoloadedDriver"
  private val driver = derbyDriver

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
        if (!exists) graft.sources.Tables.timedMemo("derbyMirror") {
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
        // decimal-exact sum, rendered DOUBLE: the driver hash is
        // unstable on raw DECIMAL output (RegistryGuardSpec enforces
        // DECIMAL-free registry schemas); cast applies above the
        // pushed-down remote aggregate
        sum(col("o_totalprice")).cast("decimal(18,2)").cast("double")
          .as("sum_price"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("o_orderstatus")

  val jdbcScanAggOracle: String =
    s"""SELECT o_orderstatus, count(*) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
         AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
       FROM orders
       WHERE o_orderkey < $KeyBound
         AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Bind the Derby mirror as the NAMED catalog `graft_jdbc`
    * ([[GraftJdbcCatalog]]) so three-part identifiers resolve across
    * catalogs in one statement. Binding is conf-driven and lazy —
    * Spark instantiates the plugin at the first
    * `graft_jdbc.<schema>.<table>` reference — and per-session: the
    * first sf dir bound in a session wins (the harness uses one dir
    * per JVM; a multi-tenant deployment would bind one catalog name
    * per database, exactly like the reference's one properties file
    * per catalog). */
  def registerCatalog(s: SparkSession, dir: String): Unit = {
    ensureMirror(s, dir)
    s.conf.set("spark.sql.catalog.graft_jdbc",
      classOf[GraftJdbcCatalog].getName)
    // first binding wins — the lazily-instantiated plugin caches its
    // url, so a later conf overwrite would silently disagree with it.
    // A SECOND dir in the same session therefore cannot be honored:
    // fail closed instead of silently serving the first dir's rows.
    s.conf.getOption("spark.sql.catalog.graft_jdbc.url") match {
      case None => s.conf.set("spark.sql.catalog.graft_jdbc.url", url(dir))
      case Some(bound) if bound != url(dir) =>
        throw new IllegalStateException(
          s"graft_jdbc is already bound to $bound; rebinding it to " +
            s"${url(dir)} in the same session would leave the loaded " +
            "catalog plugin serving the FIRST dir's rows. Use one " +
            "session per data dir (the harness contract) or a second " +
            "catalog name.")
      case _ => // same dir re-registered: idempotent
    }
    // federate computation, not rows: whole GROUP BY aggregates compile
    // into the remote engine's SQL (PushedAggregates in the scan;
    // JdbcSourceSpec asserts) — the reference pushes the same way into
    // Postgres. pushDownLimit stays OFF for this dialect: Derby cannot
    // express LIMIT, Spark's Derby dialect emits an EMPTY limit clause
    // yet still marks the top-N fully pushed and removes its own limit,
    // so enabling it silently returns the WHOLE table (measured here;
    // JdbcSourceSpec pins the guard).
    s.conf.set("spark.sql.catalog.graft_jdbc.pushDownAggregate", "true")
    s.conf.set("spark.sql.catalog.graft_jdbc.pushDownLimit", "false")
    // force the load: SHOW CATALOGS lists only LOADED catalogs, so a
    // conf-registered-but-never-referenced catalog would be invisible
    s.sql("SHOW NAMESPACES IN graft_jdbc").collect(): Unit
  }

  /** The reference's flagship CROSS-CATALOG join re-expressed over this
    * engine's two catalogs (`localTrinoTest.ipynb:119-121` joins
    * `mongodb.weather.weatherny` to `trinodemo.public.applehistory` on
    * a key, filters on a date and sorts): one SQL statement addresses
    * the JDBC catalog (`graft_jdbc.APP.GRAFT_ORDERS`, live Derby —
    * uppercase because Derby stores unquoted identifiers folded up)
    * and the session catalog (`spark_catalog.default.graft_lineitem_cc`,
    * parquet) by three-part name. The date predicate is pushed into
    * the remote engine by the inherited DSv2 pushdown; the parquet
    * side prunes columns at the scan. */
  val q1CrossCatalog: Q = (s, dir) => {
    registerCatalog(s, dir)
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS spark_catalog.default.graft_lineitem_cc
          USING parquet LOCATION '$dir/lineitem.parquet'""")
    // ORDER BY spells the harness data's actual unique line key —
    // (l_orderkey, l_linenumber) repeats in the synthetic lineitem, so
    // the part/supp keys + price complete a total order. Prices are
    // cast to DOUBLE on BOTH engine and oracle sides: the driver's
    // hash canonicalizes DECIMAL unstably across engines (same lesson
    // as decimal_halfup_overflow), and these cents-scale values are
    // exactly representable in a double.
    s.sql(
      """SELECT o.O_ORDERKEY AS o_orderkey,
                CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
                l.l_partkey, l.l_suppkey,
                CAST(o.O_ORDERDATE AS DATE) AS o_orderdate,
                o.O_ORDERSTATUS AS o_orderstatus,
                CAST(o.O_TOTALPRICE AS DOUBLE) AS o_totalprice,
                CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
                  AS l_extendedprice
         FROM graft_jdbc.APP.GRAFT_ORDERS o
         JOIN spark_catalog.default.graft_lineitem_cc l
           ON l.l_orderkey = o.O_ORDERKEY
         WHERE o.O_ORDERDATE < DATE '1997-01-01'
         ORDER BY o_orderkey, l_linenumber, l_partkey, l_suppkey,
           l_extendedprice""")
  }

  val q1CrossCatalogOracle: String =
    s"""SELECT o.o_orderkey,
       CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
       l.l_partkey, l.l_suppkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       o.o_orderstatus,
       CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
         AS l_extendedprice
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderkey < $KeyBound
         AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
       ORDER BY o_orderkey, l_linenumber, l_partkey, l_suppkey,
         l_extendedprice"""

  /** GROUP BY executed BY THE REMOTE ENGINE: with pushDownAggregate
    * the whole count/min/max aggregation compiles into Derby's SQL
    * (`PushedAggregates` in the scan — asserted by JdbcSourceSpec), so
    * what crosses the wire is one row per group, not one per order —
    * the federation shape that matters when the remote table is large
    * and the link is the bottleneck. */
  val jdbcAggPushdown: Q = (s, dir) => {
    registerCatalog(s, dir)
    s.sql(
      """SELECT O_ORDERSTATUS AS o_orderstatus,
                count(*) AS n,
                min(O_ORDERKEY) AS min_key,
                max(O_ORDERKEY) AS max_key
         FROM graft_jdbc.APP.GRAFT_ORDERS
         GROUP BY O_ORDERSTATUS
         ORDER BY o_orderstatus""")
  }

  val jdbcAggPushdownOracle: String =
    s"""SELECT o_orderstatus, count(*) AS n,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
       FROM orders WHERE o_orderkey < $KeyBound
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** The WRITE direction of the JDBC catalog — the engine-side analog
    * of the reference's `fill_postgresql.sql` ingest (CSV → Postgres,
    * `fill_postgresql.sql:1-12`), completing the Derby catalog to the
    * same round-trip fidelity the document catalog got
    * ([[GraftMongoBatchWrite]]): CREATE TABLE and INSERT INTO are both
    * issued THROUGH the DSv2 catalog (Spark plans the insert as a
    * v2 AppendData into the remote engine — typed through the Derby
    * dialect, batched over partition-parallel connections), then the
    * rows are read back through the same catalog and compared
    * oracle-exact against the parquet source. DROP + CREATE each run
    * keeps the query idempotent across invocations in one JVM (the
    * in-memory database outlives the query).
    *
    * VARCHAR(32) is declared explicitly: Spark's Derby dialect maps
    * unbounded STRING to CLOB, which Derby refuses to compare/sort —
    * the same wire-type discipline the reference's DDL applies
    * (`fill_postgresql.sql:3`: quoted typed columns). */
  val jdbcIngestRoundtrip: Q = (s, dir) => Jdbc.synchronized {
    // synchronized: the query is DROP+CREATE+INSERT on one fixed remote
    // table, so two concurrent invocations on a shared session would
    // race DDL against insert (same guard style as Lake.mergeSqlFirstSeen)
    registerCatalog(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_jdbc.APP.GRAFT_NATION_RT")
    s.sql(
      """CREATE TABLE graft_jdbc.APP.GRAFT_NATION_RT (
         N_NATIONKEY BIGINT, N_NAME VARCHAR(32), N_REGIONKEY BIGINT)""")
    t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name",
        "CAST(n_regionkey AS BIGINT)")
      .createOrReplaceTempView("graft_nation_rt_src")
    s.sql(
      """INSERT INTO graft_jdbc.APP.GRAFT_NATION_RT
         SELECT * FROM graft_nation_rt_src""")
    s.sql(
      """SELECT N_NATIONKEY AS n_nationkey, N_NAME AS n_name,
                N_REGIONKEY AS n_regionkey
         FROM graft_jdbc.APP.GRAFT_NATION_RT
         ORDER BY n_nationkey""")
  }

  val jdbcIngestRoundtripOracle: String =
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
       CAST(n_regionkey AS BIGINT) AS n_regionkey
       FROM nation ORDER BY n_nationkey"""

  val queries: Map[String, Q] = Map(
    "jdbc_scan_agg" -> jdbcScanAgg,
    "jdbc_agg_pushdown" -> jdbcAggPushdown,
    "jdbc_ingest_roundtrip" -> jdbcIngestRoundtrip,
    "q1_cross_catalog" -> q1CrossCatalog)
  val oracles: Map[String, String] = Map(
    "jdbc_scan_agg" -> jdbcScanAggOracle,
    "jdbc_agg_pushdown" -> jdbcAggPushdownOracle,
    "jdbc_ingest_roundtrip" -> jdbcIngestRoundtripOracle,
    "q1_cross_catalog" -> q1CrossCatalogOracle)
}
