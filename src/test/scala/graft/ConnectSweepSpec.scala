package graft

import org.apache.spark.connect.proto
import org.apache.spark.sql.connect.service.SparkConnectService
import org.sparkproject.connect.grpc.ManagedChannelBuilder

/** FULL-REGISTRY Spark Connect drive (round 15 — the round-14
  * verdict's top-next): every registered query's UNEXECUTED plan is
  * published as a global temp view and re-executed by the
  * Connect-spawned server session over a real localhost gRPC hop; the
  * streamed Arrow batches are decoded COLUMN-BY-COLUMN IN THEIR NATIVE
  * TYPES and compared row-for-row against the in-process result.
  *
  * Why native decode matters: the 12-query sample
  * (ConnectServerSpec) concatenates to one STRING column server-side,
  * which proves the hop but hides the wire ENCODING of timestamps,
  * dates, decimals, doubles and binary — exactly where a
  * client-visible divergence would live (the reference's actual
  * client boundary is this protocol path, SURVEY §3.1). Here each
  * Arrow vector's value is canonicalized (timestamps to UTC epoch
  * micros, dates to epoch days, decimals to plain strings, binary to
  * hex) and the local Row values are canonicalized by their Catalyst
  * DataType to the same form — a per-type mismatch fails with the
  * query name and first diverging row.
  *
  * The sweep asserts ALL queries pass and reports every divergence in
  * one run (failures accumulate, the assertion fires once at the end).
  * sf0.01 — the driver's correctness-gate scale. */
class ConnectSweepSpec extends SparkSpec {

  private val sweepSf = "/root/testdata/sf0.01"

  // ---- canonical value rendering, local (Catalyst Row) side ----
  private def hex(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString

  private def canonLocal(v: Any): String = v match {
    case null => "<null>"
    case t: java.sql.Timestamp =>
      (math.floorDiv(t.getTime, 1000L) * 1000000L +
        t.getNanos / 1000L).toString
    case i: java.time.Instant =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case ldt: java.time.LocalDateTime =>
      (ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L).toString
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
    case ld: java.time.LocalDate => ld.toEpochDay.toString
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: scala.math.BigDecimal => bd.bigDecimal.toPlainString
    case b: Array[Byte] => hex(b)
    case s: scala.collection.Seq[_] =>
      s.map(canonLocal).mkString("[", ",", "]")
    case x => x.toString
  }

  // ---- canonical value rendering, Arrow (wire) side ----
  private def canonArrow(o: Any): String = o match {
    case null => "<null>"
    case t: org.apache.arrow.vector.util.Text => t.toString
    case b: Array[Byte] => hex(b)
    case ldt: java.time.LocalDateTime =>
      (ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L).toString
    case ld: java.time.LocalDate => ld.toEpochDay.toString
    case bd: java.math.BigDecimal => bd.toPlainString
    case l: java.util.List[_] =>
      val it = l.iterator()
      val parts = Seq.newBuilder[String]
      while (it.hasNext) parts += canonArrow(it.next())
      parts.result().mkString("[", ",", "]")
    // TimeStampMicroTZVector yields Long UTC micros; BigInt/Int/
    // Float8/Bit yield their boxed JVM values — toString matches the
    // local rendering for all of them
    case x => x.toString
  }

  /** Decode every column of the Connect Arrow batches into canonical
    * row strings (column values joined with '|'), plus the wire
    * schema's column names — a renamed/reordered column is a wire
    * divergence even when the values happen to line up. */
  private def arrowRows(
      batches: Seq[Array[Byte]]): (Seq[String], Seq[String]) = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val names = Seq.newBuilder[String]
    var sawSchema = false
    val rows = try batches.flatMap { data =>
      val rd = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(data), alloc)
      try {
        val root = rd.getVectorSchemaRoot
        val out = Seq.newBuilder[String]
        while (rd.loadNextBatch()) {
          if (!root.getSchema.getFields.isEmpty) {
            if (!sawSchema) {
              sawSchema = true
              root.getSchema.getFields.forEach(f => names += f.getName)
            }
            val nCols = root.getSchema.getFields.size()
            val vs = (0 until nCols).map(root.getVector)
            (0 until root.getRowCount).foreach { i =>
              out += vs.map(v =>
                if (v.isNull(i)) "<null>"
                else canonArrow(v.getObject(i))).mkString("|")
            }
          }
        }
        out.result()
      } finally rd.close()
    } finally alloc.close()
    (rows, names.result())
  }

  test("EVERY registered query is row-hash-equal over a Spark Connect " +
      "gRPC hop with native-type Arrow decode (timestamps, dates, " +
      "decimals, doubles, binary) — the client-boundary contract for " +
      "the whole registry at sf0.01") {
    // ISOLATED session for the local builds: other suites bind the
    // per-session Derby JDBC catalog to THEIR data dir (sf0.001) in
    // the shared session, and the jdbc-backed queries refuse a
    // same-session rebind by design — a fresh session binds sf0.01
    // cleanly whatever ran before (suite-order independence)
    val sess = spark.newSession()
    graft.sources.Lake.registerCatalog(sess)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    org.apache.spark.sql.graft.Bridge.setContextConf(spark,
      "spark.sql.catalog.graft_lake.path",
      sess.conf.get("spark.sql.catalog.graft_lake.path"))

    SparkConnectService.start(spark.sparkContext)
    try {
      val channel = ManagedChannelBuilder
        .forAddress("localhost", 15937).usePlaintext().build()
      try {
        val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
        val sid = java.util.UUID.randomUUID().toString
        def run(sql: String): (Seq[String], Seq[String]) = {
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
              return arrowRows(batches.result())
            } catch {
              case _: Exception if attempt < 20 =>
                attempt += 1; Thread.sleep(500)
            }
          }
          (Nil, Nil) // unreachable
        }

        val failures = Seq.newBuilder[String]
        var nOk = 0
        SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
          try {
            val df = SparkEntry.queries(name)(sess, sweepSf)
            val local = df.collect().map(r =>
              (0 until r.length).map(i =>
                if (r.isNullAt(i)) "<null>"
                else canonLocal(r.get(i))).mkString("|")).toSeq
            df.createOrReplaceGlobalTempView("graft_sweep_q")
            val (wire, wireCols) =
              run("SELECT * FROM global_temp.graft_sweep_q")
            // empty-result queries ship field-less command batches, so
            // only compare names when the wire declared any
            if (wireCols.nonEmpty &&
              wireCols != df.schema.fieldNames.toSeq)
              failures += s"$name: wire schema $wireCols vs local " +
                s"${df.schema.fieldNames.toSeq}"
            else if (wire == local) nOk += 1
            else {
              val i = wire.zipAll(local, "<missing>", "<missing>")
                .indexWhere { case (a, b) => a != b }
              failures += s"$name: ${wire.length} wire vs " +
                s"${local.length} local rows; first diff at row $i: " +
                s"wire=${wire.lift(i)} local=${local.lift(i)}"
            }
          } catch {
            case e: Exception =>
              failures += s"$name: sweep error ${e.getClass.getName}: " +
                s"${Option(e.getMessage).getOrElse("").take(300)}"
          }
        }
        val bad = failures.result()
        info(s"connect sweep: $nOk queries row-hash-equal over gRPC")
        assert(bad.isEmpty,
          s"${bad.size} queries diverged over the Connect hop:\n" +
            bad.mkString("\n"))
        assert(nOk >= 300, s"sweep covered only $nOk queries")
      } finally { channel.shutdownNow(); () }
    } finally SparkConnectService.stop(None, None)
  }
}
