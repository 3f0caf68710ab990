package graft.streaming

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema-mapping evidence for the Kafka JSON topic binding
  * (`trino/kafka/weatherdata.json:5-54`, `stockdata.json:5-40`):
  * literal JSON messages shaped like the topics' producers
  * (`produce_kafka_data.py`) are pushed through the exact wire-record
  * schema `format("kafka")` emits, and every field must decode to the
  * declared type and value. This derisks the documented one-line
  * file-replay→Kafka swap without a broker. */
class KafkaTopicsSpec extends SparkSpec {

  private def wire(msgs: Seq[String], topic: String) = {
    val rows = msgs.zipWithIndex.map { case (m, i) =>
      Row(null, m.getBytes("UTF-8"), topic, 0, i.toLong,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), KafkaTopics.wireSchema)
  }

  test("weatherdata messages decode field-for-field through the declared schema") {
    val msg =
      """{"STATION":"USW00014739","AWND":10.3,"PRCP":0.0,"SNOW":1.2,
         "SNWD":3.0,"TAVG":28.5,"TMIN":21.0,"TMAX":35.0,
         "DATE":"2021-01-04"}""".replaceAll("\n\\s*", "")
    val out = KafkaTopics.decodeJsonTopic(wire(Seq(msg), "weatherdata"),
      KafkaTopics.weatherSchema)
    // decoded columns carry the descriptor types, then the wire position
    assert(out.schema.fields.take(9).map(f => (f.name, f.dataType)).toSeq
      === KafkaTopics.weatherSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = out.collect().head
    assert(r.getString(0) === "USW00014739")
    assert(r.getDouble(1) === 10.3 && r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 1.2 && r.getDouble(4) === 3.0)
    assert(r.getDouble(5) === 28.5 && r.getDouble(6) === 21.0)
    assert(r.getDouble(7) === 35.0)
    assert(r.getDate(8) === Date.valueOf("2021-01-04"))
    assert(r.getString(9) === "weatherdata" && r.getLong(11) === 0L)
  }

  test("stockdata messages decode; malformed and null-field messages survive") {
    val good =
      """{"date":"2021-02-16","apple_price":133.19,"volume":80576316,
         "low":132.79,"high":136.01,"open":135.49}"""
        .replaceAll("\n\\s*", "")
    val missing = """{"date":"2021-02-17","apple_price":130.84}"""
    val malformed = """not json at all"""
    val out = KafkaTopics.decodeJsonTopic(
      wire(Seq(good, missing, malformed), "stockdata"),
      KafkaTopics.stockSchema).orderBy("offset")
    val rs = out.collect()
    assert(rs.length === 3)
    assert(rs(0).getDate(0) === Date.valueOf("2021-02-16"))
    assert(rs(0).getDouble(1) === 133.19 && rs(0).getLong(2) === 80576316L)
    assert(rs(0).getDouble(3) === 132.79 && rs(0).getDouble(4) === 136.01)
    assert(rs(0).getDouble(5) === 135.49)
    // absent fields decode as NULL, present ones still typed
    assert(rs(1).getDouble(1) === 130.84 && rs(1).isNullAt(2))
    // a malformed message nulls the payload columns, never kills the read
    assert(rs(2).isNullAt(0) && rs(2).isNullAt(1))
    assert(rs(2).getString(6) === "stockdata")
  }

  test("timestamp-bounded reader options spell the connector's offset " +
      "JSON exactly") {
    val opts = KafkaTopics.kafkaReaderOptions("broker:9092", "weatherdata",
      partitions = 3, startMs = Some(1609718400000L),
      endMs = Some(1609804800000L))
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    assert(opts("subscribe") === "weatherdata")
    assert(opts("failOnDataLoss") === "true")
    assert(opts("startingOffsetsByTimestamp") ===
      """{"weatherdata": {"0": 1609718400000, "1": 1609718400000,""" +
        """ "2": 1609718400000}}""")
    assert(opts("endingOffsetsByTimestamp") ===
      """{"weatherdata": {"0": 1609804800000, "1": 1609804800000,""" +
        """ "2": 1609804800000}}""")
    // unbounded read omits the offset keys entirely (connector default)
    val plain = KafkaTopics.kafkaReaderOptions("b:9092", "stockdata", 1)
    assert(!plain.contains("startingOffsetsByTimestamp") &&
      !plain.contains("endingOffsetsByTimestamp"))
  }

  test("kafkaBatchRead plans against the connector when present, fails " +
      "with the data-source-lookup error when absent") {
    if (KafkaTopics.connectorAvailable) {
      // with the jar on the classpath the full read must ANALYZE: the
      // decoded schema is the descriptor columns + source positions
      val df = KafkaTopics.kafkaBatchRead(spark, "broker:9092",
        "weatherdata", KafkaTopics.weatherSchema, partitions = 3,
        startMs = Some(1609718400000L))
      val names = df.schema.fields.map(_.name)
      assert(names.startsWith(
        KafkaTopics.weatherSchema.fields.map(_.name)))
      assert(names.takeRight(4).toSeq ===
        Seq("topic", "partition", "offset", "timestamp"))
    } else {
      // this sandbox ships no spark-sql-kafka jar: pin the exact
      // failure mode (source lookup, naming kafka) so a production
      // misconfiguration is diagnosable and our availability probe
      // agrees with Spark's own lookup
      val e = intercept[Throwable] {
        KafkaTopics.kafkaBatchRead(spark, "broker:9092", "weatherdata",
          KafkaTopics.weatherSchema, partitions = 3)
      }
      val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
      assert(msg.toLowerCase.contains("kafka"), msg)
    }
  }
}
