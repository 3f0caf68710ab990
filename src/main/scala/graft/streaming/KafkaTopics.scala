package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared-schema JSON topic decoding — the Spark binding of the
  * reference's Kafka table descriptors (`trino/kafka/weatherdata.json:
  * 5-54`, `trino/kafka/stockdata.json:5-40`). The reference maps each
  * topic's JSON messages to typed columns via a descriptor file; here
  * the descriptor is a `StructType` and the mapping is `from_json` over
  * the Kafka wire record's `value` bytes.
  *
  * Type mapping from the descriptor dialect:
  *   VARCHAR → StringType, DOUBLE → DoubleType, BIGINT → LongType,
  *   DATE (dataFormat iso8601) → DateType (from_json parses ISO-8601
  *   date literals natively).
  *
  * The production binding is exactly:
  * {{{
  * decodeJsonTopic(
  *   spark.readStream.format("kafka")
  *     .option("kafka.bootstrap.servers", brokers)
  *     .option("subscribe", "weatherdata").load(),
  *   weatherSchema)
  * }}}
  * and the harness's file-replay streams swap only the `.format`/source
  * line (Streams.scala). KafkaTopicsSpec feeds literal JSON through the
  * same wire-record shape and asserts field-for-field decode, so the
  * schema + decode layer is tested without a broker (zero-egress env).
  */
object KafkaTopics {

  /** `trino/kafka/weatherdata.json:5-54` (topic `weatherdata`). */
  val weatherSchema: StructType = StructType(Seq(
    StructField("STATION", StringType),
    StructField("AWND", DoubleType),
    StructField("PRCP", DoubleType),
    StructField("SNOW", DoubleType),
    StructField("SNWD", DoubleType),
    StructField("TAVG", DoubleType),
    StructField("TMIN", DoubleType),
    StructField("TMAX", DoubleType),
    StructField("DATE", DateType)))

  /** `trino/kafka/stockdata.json:5-40` (topic `stockdata`). */
  val stockSchema: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("apple_price", DoubleType),
    StructField("volume", LongType),
    StructField("low", DoubleType),
    StructField("high", DoubleType),
    StructField("open", DoubleType)))

  /** The Kafka source's fixed wire schema (what `format("kafka")`
    * emits per record, batch or streaming). Kept here so tests can
    * construct wire-shaped frames and so `decodeJsonTopic` documents
    * exactly what it consumes. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Decode a Kafka wire-record frame's JSON `value` payload into the
    * declared topic columns, keeping the source position columns
    * (topic/partition/offset/timestamp) for offset bookkeeping. A
    * malformed message yields NULL topic columns (from_json PERMISSIVE
    * default) rather than failing the stream — the reference's
    * descriptor-mapped reads are likewise non-failing per message. */
  def decodeJsonTopic(wire: DataFrame, schema: StructType): DataFrame = {
    val cols: Seq[Column] = Seq(col("msg.*"), col("topic"),
      col("partition"), col("offset"), col("timestamp"))
    wire
      .select(from_json(col("value").cast("string"), schema).as("msg"),
        col("topic"), col("partition"), col("offset"), col("timestamp"))
      .select(cols: _*)
  }
}
