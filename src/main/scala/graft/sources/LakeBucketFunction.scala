package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The lake catalog's hash-routing function, published as a DSv2
  * catalog function so Spark can REASON about the layout, not just
  * read it.
  *
  * `bucket(n, key) = floorMod(key, n)` is exactly how
  * [[GraftLakeDataWriter]] places rows into shard files, and the name
  * `bucket` is the one [[org.apache.spark.sql.catalyst.expressions
  * .V2ExpressionUtils]] resolves when a scan reports a
  * `bucket(n, col)` transform in its `KeyGroupedPartitioning`: Spark
  * loads `bucket` from the table's own catalog (`FunctionCatalog`),
  * binds it against `(int, <key type>)`, and uses the bound
  * function's `canonicalName` to prove two scans share a partitioning
  * — the storage-partitioned-join handshake (SPARK-37375). Publishing
  * the function (rather than only tagging partitions) is what lets
  * Spark also SHUFFLE a non-lake side with this exact function when
  * only one side is a lake table
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`), so
  * `produceResult` must be the real routing computation, not a
  * compatibility stub.
  *
  * Reference scope: the Trino demo's connectors declare their
  * physical layout to the engine the same way (a Trino connector's
  * table-properties handshake feeding co-located join planning);
  * `fill_postgresql.sql:1-10` is the ingest whose keyed layout this
  * preserves.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, key): floorMod(key, n) — the graft_lake hash routing; " +
      "shard k of an n-sharded table holds exactly the keys with " +
      "bucket(n, key) = k"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.length != 2)
      throw new UnsupportedOperationException(
        s"bucket expects (numBuckets INT, key), got $inputType")
    val keyType = inputType(1).dataType
    keyType match {
      case LongType | IntegerType | ShortType | ByteType =>
        new GraftBoundBucket(keyType)
      case other =>
        throw new UnsupportedOperationException(
          s"bucket: unsupported key type $other (integral keys only " +
            "— the lake routes by integral shard keys)")
    }
  }
}

/** Bound form of [[GraftBucketFunction]]. `canonicalName` is
  * deliberately key-width-independent: a BIGINT-keyed and an
  * INT-keyed table bucket identically after widening (floorMod over
  * long), so their scans ARE co-partitioned and must compare equal in
  * Spark's `TransformExpression.isSameFunction`. */
final class GraftBoundBucket(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val key = keyType match {
      case LongType => input.getLong(1)
      case IntegerType => input.getInt(1).toLong
      case ShortType => input.getShort(1).toLong
      case _ => input.getByte(1).toLong
    }
    Integer.valueOf(java.lang.Math.floorMod(key, n.toLong).toInt)
  }

  // ScalarFunction MAGIC METHODS: Spark compiles an Invoke call to
  // these instead of the boxed produceResult row path — this is what
  // keeps a clustered-write (or one-sided-SPJ) shuffle's hash
  // computation inside whole-stage codegen
  def invoke(numBuckets: Int, key: Long): Int =
    java.lang.Math.floorMod(key, numBuckets.toLong).toInt
  def invoke(numBuckets: Int, key: Int): Int =
    java.lang.Math.floorMod(key.toLong, numBuckets.toLong).toInt
  def invoke(numBuckets: Int, key: Short): Int =
    java.lang.Math.floorMod(key.toLong, numBuckets.toLong).toInt
  def invoke(numBuckets: Int, key: Byte): Int =
    java.lang.Math.floorMod(key.toLong, numBuckets.toLong).toInt
}
