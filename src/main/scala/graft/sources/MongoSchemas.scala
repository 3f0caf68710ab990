package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB declared-schema binding — the Spark side of the reference's
  * Mongo connector setup (`local_demo_setup/fillMongoDB.ipynb`: the
  * `schemadef` collection declares `weatherny`'s columns/types for
  * Trino; `trino/catalog/mongodb.properties:1-3` points the connector
  * at it). Two layers, both testable without a Mongo server:
  *
  *   1. `schemadefToStruct` — parse the reference's descriptor document
  *      format (`{"table": ..., "fields": [{name, type, hidden}]}`)
  *      into a `StructType`, honoring `hidden` exactly as the reference
  *      connector does (hidden columns don't surface in `SELECT *`).
  *   2. `decodeExtendedJson` — decode documents serialized as MongoDB
  *      CANONICAL EXTENDED JSON (the wire/dump format: datetimes as
  *      `{"$date": "..."}`), first through a derived wire schema, then
  *      projecting the `$date` envelopes to native timestamps.
  *
  * The production swap is `spark.read.format("mongodb")` (the Mongo
  * Spark connector decodes BSON natively and takes the same declared
  * `StructType` via `.schema(...)`); layer 1 is shared verbatim, layer
  * 2 is the broker-less stand-in this sandbox can exercise
  * (MongoSchemasSpec decodes reference-shaped literals end-to-end).
  */
object MongoSchemas {

  /** The `weatherny` schemadef (`fillMongoDB.ipynb` last cell): `_id`
    * Date + eight Double measures. */
  val weatherNyDescriptor: String =
    """{"table": "weatherny", "fields": [
       {"name": "_id", "type": "Date", "hidden": false},
       {"name": "awnd", "type": "Double", "hidden": false},
       {"name": "pgtm", "type": "Double", "hidden": false},
       {"name": "prcp", "type": "Double", "hidden": false},
       {"name": "snow", "type": "Double", "hidden": false},
       {"name": "snwd", "type": "Double", "hidden": false},
       {"name": "tavg", "type": "Double", "hidden": false},
       {"name": "tmax", "type": "Double", "hidden": false},
       {"name": "tmin", "type": "Double", "hidden": false}]}"""

  /** Descriptor type name → Spark type (the reference dialect uses
    * Trino-ish names: Date is a BSON datetime → TimestampType). */
  private def sparkType(t: String): DataType = t match {
    case "Date" => TimestampType
    case "Double" => DoubleType
    case "String" | "ObjectId" => StringType
    case "Long" | "Int64" => LongType
    case "Int" | "Int32" => IntegerType
    case "Boolean" => BooleanType
    case other =>
      throw new IllegalArgumentException(s"unmapped schemadef type: $other")
  }

  /** Parse a schemadef document into the declared scan schema,
    * excluding `hidden` fields. Driver-side, tiny, pure. */
  def schemadefToStruct(descriptorJson: String): StructType = {
    // parse with Spark's own JSON machinery via a literal one-row frame?
    // No session needed: the descriptor grammar is flat, so a minimal
    // hand parse keeps this usable at session-build time. Jackson ships
    // with Spark.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(descriptorJson)
    val fields = root.get("fields")
    require(fields != null && fields.isArray,
      "schemadef document has no fields array")
    val out = (0 until fields.size()).iterator.map(fields.get).collect {
      case f if !f.path("hidden").asBoolean(false) =>
        StructField(f.get("name").asText, sparkType(f.get("type").asText))
    }
    StructType(out.toSeq)
  }

  /** Inverse of [[schemadefToStruct]]: render a declared StructType as
    * a schemadef descriptor document — what the write path persists for
    * a CREATEd collection, so the catalog re-derives the exact declared
    * schema on the next loadTable (the ingest direction of the
    * reference's descriptor discipline: `fillMongoDB.ipynb` creates the
    * collection, the schemadef declares it to the engine). */
  def structToSchemadef(table: String, schema: StructType): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("table", table): Unit
    val arr = root.putArray("fields")
    schema.fields.foreach { f =>
      val n = arr.addObject()
      n.put("name", f.name): Unit
      n.put("type", f.dataType match {
        case TimestampType => "Date"
        case DoubleType => "Double"
        case StringType => "String"
        case LongType => "Long"
        case IntegerType => "Int"
        case BooleanType => "Boolean"
        case other => throw new IllegalArgumentException(
          s"unmapped type for document collection field ${f.name}: $other")
      }): Unit
      n.put("hidden", false): Unit
    }
    om.writeValueAsString(root)
  }

  /** The wire-level schema for canonical extended JSON: every declared
    * TimestampType arrives as `{"$date": <iso-string>}`. */
  def wireSchema(declared: StructType): StructType =
    StructType(declared.map {
      case StructField(n, TimestampType, _, _) =>
        StructField(n, StructType(Seq(StructField("$date", StringType))))
      case f => f
    })

  /** Decode a column of canonical-extended-JSON documents into the
    * declared columns. */
  def decodeExtendedJson(docs: DataFrame, jsonCol: String,
      declared: StructType): DataFrame = {
    val decoded = docs.select(
      from_json(col(jsonCol), wireSchema(declared)).as("doc"))
    val cols: Seq[Column] = declared.map {
      case StructField(n, TimestampType, _, _) =>
        to_timestamp(col(s"doc.`$n`.`$$date`")).as(n)
      case StructField(n, _, _, _) => col(s"doc.`$n`").as(n)
    }
    decoded.select(cols: _*)
  }
}
