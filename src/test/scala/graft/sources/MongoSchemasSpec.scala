package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Schema-mapping evidence for the MongoDB declared-schema binding:
  * the reference's actual `schemadef` descriptor for `weatherny`
  * (`fillMongoDB.ipynb` last cell) derives the scan StructType, and a
  * canonical-extended-JSON document shaped like the collection's rows
  * decodes field-for-field — the broker-less analog of the Mongo Spark
  * connector's BSON decode. */
class MongoSchemasSpec extends SparkSpec {

  test("the weatherny schemadef derives the declared scan schema") {
    val st = MongoSchemas.schemadefToStruct(MongoSchemas.weatherNyDescriptor)
    assert(st.fieldNames.toSeq === Seq("_id", "awnd", "pgtm", "prcp",
      "snow", "snwd", "tavg", "tmax", "tmin"))
    assert(st("_id").dataType === TimestampType)
    assert(st.fields.drop(1).forall(_.dataType === DoubleType))
  }

  test("hidden descriptor fields stay out of the scan schema") {
    val st = MongoSchemas.schemadefToStruct(
      """{"table": "t", "fields": [
         {"name": "visible", "type": "String", "hidden": false},
         {"name": "secret", "type": "ObjectId", "hidden": true}]}""")
    assert(st.fieldNames.toSeq === Seq("visible"))
  }

  test("canonical extended JSON documents decode field-for-field") {
    import spark.implicits._
    val doc =
      """{"_id": {"$date": "2021-01-04T00:00:00Z"}, "awnd": 10.3,
         "pgtm": 0.0, "prcp": 0.12, "snow": 0.0, "snwd": 0.0,
         "tavg": 28.0, "tmax": 35.0, "tmin": 21.0}"""
        .replaceAll("\n\\s*", " ")
    val declared =
      MongoSchemas.schemadefToStruct(MongoSchemas.weatherNyDescriptor)
    val out = MongoSchemas.decodeExtendedJson(
      Seq(doc).toDF("json"), "json", declared)
    assert(out.schema("_id").dataType === TimestampType)
    val r = out.collect().head
    assert(r.getTimestamp(0) ===
      java.sql.Timestamp.valueOf("2021-01-04 00:00:00"))
    assert(r.getDouble(1) === 10.3 && r.getDouble(3) === 0.12)
    assert(r.getDouble(7) === 35.0 && r.getDouble(8) === 21.0)
  }
}
