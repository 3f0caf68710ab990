package graft.sources

import org.apache.spark.sql.catalyst.analysis.NoSuchViewException
import org.apache.spark.sql.connector.catalog.{Identifier, View,
  ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

/** Catalog-persisted SQL VIEWS for the lake catalog — Spark 4's DSv2
  * `ViewCatalog` stack (reference scope: Trino connectors store views
  * in the connector's own metastore; `CREATE VIEW` / `SELECT` /
  * `SHOW VIEWS` / `DROP VIEW` work against the catalog, not the
  * session). The view definition — SQL text, capture-time
  * catalog/namespace context, declared schema, column lineage — is a
  * JSON descriptor (`<name>.view.json`) beside the table
  * descriptors; Spark re-parses and re-resolves the stored SQL in
  * the stored context at read time, so a view over a lake table
  * always reflects the table's CURRENT snapshot. */
object GraftLakeViews {

  private def om = new com.fasterxml.jackson.databind.ObjectMapper()

  def viewFile(root: String, name: String): java.io.File =
    new java.io.File(root, s"$name.view.json")

  def list(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".view.json"))
      .map(_.getName.stripSuffix(".view.json")).sorted.toSeq

  def write(root: String, info: ViewInfo): Unit = {
    val d = om.createObjectNode()
    d.put("sql", info.sql()): Unit
    d.put("currentCatalog", info.currentCatalog()): Unit
    val nsArr = d.putArray("currentNamespace")
    info.currentNamespace().foreach(nsArr.add(_): Unit)
    d.put("schema", info.schema().json): Unit
    def arr(k: String, v: Array[String]): Unit = {
      val a = d.putArray(k)
      Option(v).getOrElse(Array.empty[String]).foreach(a.add(_): Unit)
    }
    arr("queryColumnNames", info.queryColumnNames())
    arr("columnAliases", info.columnAliases())
    arr("columnComments", info.columnComments())
    val props = d.putObject("properties")
    info.properties().forEach((k, v) => props.put(k, v): Unit)
    val f = viewFile(root, info.ident().name())
    val tmp = new java.io.File(root,
      s"${info.ident().name()}.view.json.tmp" +
        ProcessHandle.current().pid())
    java.nio.file.Files.writeString(tmp.toPath, om.writeValueAsString(d))
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def read(root: String, ident: Identifier): View = {
    val f = viewFile(root, ident.name())
    if (!f.exists()) throw new NoSuchViewException(ident)
    val d = om.readTree(java.nio.file.Files.readString(f.toPath))
    def arr(k: String): Array[String] = {
      val b = Array.newBuilder[String]
      d.get(k).forEach(n => b += n.asText())
      b.result()
    }
    new View {
      override def name(): String = ident.name()
      override def query(): String = d.get("sql").asText()
      override def currentCatalog(): String =
        d.get("currentCatalog").asText()
      override def currentNamespace(): Array[String] =
        arr("currentNamespace")
      override def schema(): StructType =
        DataType.fromJson(d.get("schema").asText())
          .asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] =
        arr("queryColumnNames")
      override def columnAliases(): Array[String] =
        arr("columnAliases")
      override def columnComments(): Array[String] =
        arr("columnComments")
      override def properties(): java.util.Map[String, String] = {
        val m = new java.util.HashMap[String, String]()
        d.get("properties").properties().forEach(e =>
          m.put(e.getKey, e.getValue.asText()): Unit)
        m
      }
    }
  }

  def applyChanges(root: String, ident: Identifier,
      changes: Seq[ViewChange]): Unit = {
    val f = viewFile(root, ident.name())
    if (!f.exists()) throw new NoSuchViewException(ident)
    val d = om.readTree(java.nio.file.Files.readString(f.toPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val props = d.get("properties")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    changes.foreach {
      case p: ViewChange.SetProperty =>
        props.put(p.property(), p.value()): Unit
      case r: ViewChange.RemoveProperty =>
        props.remove(r.property()): Unit
      case other => throw new UnsupportedOperationException(
        s"view change $other")
    }
    // stage + ATOMIC_MOVE like write(): an in-place rewrite could show
    // a concurrent reader a torn descriptor mid-ALTER
    val tmp = new java.io.File(root,
      s"${ident.name()}.view.json.tmp" + ProcessHandle.current().pid())
    java.nio.file.Files.writeString(tmp.toPath, om.writeValueAsString(d))
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }
}
