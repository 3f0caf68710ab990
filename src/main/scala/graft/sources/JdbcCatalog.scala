package graft.sources

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Named JDBC catalog (a Spark `CatalogPlugin`): binds the embedded
  * Derby engine as a SECOND catalog next to `spark_catalog`,
  * replicating the reference's multi-catalog surface — `SHOW CATALOGS`
  * listing several live catalogs
  * (`vanilla_k8s_trino_demo_installation.txt:764`) and the flagship
  * cross-catalog three-part-name join
  * (`local_demo_setup/localTrinoTest.ipynb:119-121`:
  * `mongodb.weather.weatherny ⋈ trinodemo.public.applehistory`).
  *
  * Deliberately a thin subclass of Spark's stock DSv2
  * [[JDBCTableCatalog]]: namespace/table resolution, remote predicate
  * pushdown, dialect type mapping and partitioned reads are all
  * inherited (don't hand-roll what Catalyst already federates); the
  * only specialization is baking in the embedded Derby driver so a
  * session binds the catalog with a single conf key (the url) — the
  * analog of the reference's one-file `trinodemo.properties`. Swapping
  * to a networked PostgreSQL is the same one-line url change as in
  * [[Jdbc]]. */
class GraftJdbcCatalog extends JDBCTableCatalog {
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    val merged = new JHashMap[String, String](options.asCaseSensitiveMap())
    merged.putIfAbsent("driver", Jdbc.derbyDriver)
    super.initialize(name, new CaseInsensitiveStringMap(merged))
  }
}
