package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal private[sql] bridge: build a DataFrame from a custom logical
  * plan (Dataset.ofRows is private[sql]; extensions conventionally reach
  * it from a package under org.apache.spark.sql). Only used by
  * graft.operators.Similarity.annCustomTopk.
  *
  * CONTRACT: `plan` must have been analyzed on `spark` (or a plan built
  * from scratch against `spark`-owned relations). Executing a plan
  * analyzed on a DIFFERENT session is undefined behavior in Spark —
  * leaf nodes (ExternalRDD/LogicalRDD/FileSourceScan) hold state owned
  * by their origin session, and in this environment a spark-analyzed
  * plan run through ofRows(otherSession, …) reproducibly crashed the
  * JVM (SIGSEGV in UnsafeRow.getLong reading the scan's rows; JDK
  * 17.0.20, Spark 4.1.2 — see AdviceFixesSpec "scores zero norms NULL"
  * which now builds its inputs on the isolated session). The production
  * path is safe by construction: RewriteCosineTopK rewrites subplans of
  * the very query the session is executing. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
