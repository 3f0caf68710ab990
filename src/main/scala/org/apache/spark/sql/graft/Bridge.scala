package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal private[sql] bridge: build a DataFrame from a custom logical
  * plan (Dataset.ofRows is private[sql]; extensions conventionally reach
  * it from a package under org.apache.spark.sql). Only used by
  * graft.operators.Similarity.annCustomTopk. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
