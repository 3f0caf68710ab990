package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal private[sql] bridge: build a DataFrame from a custom logical
  * plan (Dataset.ofRows is private[sql]; extensions conventionally reach
  * it from a package under org.apache.spark.sql). Only used by
  * graft.operators.Similarity.annCustomTopk and the plan specs.
  *
  * `plan` should be analyzed on `spark` (leaf nodes hold session-owned
  * state). Note the rounds-3/4 `sbt test` SIGSEGV once blamed on a
  * cross-session ofRows was actually ColumnPruning planting empty
  * Projects under a custom node with an empty `references` set — fixed
  * in CosineTopKJoin.references, guarded by CosineTopKJoinExec's child
  * schema `require` (misuse now throws instead of segfaulting). */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
