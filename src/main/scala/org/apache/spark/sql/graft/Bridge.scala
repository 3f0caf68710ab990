package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.{ExternalRDD, LogicalRDD}

/** Minimal private[sql] bridge: build a DataFrame from a custom logical
  * plan (Dataset.ofRows is private[sql]; extensions conventionally reach
  * it from a package under org.apache.spark.sql). Only used by
  * graft.operators.Similarity.annCustomTopk and the plan specs.
  *
  * `plan` must be analyzed on `spark` — session-bound leaf nodes
  * (LogicalRDD / ExternalRDD) carry their owning session, and executing
  * them under a different one historically manifested as native crashes
  * deep in codegen rather than a diagnosable error. The contract is now
  * ENFORCED: ofRows walks the plan's leaves and throws
  * IllegalArgumentException on a foreign-session leaf instead of
  * executing it. (The rounds-3/4 `sbt test` SIGSEGV once blamed on a
  * cross-session ofRows was actually ColumnPruning planting empty
  * Projects under a custom node with an empty `references` set — fixed
  * in CosineTopKJoin.references, guarded by CosineTopKJoinExec's child
  * schema `require` — but the affinity hazard is real independent of
  * that bug.) */
object Bridge extends org.apache.spark.internal.Logging {

  // LogicalRDD/ExternalRDD keep their session in a private constructor
  // field (no accessor in Spark 4.1); read it reflectively once per
  // class. If a Spark upgrade renames the field the guard cannot run —
  // warn (once per class) instead of disabling it silently, so the
  // AdviceFixesSpec failure that follows is diagnosable.
  private val unguardedClasses =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Class[_]]()
  private def leafSession(leaf: AnyRef): Option[AnyRef] =
    try {
      val f = leaf.getClass.getDeclaredField("session")
      f.setAccessible(true)
      Option(f.get(leaf))
    } catch {
      case _: NoSuchFieldException =>
        if (unguardedClasses.add(leaf.getClass))
          logWarning(s"Bridge session-affinity guard disabled for " +
            s"${leaf.getClass.getName}: no 'session' field (Spark " +
            "internals changed?) — cross-session leaves will no longer " +
            "be rejected")
        None
    }

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val cs = spark.asInstanceOf[CSparkSession]
    plan.foreach {
      case leaf @ (_: LogicalRDD | _: ExternalRDD[_]) =>
        leafSession(leaf).foreach { owner =>
          require(owner eq cs,
            s"Bridge.ofRows: leaf ${leaf.getClass.getSimpleName} is bound" +
              " to a different SparkSession than the one executing the" +
              " plan — re-analyze the plan on the executing session" +
              " (cross-session leaves break codegen/state resolution)")
        }
      case _ =>
    }
    CDataset.ofRows(cs, plan)
  }

  /** Set a key in the CONTEXT SparkConf (private[spark]; no public
    * runtime accessor). Deployment-level bindings — catalog
    * definitions a server's fresh per-connection sessions must
    * inherit — live here, exactly where spark-defaults.conf entries
    * land; the ThriftServerSpec uses this to model that deployment
    * without restarting the shared test JVM's context. */
  def setContextConf(spark: SparkSession, key: String,
      value: String): Unit =
    spark.sparkContext.conf.set(key, value): Unit

  /** Run `f` with analyzer transform assertions lifted
    * (AnalysisHelper.allowInvokingTransformsInAnalyzer is
    * private[sql]). RewriteTrinoTablesample is a POST-HOC RESOLUTION
    * rule — it must rewrite tagged Sample nodes before the optimizer
    * runs, because optimizer rules (ColumnPruning) rebuild Sample via
    * case-class copy(), which drops TreeNode tags — and its body uses
    * plain transformUp, which the analyzer guards in Spark-testing
    * builds. */
  def allowTransformsInAnalyzer[T](f: => T): T =
    org.apache.spark.sql.catalyst.plans.logical.AnalysisHelper
      .allowInvokingTransformsInAnalyzer(f)
}
