package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `Dataset.ofRows` (private[sql]): build a DataFrame from an
  * already-resolved logical plan. Used to reuse a RESOLVED scan relation
  * across queries without re-running datasource resolution (file listing +
  * relation construction) on every call — the measured ~10 ms/analysis
  * `ResolveDataSource` tail the bench pays on each of 200+ queries × reps.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame over a FRESH instance of a resolved leaf relation — fresh
    * expression ids and fresh plan-node lazy state per call, exactly what a
    * fresh `spark.read` would produce, while reusing the resolved relation's
    * expensive innards (file index, schema, options). None when the plan
    * isn't a multi-instance leaf, OR when the session isn't the classic
    * implementation `ofRows` requires — [[graft.Readers.sessionKey]]
    * tolerates non-classic sessions, so this path must degrade to the
    * caller's real-read fallback for them instead of throwing a
    * ClassCastException out of the Option contract.
    */
  def freshRows(spark: SparkSession, plan: LogicalPlan): Option[DataFrame] =
    (spark, plan) match {
      case (s: org.apache.spark.sql.classic.SparkSession,
            m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation)
          if plan.children.isEmpty =>
        Some(org.apache.spark.sql.classic.Dataset.ofRows(s, m.newInstance()))
      case _ => None
    }
}
