package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * Bridge for custom-operator plumbing: wrapping an analyzed plan in a custom
 * logical node (graft.plans.DetectTriplesNode) and turning the wrapped plan
 * back into a DataFrame both need `private[sql]` classic-session entry
 * points. This shim (inside the sql package — the public technique Spark's
 * own `functions` uses) re-exports exactly the two the engine needs.
 */
object InternalRowShim {

  /** Analyzed logical plan of a DataFrame (for wrapping in custom operators). */
  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** DataFrame over a custom logical plan (Dataset.ofRows is private[sql]). */
  def logicalDf(spark: SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /**
   * Release the block-manager storage behind a `localCheckpoint`ed Dataset.
   * `Dataset.unpersist` only covers CacheManager-registered `.cache()` entries;
   * a local checkpoint persists its RDD directly, reachable only through the
   * `private[sql]` `LogicalRDD` node. Iterative operators (graft.operators
   * .Closure) call this on superseded iterations so a long loop doesn't pin
   * O(rounds) copies of the edge set in executor memory. No-op on Datasets
   * that aren't checkpoint-backed.
   */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    logicalPlan(df) match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
