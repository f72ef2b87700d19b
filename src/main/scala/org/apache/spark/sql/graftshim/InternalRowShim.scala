package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * Bridge for InternalRow-grain pipelines. The hot mention-detection kernel
 * scans `UTF8String` bytes straight out of Tungsten rows (no java.lang.String
 * materialization per turn — measured allocation wall at 32 threads) and
 * emits InternalRows; the classic-session constructors for that are
 * `private[sql]`, so this shim (inside the sql package, public Spark API
 * technique) re-exports exactly the two entry points the engine needs.
 */
object InternalRowShim {

  /** Physical-plan RDD of a DataFrame (rows may be reused — copy if retained). */
  def toInternalRdd(df: Dataset[_]): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.toRdd

  /** DataFrame over an RDD of InternalRows with the given schema. */
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Analyzed logical plan of a DataFrame (for wrapping in custom operators). */
  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** DataFrame over a custom logical plan (Dataset.ofRows is private[sql]). */
  def logicalDf(spark: SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
