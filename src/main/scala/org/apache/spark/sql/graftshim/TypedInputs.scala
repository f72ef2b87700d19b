package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, DataType}

/**
 * Bridge for analysis-time input typing: `ExpectsInputTypes.inputTypes`
 * returns `Seq[AbstractDataType]`, and `AbstractDataType` is `private[sql]`
 * in Spark 4 — an expression outside the sql package cannot override it
 * directly. This trait (inside the sql package, like the other graftshim
 * re-exports) narrows the contract to the public `DataType`, which is all
 * the engine's expressions need.
 */
trait TypedInputs extends ImplicitCastInputTypes {
  /** Expected child types, one per child (concrete types only). */
  def expectedInputTypes: Seq[DataType]
  override def inputTypes: Seq[AbstractDataType] = expectedInputTypes
}
