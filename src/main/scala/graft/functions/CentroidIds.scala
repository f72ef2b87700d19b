package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/**
 * `nprobe` nearest centroids (by L2) of a vector column — the IVF
 * assignment/probe kernel as a native Catalyst expression. Centroids live in
 * ONE reference object (a `transform`/`aggregate` composition would inline an
 * nLists×dim literal tree per row — the janino-compile trap HyperplaneBucket
 * documents). Returns array<int> of centroid ids, nearest first.
 */
case class CentroidIds(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // fail at ANALYSIS, not with a ClassCastException at eval, when the child
  // isn't a float/double array
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_ids requires array<float>/array<double> input, got ${other.catalogString}")
    }

  private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(kernel(input.asInstanceOf[ArrayData]))

  def kernel(arr: ArrayData): Array[Int] = {
    val n = arr.numElements()
    val m = centroids.length
    val d2 = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cen = centroids(c)
      var s = 0.0
      val lim = math.min(n, cen.length)
      var i = 0
      if (elementIsFloat) {
        while (i < lim) { val diff = arr.getFloat(i) - cen(i); s += diff * diff; i += 1 }
      } else {
        while (i < lim) { val diff = arr.getDouble(i) - cen(i); s += diff * diff; i += 1 }
      }
      d2(c) = s
      c += 1
    }
    // partial selection of the nprobe smallest (nprobe is tiny)
    val k = math.min(nprobe, m)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](m)
    var j = 0
    while (j < k) {
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < m) {
        if (!taken(i) && d2(i) < bestD) { bestD = d2(i); best = i }
        i += 1
      }
      if (best < 0) {
        // every remaining distance is NaN (a NaN element poisons s, and
        // NaN < bestD never holds) — one bad embedding must not kill the IVF
        // job; fall back to the first untaken list deterministically
        var i2 = 0
        while (best < 0 && i2 < m) { if (!taken(i2)) best = i2; i2 += 1 }
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("centroidIds", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $refName.kernel($c));""".stripMargin)
  }

  override def prettyName: String = "centroid_ids"
  override protected def withNewChildInternal(newChild: Expression): CentroidIds =
    copy(child = newChild)
}

object CentroidIds {
  def apply(c: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      CentroidIds(org.apache.spark.sql.graftshim.ColumnShim.expr(c), centroids, nprobe))
}
