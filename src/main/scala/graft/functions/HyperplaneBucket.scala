package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, LongType}

/**
 * Sign-bit hyperplane LSH bucket of a vector column — native Catalyst
 * expression. The `transform`/`aggregate`-composition alternative builds an
 * (nPlanes × dim)-literal expression tree that janino chokes on (measured
 * seconds of compile per plan); here the planes live in one reference object
 * and the kernel is a tight loop.
 */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  // bucket bits live in one Long; `1L << p` for p >= 64 would silently wrap
  // and alias plane p onto plane p-64's bit (recall degrades with no error)
  require(planes.nonEmpty && planes.length <= 64,
    s"hyperplane bucket supports 1..64 planes, got ${planes.length}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket requires array<float> or array<double>, got ${other.catalogString}")
    }

  private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      val lim = math.min(n, plane.length)
      var i = 0
      if (elementIsFloat) {
        while (i < lim) { dot += arr.getFloat(i) * plane(i); i += 1 }
      } else {
        while (i < lim) { dot += arr.getDouble(i) * plane(i); i += 1 }
      }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("hpBucket", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refName.kernel($c);")
  }

  override def prettyName: String = "hyperplane_bucket"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  def apply(c: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      HyperplaneBucket(org.apache.spark.sql.graftshim.ColumnShim.expr(c), planes))
}
