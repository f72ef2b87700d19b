package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
 * polynomial ROLLING hash over every k-gram of the text, then the minimum
 * hash of each sliding window of `w` consecutive k-grams (rightmost-min
 * tie-break), deduplicated in document order. Guarantees any shared
 * substring of length ≥ k + w - 1 contributes at least one common
 * fingerprint — the standard near-dup/plagiarism sketch.
 *
 * Native Catalyst expression: the rolling-hash loop is the whole point (a
 * HOF formulation would rehash every k-gram from scratch, O(k) per
 * position instead of O(1)).
 */
case class WinnowingSketch(child: Expression, k: Int = 8, w: Int = 4)
  extends UnaryExpression
  with org.apache.spark.sql.graftshim.TypedInputs {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def expectedInputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.StringType)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowingSketch.sketch(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("winnow", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowingSketch.sketch($c.toString(), ${k}, ${w}));""".stripMargin)
  }

  override def prettyName: String = "winnowing_sketch"
  override protected def withNewChildInternal(newChild: Expression): WinnowingSketch =
    copy(child = newChild)
}

object WinnowingSketch {

  private val Base = 1000003L

  /** Rolling k-gram hashes + winnowing window minima, deduped in order. */
  def sketch(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array(SimHash64.mix64(polyHash(text, 0, n)))

    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // pow = Base^(k-1) for the rolling subtraction
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    var h = polyHash(text, 0, k)
    hashes(0) = SimHash64.mix64(h)
    i = 1
    while (i < nGrams) {
      // O(1) roll: drop text[i-1], append text[i+k-1]
      h = (h - text.charAt(i - 1) * pow) * Base + text.charAt(i + k - 1)
      hashes(i) = SimHash64.mix64(h)
      i += 1
    }

    if (nGrams <= w) return Array(hashes.min)

    val out = new scala.collection.mutable.ArrayBuffer[Long]
    var lastPicked = -1
    var win = 0
    while (win <= nGrams - w) {
      // rightmost minimum of hashes[win, win+w)
      var minIdx = win
      var j = win + 1
      while (j < win + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastPicked) { out += hashes(minIdx); lastPicked = minIdx }
      win += 1
    }
    out.toArray
  }

  private def polyHash(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = h * Base + s.charAt(i); i += 1 }
    h
  }

  def winnowing_sketch(c: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      WinnowingSketch(org.apache.spark.sql.graftshim.ColumnShim.expr(c), k, w))
}
