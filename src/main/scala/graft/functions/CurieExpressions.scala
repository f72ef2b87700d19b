package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.TypedInputs
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.curie.Converter

/**
 * Native Catalyst expressions for the CURIE/prefix scalar family (SURVEY §2.4
 * F1–F4; reference semantics: curies.Converter.compress/expand at ner.py:71,
 * bioregistry.normalize_prefix at robot.py:132, predicate upgrade consumed at
 * ner.py:137).
 *
 * Each expression captures an immutable [[Converter]] (driver-built, ~KBs for
 * the fixture map, ~MB for a Bioregistry-scale map) which is serialized with
 * the plan and embedded into generated code via `addReferenceObj`, so the
 * whole-stage-codegen span is NOT broken — these behave like built-in string
 * functions at 100 TB scan scale. No Scala UDF boxing, no Python.
 */
abstract class ConverterExpression extends UnaryExpression with TypedInputs {
  def converter: Converter
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  // analysis-time typing (with friendly implicit casts, like built-in string
  // functions): without it, a SQL call on e.g. a BIGINT column analyzes
  // cleanly and dies mid-job with a ClassCastException in every task
  override def expectedInputTypes: Seq[DataType] = Seq(StringType)

  /** The scalar kernel (String → String-or-null); also used by codegen. */
  def kernel(s: String): String

  override def nullSafeEval(input: Any): Any = {
    val out = kernel(input.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("graftExpr", this, this.getClass.getName)
    val tmp = ctx.freshName("graftOut")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.String $tmp = $refName.kernel($c.toString());
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($tmp); }
       """.stripMargin
    })
  }
}

/** F2: IRI → CURIE, longest URI-prefix wins; null when no prefix matches. */
case class CompressIri(child: Expression, converter: Converter) extends ConverterExpression {
  override def kernel(s: String): String = converter.compressToCurie(s)
  override def prettyName: String = "compress_iri"
  override protected def withNewChildInternal(newChild: Expression): CompressIri = copy(child = newChild)
}

/** F3: CURIE → IRI; null when the prefix is unknown. */
case class ExpandCurie(child: Expression, converter: Converter) extends ConverterExpression {
  override def kernel(s: String): String = converter.expandOrNull(s)
  override def prettyName: String = "expand_curie"
  override protected def withNewChildInternal(newChild: Expression): ExpandCurie = copy(child = newChild)
}

/** F1: arbitrary prefix spelling → canonical prefix; null when unknown. */
case class NormalizePrefix(child: Expression, converter: Converter) extends ConverterExpression {
  override def kernel(s: String): String = converter.normalizePrefixOrNull(s)
  override def prettyName: String = "normalize_prefix"
  override protected def withNewChildInternal(newChild: Expression): NormalizePrefix = copy(child = newChild)
}

/** F4: predicate shorthand/IRI → canonical CURIE; passthrough when unknown. */
case class NormalizePredicate(child: Expression, converter: Converter) extends ConverterExpression {
  override def kernel(s: String): String = Converter.normalizePredicate(s, converter)
  override def prettyName: String = "normalize_predicate"
  override protected def withNewChildInternal(newChild: Expression): NormalizePredicate = copy(child = newChild)
}

/** IRI-or-CURIE → canonical CURIE (node/edge endpoint standardization). */
case class StandardizeId(child: Expression, converter: Converter) extends ConverterExpression {
  override def kernel(s: String): String = converter.standardizeId(s).orNull
  override def prettyName: String = "standardize_id"
  override protected def withNewChildInternal(newChild: Expression): StandardizeId = copy(child = newChild)
}

/** Column-level entry points. */
object CurieFunctions {
  def compress_iri(c: Column, conv: Converter): Column = Column(CompressIri(expression(c), conv))
  def expand_curie(c: Column, conv: Converter): Column = Column(ExpandCurie(expression(c), conv))
  def normalize_prefix(c: Column, conv: Converter): Column = Column(NormalizePrefix(expression(c), conv))
  def normalize_predicate(c: Column, conv: Converter): Column = Column(NormalizePredicate(expression(c), conv))
  def standardize_id(c: Column, conv: Converter): Column = Column(StandardizeId(expression(c), conv))

  // Spark 4 Column wraps a ColumnNode, not an Expression; go through the
  // classic-converter shim to build Columns from raw Catalyst expressions.
  private def expression(c: Column): Expression =
    org.apache.spark.sql.graftshim.ColumnShim.expr(c)
  private def Column(e: Expression): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(e)
}
