package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.ground.Grounder
import graft.pipeline.RunMetrics

/**
 * Whole-operator mention detection as a first-class Catalyst operator
 * (SURVEY G4/F5 scale path): logical node + strategy + exec node, so the
 * fused detect→top-1→per-turn-dedup kernel lives INSIDE the one query plan —
 * `explain` shows it, plan-shape tests can assert around it, and the corpus
 * exchange below it stays visible to the optimizer (column pruning pushes the
 * slim projection under the shuffle exactly as with a built-in operator).
 *
 * Child contract: output columns (conv_id: string, turn_idx: int, text:
 * string) — resolved by name at execution, so projections may reorder.
 * Output: (conv_id, turn_idx, obj) with obj = canonical concept CURIE,
 * deduplicated per turn (the zero-shuffle dedup argument — duplicates of a
 * (turn, concept) pair can only originate from the turn's single partition).
 */
case class DetectTriplesNode(
    child: LogicalPlan,
    grounder: Broadcast[Grounder],
    metrics: Option[RunMetrics],
    // constructor field, NOT a computed val: plan transforms copy() the node,
    // and re-derived AttributeReferences would mint fresh exprIds, orphaning
    // every parent expression bound to the originals
    output: Seq[Attribute]) extends UnaryNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)

  // the kernel consumes every child column (conv_id, turn_idx, text); without
  // this, ColumnPruning sees zero referenced attributes and projects the
  // child down to nothing
  override def references: AttributeSet = child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): DetectTriplesNode =
    copy(child = newChild)
}

object DetectTriplesNode {
  def apply(child: LogicalPlan, grounder: Broadcast[Grounder],
            metrics: Option[RunMetrics]): DetectTriplesNode =
    DetectTriplesNode(child, grounder, metrics, Seq(
      AttributeReference("conv_id", StringType, nullable = false)(),
      AttributeReference("turn_idx", IntegerType, nullable = false)(),
      AttributeReference("obj", StringType, nullable = false)()))
}

case class DetectTriplesExec(
    child: SparkPlan,
    grounder: Broadcast[Grounder],
    runMetrics: Option[RunMetrics],
    output: Seq[Attribute]) extends UnaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val convOrd = child.output.indexWhere(_.name == "conv_id")
    val turnOrd = child.output.indexWhere(_.name == "turn_idx")
    val textOrd = child.output.indexWhere(_.name == "text")
    require(convOrd >= 0 && turnOrd >= 0 && textOrd >= 0,
      s"DetectTriples child must provide (conv_id, turn_idx, text); got ${child.output.map(_.name)}")
    val g = grounder
    val m = runMetrics
    child.execute().mapPartitions { it =>
      // Per-task kernel state: fused normalize+scan over Tungsten UTF8String
      // bytes (AhoCorasick.Scanner), span top-1 precomputed per pattern id,
      // per-turn concept dedup via flag array — zero per-turn allocation.
      // Emitted rows reference executor-shared concept UTF8Strings; conv_id
      // is copied once per EMITTING turn (the input row buffer is reused).
      val grounder = g.value
      val scanner = grounder.automaton.newScanner()
      val concepts = grounder.conceptUtf8
      val collector = new Grounder.ConceptCollector(grounder)
      it.flatMap { row =>
        collector.reset()
        val text = if (row.isNullAt(textOrd)) null else row.getUTF8String(textOrd)
        if (text != null && text.numBytes > 0) scanner.scan(text, collector)
        m.foreach { mm =>
          mm.turnsProcessed.add(1)
          if (collector.n == 0) mm.emptyTurns.add(1) else mm.mentionsEmitted.add(collector.n)
        }
        if (collector.n == 0) Iterator.empty
        else {
          val convId = row.getUTF8String(convOrd).copy()
          val turnIdx = row.getInt(turnOrd)
          val arr = new Array[InternalRow](collector.n)
          var i = 0
          while (i < arr.length) {
            arr(i) = new GenericInternalRow(
              Array[Any](convId, turnIdx, concepts(collector.hits(i))))
            i += 1
          }
          arr.iterator
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): DetectTriplesExec =
    copy(child = newChild)
}

/** Planner rule mapping the logical node to its exec — injectable both via
  * `spark.experimental.extraStrategies` and SparkSessionExtensions. */
object DetectTriplesStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DetectTriplesNode(child, grounder, metrics, output) =>
      DetectTriplesExec(planLater(child), grounder, metrics, output) :: Nil
    case _ => Nil
  }
}

object DetectTriples {
  /** Idempotently register the strategy on a session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = cs.experimental.extraStrategies
    if (!cur.contains(DetectTriplesStrategy))
      cs.experimental.extraStrategies = cur :+ DetectTriplesStrategy
  }
}
