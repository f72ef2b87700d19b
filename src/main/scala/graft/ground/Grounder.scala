package graft.ground

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.broadcast.Broadcast

import graft.model.{Mention, Turn, Vocab}

/** One lexicon entry attached to a normalized pattern. */
final case class TermEntry(prefix: String, id: String, name: String, predicate: String)

/**
 * Dictionary grounder (SURVEY F5 — ssslm.make_grounder / gilda-family
 * semantics per the contract documented at ner.py:47-64):
 *
 *  - the index is keyed on NORMALIZED text (casefold + whitespace/dash fold);
 *  - `ground(text)` returns candidates ranked by match quality:
 *    exact label > exact synonym > related/broad synonyms, with an
 *    exact-case bonus; deterministic tie-break on CURIE (SURVEY §7.5.4 —
 *    without it P/R flakes across parallelism levels).
 *
 * Built on the driver from the lexicon DataFrame (ontology-sized: ≤ ~1e6
 * rows — tiny vs the corpus), then broadcast once and shared by every
 * partition of the 10^12-turn mention-detection stage.
 */
final class Grounder private (
    val automaton: AhoCorasick,
    val entries: Array[Array[TermEntry]], // per pattern id
    val surfaces: Array[String])          // original (pre-normalization) representative surface
  extends Serializable {

  /** Predicate weight: label beats exact synonym beats everything else. */
  @inline def predicateWeight(pred: String): Double = pred match {
    case Vocab.Label => 10.0
    case Vocab.HasExactSynonym => 9.0
    case Vocab.HasNarrowSynonym => 7.0
    case Vocab.HasBroadSynonym => 6.0
    case Vocab.HasRelatedSynonym => 5.0
    case _ => 4.0
  }

  /** All scored candidates for every word-boundary match in `text`. */
  def findMentions(convId: String, turnIdx: Int, text: String): Iterator[Mention] = {
    if (text == null || text.isEmpty) return Iterator.empty
    val norm = AhoCorasick.normalize(text)
    automaton.findAll(norm).iterator.flatMap { case (start, end, pid) =>
      val surfaceNorm = norm.substring(start, end)
      entries(pid).iterator.map { e =>
        val caseBonus = if (text.contains(surfaces(pid))) 0.5 else 0.0
        Mention(convId, turnIdx, start, end, surfaceNorm,
          e.prefix, e.id, e.name, e.predicate,
          predicateWeight(e.predicate) + caseBonus)
      }
    }
  }

  /** Driver-side single-string grounding (reference: grounder.ground("apoptosis")). */
  def ground(text: String): Seq[Mention] =
    findMentions("", 0, text).toSeq.sortBy(m => (-m.score, m.prefix, m.id))
}

object Grounder {

  /**
   * Build from a literal_mappings DataFrame (columns prefix, id, name,
   * predicate, text). The groupBy on normalized text happens in Spark (so a
   * huge lexicon still aggregates distributed), then ontology-sized results
   * collect to the driver for automaton construction.
   */
  def build(literalMappings: DataFrame): Grounder = {
    val rows = literalMappings
      .select(col("prefix"), col("id"), coalesce(col("name"), col("text")).as("name"),
        col("predicate"), col("text"))
      .collect()

    val byNorm = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[(TermEntry, String)]]()
    rows.foreach { r =>
      val text = r.getString(4)
      val norm = AhoCorasick.normalize(text)
      if (norm.nonEmpty) {
        byNorm.getOrElseUpdate(norm, new scala.collection.mutable.ArrayBuffer)
          .append((TermEntry(r.getString(0), r.getString(1), r.getString(2), r.getString(3)), text))
      }
    }
    val patterns = byNorm.keys.toArray
    val entries = patterns.map(p => byNorm(p).map(_._1).distinct
      .sortBy(e => (e.prefix, e.id, e.predicate)).toArray)
    val surfaces = patterns.map(p => byNorm(p).head._2)
    new Grounder(AhoCorasick.build(patterns.toIndexedSeq), entries, surfaces)
  }
}

/**
 * Per-turn batched mention detection (SURVEY G4) + candidate scoring /
 * top-1 selection (F5).
 */
object MentionDetector {

  /**
   * `mapPartitions`-shaped detection: the broadcast automaton is per-partition
   * state (fetched once per task, not per row). Emits EVERY candidate of
   * every match; resolution happens in [[topCandidates]].
   */
  def detect(turns: Dataset[Turn], grounder: Broadcast[Grounder]): Dataset[Mention] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
      val g = grounder.value
      it.flatMap(t => g.findMentions(t.conv_id, t.turn_idx, t.text))
    }
  }

  /**
   * Top-1 candidate per detected span via a ranking window — deterministic
   * tie-break (score desc, then CURIE asc) so results are stable across
   * parallelism levels (SURVEY §7.5.4).
   */
  def topCandidates(mentions: Dataset[Mention]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("conv_id", "turn_idx", "start", "end")
      .orderBy(col("score").desc, col("prefix").asc, col("id").asc, col("predicate").asc)
    mentions.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .drop("rank")
  }

  /**
   * Final mention triples: (turn URI, ex:mentions, concept CURIE),
   * deduplicated (A2 — the "final groupBy-dedup materialization").
   */
  def mentionTriples(topMentions: DataFrame): DataFrame =
    topMentions.select(
      concat(lit("turn:"), col("conv_id"), lit("/"), col("turn_idx")).as("subj"),
      lit(Vocab.Mentions).as("pred"),
      concat(col("prefix"), lit(":"), col("id")).as("obj"))
      .dropDuplicates("subj", "pred", "obj")
}
