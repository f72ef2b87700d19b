package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Vocab

/**
 * Lexicon extraction (SURVEY G2 — the reference's only generator/UDTF,
 * ner.py:85-113): from each standardized node emit
 *   - one label mapping (predicate rdfs:label) when the node has a label;
 *   - one mapping per synonym (predicate = synonym scope, provenance =
 *     synonym xrefs) — EVEN for label-less nodes (the reference's
 *     `_lm_from_node` emits synonyms with name=None; only the label row
 *     itself requires a label);
 *   - nothing when meta is absent entirely.
 *
 * Spark-first formulation: label rows UNION ALL exploded synonym rows — pure
 * Catalyst (no custom Generator), both branches scan the (cached) node table
 * with column pruning.
 */
object LiteralMappings {

  /** stdNodes (GraphStandardizer.standardizeNodes output) → literal_mappings. */
  def fromNodes(stdNodes: DataFrame, source: String): DataFrame = {
    val base = stdNodes.select(
      col("prefix"), col("id"), col("label"), col("synonyms"))

    val labelRows = base
      .filter(col("label").isNotNull)
      .select(
        col("prefix"), col("id"),
        col("label").as("name"),
        lit(Vocab.Label).as("predicate"),
        col("label").as("text"),
        lit(source).as("source"),
        array().cast("array<string>").as("provenance"))

    val synonymRows = base
      .select(col("prefix"), col("id"), col("label").as("name"),
        explode(col("synonyms")).as("syn"))
      .filter(col("syn.text").isNotNull)
      .select(
        col("prefix"), col("id"), col("name"),
        col("syn.predicate").as("predicate"),
        col("syn.text").as("text"),
        lit(source).as("source"),
        col("syn.xrefs").as("provenance"))

    labelRows.unionByName(synonymRows)
  }

  /**
   * J1 subset filter (ner.py:145): keep only mappings whose reference is in
   * the closure set. Closure is ontology-sized → broadcast left_semi, no
   * shuffle of the lexicon.
   */
  def subset(literalMappings: DataFrame, closure: DataFrame): DataFrame =
    literalMappings.join(broadcast(closure.select("prefix", "id")), Seq("prefix", "id"), "left_semi")
}
