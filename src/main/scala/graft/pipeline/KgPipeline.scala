package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.curie.Converter
import graft.fixtures.MiniOntology
import graft.ground.{Grounder, MentionDetector}
import graft.icelite.Icelite
import graft.model.{Turn, Vocab}
import graft.operators.{Closure, GraphStandardizer, LiteralMappings}
import graft.sources.OboGraphReader

/**
 * End-to-end KG-construction pipeline (BASELINE.json north_star):
 *
 *   read transcripts → conversation-boundary-preserving repartition (hash on
 *   salted conv_id) → sortWithinPartitions(conv_id, turn_idx) →
 *   mapPartitions trie mention detection [G4] → candidate scoring + top-1
 *   window [F5] → CURIE canonicalization [F1-F4, native expressions] →
 *   xref-based entity merge [J3] → groupBy-dedup [A2] → (subj, pred, obj)
 *   edge + node tables with per-partition lineage metrics [S9/S10/A4],
 *   checkpoint-resumable per icelite snapshot.
 *
 * Scale design (100 TB corpus, ontology side always ≪):
 *  - the ontology/lexicon/grounder path never shuffles the corpus: grounder
 *    and xref-merge maps are driver-built from ontology-sized tables and
 *    BROADCAST;
 *  - exactly two corpus-wide shuffles: the salted repartition and the final
 *    triple dedup (partial/final hash aggregate — map-side combine collapses
 *    repeated mentions before the exchange);
 *  - AQE + skew-join enabled by session conf; salting bounds any single
 *    conversation's partition footprint.
 */
object KgPipeline {

  final case class Result(
      triples: DataFrame,
      nodes: DataFrame,
      mentionsTopK: DataFrame,
      snapshotId: Option[Long])

  /** Salt width for conversation partitioning (SURVEY J4). */
  val SaltBuckets = 8

  def standardizeOntology(spark: SparkSession, ontologyJsonPath: String, converter: Converter,
                          prefix: Option[String] = None): (DataFrame, DataFrame) = {
    val graphs = OboGraphReader.readGraphs(spark, ontologyJsonPath)
    val nodes = GraphStandardizer.standardizeNodes(graphs, converter, prefix).cache()
    val edges = GraphStandardizer.standardizeEdges(graphs, converter).cache()
    (nodes, edges)
  }

  /**
   * Xref-based entity merge (J3): build undirected (curie, xref) links from
   * node metadata, run connected components, return `curie → canonical` as a
   * driver map suitable for broadcast (ontology-sized by construction).
   */
  def xrefCanonicalMap(nodes: DataFrame, preferPrefix: Option[String] = None): Map[String, String] = {
    val xrefEdges = nodes
      .select(col("curie").as("a"), explode(col("xrefs")).as("b"))
      .filter(col("b").isNotNull)
    val cc = Closure.connectedComponents(xrefEdges)
    // representative per component: prefer the ontology's own prefix (so the
    // merged entity keeps its PATO id, not a lexicographically-smaller foreign
    // xref), then min CURIE for determinism.
    val prefRank = preferPrefix.fold(lit(0))(p =>
      when(col("curie").startsWith(p + ":"), 0).otherwise(1))
    val reps = cc
      .withColumn("rank_key", concat(prefRank.cast("string"), lit("|"), col("curie")))
      .groupBy("component").agg(min("rank_key").as("rep_key"))
      .withColumn("rep", expr("substring(rep_key, 3)"))
      .select("component", "rep")
    cc.join(reps, "component")
      .filter(col("curie") =!= col("rep"))
      .select("curie", "rep")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Rewrite triple endpoints through the canonical-entity map (broadcast map-side). */
  def canonicalize(triples: DataFrame, canonical: Map[String, String]): DataFrame = {
    if (canonical.isEmpty) return triples
    val b = triples.sparkSession.sparkContext.broadcast(canonical)
    val remap = udf((c: String) => if (c == null) null else b.value.getOrElse(c, c))
    triples.select(remap(col("subj")).as("subj"), col("pred"), remap(col("obj")).as("obj"))
  }

  /**
   * Full run over a transcripts DataFrame. When `icelite` is given, every
   * expensive stage materializes as a tagged snapshot → kill-and-resume
   * reuses finished stages and produces identical output (north rule).
   */
  def run(spark: SparkSession,
          transcripts: DataFrame,
          ontologyJsonPath: String,
          converter: Converter = MiniOntology.converter,
          prefix: Option[String] = Some("PATO"),
          icelite: Option[Icelite] = None,
          runTag: String = "run"): Result = {
    import spark.implicits._

    // ---- ontology side (small) --------------------------------------------
    val (nodes, edges) = standardizeOntology(spark, ontologyJsonPath, converter, prefix)
    val lexicon = LiteralMappings.fromNodes(nodes, prefix.getOrElse("ONT"))
    val grounder = spark.sparkContext.broadcast(Grounder.build(lexicon))
    val canonical = xrefCanonicalMap(nodes, prefix)

    // ---- corpus side (huge) -----------------------------------------------
    // conversation-boundary-preserving partitioning, salted for skew: hash on
    // (conv_id, turn_idx % S). Mention detection is per-turn, so salting is
    // allowed to split one conversation across ≤ S partitions without
    // breaking semantics; the stable-order invariant is asserted on unsalted
    // read-back (SURVEY §7.5.3), not mid-pipeline.
    val turns: Dataset[Turn] = transcripts
      .withColumn("salt", pmod(col("turn_idx"), lit(SaltBuckets)))
      .repartition(col("conv_id"), col("salt"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .drop("salt")
      .as[Turn]

    val mentions = MentionDetector.detect(turns, grounder)
    val top = MentionDetector.topCandidates(mentions)
    val topSnap = icelite.fold(top)(ic =>
      ic.materialize(spark, "mentions_top", s"$runTag/mentions")(top))

    val mentionTriples = MentionDetector.mentionTriples(topSnap)
    val ontologyTriples = edges.select("subj", "pred", "obj")

    val allTriples = canonicalize(
      mentionTriples.unionByName(ontologyTriples), canonical)
      .dropDuplicates("subj", "pred", "obj")

    val nodeTable = nodes.select(
      col("prefix"), col("id"), col("curie"), col("label"), col("deprecated"))

    val snapId = icelite.map { ic =>
      ic.writeSnapshot(nodeTable, "kg_nodes", s"$runTag/nodes")
      ic.writeSnapshot(allTriples, "kg_edges", s"$runTag/edges")
    }

    Result(allTriples, nodeTable, topSnap, snapId)
  }

  /** Pipeline without icelite materialization — pure DataFrame (for bench/verify). */
  def triples(spark: SparkSession, transcripts: DataFrame,
              ontologyJsonPath: String): DataFrame =
    run(spark, transcripts, ontologyJsonPath).triples
}
