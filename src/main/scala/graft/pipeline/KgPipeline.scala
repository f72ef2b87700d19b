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
 *  - at most ONE corpus-wide shuffle on the fused path: the salted
 *    repartition (skipped entirely for conv_id-bucketed input — the Iceberg
 *    storage layout); per-turn dedup is map-side by construction. Only the
 *    icelite-materializing path pays a second exchange (snapshot read-back
 *    loses partitioning, so its dedup is a real partial/final hash agg);
 *  - AQE + skew-join enabled by session conf; salting bounds any single
 *    conversation's partition footprint.
 */
object KgPipeline {

  final case class Result(
      triples: DataFrame,
      nodes: DataFrame,
      mentionsTopK: DataFrame,
      snapshotId: Option[Long],
      metrics: RunMetrics)

  /** Salt width for conversation partitioning (SURVEY J4). */
  val SaltBuckets = 8

  def standardizeOntology(spark: SparkSession, ontologyJsonPath: String, converter: Converter,
                          prefix: Option[String] = None): (DataFrame, DataFrame) =
    standardizeGraphs(OboGraphReader.readGraphs(spark, ontologyJsonPath), converter, prefix)

  /** Graphs-first variant: callers that already hold the parsed graphs
    * DataFrame (e.g. [[prepare]], which also derives equivalentNodesSets
    * edges from it) pass it here, so the multiLine JSON document is parsed
    * once per action — and both consumers provably see the SAME read. */
  def standardizeGraphs(graphs: DataFrame, converter: Converter,
                        prefix: Option[String] = None): (DataFrame, DataFrame) = {
    val nodes = GraphStandardizer.standardizeNodes(graphs, converter, prefix).cache()
    val edges = GraphStandardizer.standardizeEdges(graphs, converter).cache()
    (nodes, edges)
  }

  /**
   * Xref-based entity merge (J3): build undirected (curie, xref) links from
   * node metadata, run connected components, return `curie → canonical` as a
   * driver map suitable for broadcast (ontology-sized by construction).
   */
  /** Above this edge count, xref CC runs distributed; below, driver union-find. */
  val DriverUnionFindLimit = 200000L

  def xrefCanonicalMap(nodes: DataFrame, preferPrefix: Option[String] = None,
                       extraEdges: Option[DataFrame] = None): Map[String, String] = {
    val nodeXrefs = nodes
      .select(col("curie").as("a"), explode(col("xrefs")).as("b"))
      .filter(col("b").isNotNull)
    val xrefEdges = extraEdges.fold(nodeXrefs)(e => nodeXrefs.unionByName(e))

    // Ontology xref graphs are tiny relative to the corpus; SURVEY J3's
    // driver union-find + broadcast map is both exact and ~20× cheaper in
    // job-scheduling overhead than the iterative join loop. The distributed
    // path stays for genuinely large entity graphs.
    val probe = xrefEdges.limit(DriverUnionFindLimit.toInt + 1).collect()
    val pairs: Array[(String, String)] =
      if (probe.length <= DriverUnionFindLimit) {
        // lexicographic-min root: the SAME canonical-label convention as the
        // distributed branch (Closure.connectedComponents' min-CURIE roots),
        // so the component labels cannot depend on collect/partition order or
        // on which side of the cost switch a given graph lands
        graft.operators.DriverUnionFind.components(
          probe.iterator.map(r => (r.getString(0), r.getString(1))))(
          (x, y) => if (x <= y) x else y).toArray
      } else {
        Closure.connectedComponents(xrefEdges)
          .collect().map(r => (r.getString(0), r.getString(1)))
      }

    // representative per component: prefer the ontology's own prefix (so the
    // merged entity keeps its PATO id, not a lexicographically-smaller
    // foreign xref), then min CURIE for determinism.
    def rank(c: String): (Int, String) =
      (if (preferPrefix.exists(p => c.startsWith(p + ":"))) 0 else 1, c)
    pairs.groupBy(_._2).iterator.flatMap { case (_, grp) =>
      val memberSet = grp.map(_._1)
      val rep = memberSet.minBy(rank)
      memberSet.filter(_ != rep).map(_ -> rep)
    }.toMap
  }

  /**
   * Fully-distributed variant of [[xrefCanonicalMap]] for entity graphs too
   * large to collect (cross-ontology merges, instance-level entity linking):
   * the `member → canonical` relation stays a DataFrame end to end —
   * connected components run distributed, the per-component representative
   * is an aggregate (prefer `preferPrefix`-owned CURIEs, then min CURIE:
   * identical rep rule to the driver path), and triples are rewritten with
   * [[canonicalizeJoin]] instead of a broadcast map. Nothing here bounds the
   * entity-graph size by driver memory.
   *
   * @return (curie, canonical) — one row per NON-representative member
   */
  def xrefCanonicalTable(nodes: DataFrame, preferPrefix: Option[String] = None,
                         extraEdges: Option[DataFrame] = None): DataFrame = {
    val nodeXrefs = nodes
      .select(col("curie").as("a"), explode(col("xrefs")).as("b"))
      .filter(col("b").isNotNull)
    val xrefEdges = extraEdges.fold(nodeXrefs)(e => nodeXrefs.unionByName(e))
    val cc = Closure.connectedComponents(xrefEdges)
    // representative = min (prefix-rank, curie) struct per component — struct
    // ordering is field-lexicographic, so this is exactly the driver path's
    // minBy(rank)
    val rank = preferPrefix match {
      case Some(p) => when(col("curie").startsWith(p + ":"), 0).otherwise(1)
      case None    => lit(0)
    }
    val reps = cc
      .groupBy("component")
      .agg(min(struct(rank.as("r"), col("curie"))).as("rep"))
      .select(col("component"), col("rep.curie").as("canonical"))
    cc.join(reps, "component")
      .filter(col("curie") =!= col("canonical"))
      .select(col("curie"), col("canonical"))
  }

  /**
   * Rewrite triple endpoints through a `(curie, canonical)` DataFrame — two
   * broadcast-hash left joins + coalesce, for canonical maps too big to hold
   * on the driver. The canonical relation is ontology/entity-sized (always ≪
   * corpus), so broadcasting it keeps the corpus side shuffle-free; if it
   * ever outgrew broadcast, dropping the hint degrades gracefully to a
   * shuffled hash join rather than an OOM.
   */
  def canonicalizeJoin(triples: DataFrame, canonical: DataFrame): DataFrame = {
    val m = canonical.select(col("curie"), col("canonical"))
    val bs = broadcast(m.withColumnRenamed("curie", "subj").withColumnRenamed("canonical", "subj_c"))
    val bo = broadcast(m.withColumnRenamed("curie", "obj").withColumnRenamed("canonical", "obj_c"))
    triples
      .join(bs, Seq("subj"), "left")
      .join(bo, Seq("obj"), "left")
      .select(coalesce(col("subj_c"), col("subj")).as("subj"), col("pred"),
        coalesce(col("obj_c"), col("obj")).as("obj"))
  }

  /**
   * Rewrite triple endpoints through the canonical-entity map — map-side, no
   * shuffle. Small maps (the common case: xref merges are ontology-sized)
   * become a literal `map_from_arrays` lookup that stays inside whole-stage
   * codegen; big maps fall back to a broadcast-map UDF. For maps that exceed
   * driver memory entirely, use [[xrefCanonicalTable]] + [[canonicalizeJoin]].
   */
  def canonicalize(triples: DataFrame, canonical: Map[String, String]): DataFrame = {
    if (canonical.isEmpty) return triples
    val remap: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (canonical.size <= 10000) {
        val keys = array(canonical.keys.toSeq.map(lit): _*)
        val vals = array(canonical.values.toSeq.map(lit): _*)
        c => coalesce(element_at(map_from_arrays(keys, vals), c), c)
      } else {
        val b = triples.sparkSession.sparkContext.broadcast(canonical)
        val f = udf((c: String) => if (c == null) null else b.value.getOrElse(c, c))
        c => f(c)
      }
    triples.select(remap(col("subj")).as("subj"), col("pred"), remap(col("obj")).as("obj"))
  }

  /**
   * Full run over a transcripts DataFrame. When `icelite` is given, every
   * expensive stage materializes as a tagged snapshot → kill-and-resume
   * reuses finished stages and produces identical output (north rule).
   */
  /**
   * Ontology-side artifacts, built ONCE per ontology release and reused
   * across every corpus batch/snapshot (at 10^12 turns, ontology prep is
   * amortized to zero — rebuilding the broadcast automaton per batch would
   * serialize the cluster on the driver).
   */
  final case class OntologyContext(
      nodes: DataFrame,
      edges: DataFrame,
      grounder: org.apache.spark.broadcast.Broadcast[Grounder],
      canonical: Map[String, String]) {
    /** Release the cached ontology tables and the broadcast automaton. A
      * bulk sweep prepares one context PER ontology — without an explicit
      * release, N jobs pin 2N cached DataFrames and N automatons (tens of MB
      * each at Bioregistry scale) in storage memory for the session's life.
      * Call only after the job's results are consumed: the broadcast is
      * destroyed, so unevaluated plans built on this context will fail. */
    def release(): Unit = {
      nodes.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      grounder.destroy()
    }
  }

  def prepare(spark: SparkSession,
              ontologyJsonPath: String,
              converter: Converter = MiniOntology.converter,
              prefix: Option[String] = Some("PATO"),
              extraLexicon: Option[DataFrame] = None): OntologyContext = {
    val graphs = OboGraphReader.readGraphs(spark, ontologyJsonPath)
    val (nodes, edges) = standardizeGraphs(graphs, converter, prefix)
    val ownLexicon = LiteralMappings.fromNodes(nodes, prefix.getOrElse("ONT"))
    val lexicon = extraLexicon.fold(ownLexicon)(x => ownLexicon.unionByName(x))
    // entity merge signals: node xrefs + equivalentNodesSets (both public
    // OBO Graph JSON equivalence carriers)
    val ensEdges = GraphStandardizer.equivalentNodeEdges(graphs, converter)
    val canonical = xrefCanonicalMap(nodes, prefix, Some(ensEdges))
    // entity merge folded into the index: grounder entries are born canonical
    val grounder = spark.sparkContext.broadcast(Grounder.build(lexicon, canonical))
    OntologyContext(nodes, edges, grounder, canonical)
  }

  def run(spark: SparkSession,
          transcripts: DataFrame,
          ontologyJsonPath: String,
          converter: Converter = MiniOntology.converter,
          prefix: Option[String] = Some("PATO"),
          icelite: Option[Icelite] = None,
          runTag: String = "run",
          extraLexicon: Option[DataFrame] = None): Result =
    runPrepared(spark, transcripts,
      prepare(spark, ontologyJsonPath, converter, prefix, extraLexicon),
      icelite, runTag)

  /**
   * @param inputConvPartitioned the input is ALREADY partitioned so that no
   *   conversation spans partitions (an Iceberg table bucketed on conv_id —
   *   the north-star storage layout — or this repo's generator output). The
   *   corpus-wide repartition is then skipped: the zero-shuffle dedup
   *   argument in [[MentionDetector.detectTriples]] holds for ANY
   *   conversation-preserving partitioning, not just the one we create.
   */
  def runPrepared(spark: SparkSession,
                  transcripts: DataFrame,
                  ctx: OntologyContext,
                  icelite: Option[Icelite] = None,
                  runTag: String = "run",
                  inputConvPartitioned: Boolean = false): Result = {
    val OntologyContext(nodes, edges, grounder, canonical) = ctx
    val metrics = new RunMetrics(spark)

    // ---- corpus side (huge) -----------------------------------------------
    // conversation-boundary-preserving partitioning, salted for skew: hash on
    // (conv_id, turn_idx % S). Mention detection is per-turn, so salting is
    // allowed to split one conversation across ≤ S partitions without
    // breaking semantics; the stable-order invariant is asserted on unsalted
    // read-back (SURVEY §7.5.3), not mid-pipeline.
    val turns =
      if (inputConvPartitioned)
        transcripts.sortWithinPartitions(col("conv_id"), col("turn_idx"))
      else transcripts
        .withColumn("salt", pmod(col("turn_idx"), lit(SaltBuckets)))
        .repartition(col("conv_id"), col("salt"))
        .sortWithinPartitions(col("conv_id"), col("turn_idx"))
        .drop("salt")

    // span-local top-1 fused into the detection scan (no ranking-window
    // shuffle; equivalence with detect→topCandidates is unit-tested).
    // Column pruning pushes the slim projection below the repartition, so
    // only (conv_id, turn_idx, text) ever shuffles.
    val slimTurns = MentionDetector.slim(turns)
    // accumulators attach to whichever detection pass actually runs per mode
    // (icelite → the materialized top-mention snapshot; else the fused scan)
    val top = MentionDetector.detectTopSlim(slimTurns, grounder,
      if (icelite.isDefined) Some(metrics) else None).toDF()

    // ontology edges: canonicalize + distinct (tiny)
    val ontologyTriples = canonicalize(edges.select("subj", "pred", "obj"), canonical)
      .dropDuplicates("subj", "pred", "obj")

    val allTriples = icelite match {
      case Some(ic) =>
        // resumable path: mentions materialize as a tagged snapshot first;
        // read-back loses partitioning, so dedup pays one explicit shuffle
        val topSnap = ic.materialize(spark, "mentions_top", s"$runTag/mentions")(top)
        // dedup ONCE, after canonicalize+union — mentionTriples' own dedup
        // would be a second corpus-sized exchange for the same final set
        canonicalize(MentionDetector.mentionTriples(topSnap, dedup = false), canonical)
          .unionByName(ontologyTriples)
          .dropDuplicates("subj", "pred", "obj")
      case None =>
        // scale path: detection + top-1 + per-turn dedup + canonicalization
        // fused into ONE map-side pass (see MentionDetector.detectTriples);
        // the only corpus-wide shuffle in the whole plan is the repartition
        MentionDetector.detectTriples(slimTurns, grounder, Some(metrics))
          .unionByName(ontologyTriples)
    }

    val nodeTable = nodes.select(
      col("prefix"), col("id"), col("curie"), col("label"), col("deprecated"))

    val snapId = icelite.map { ic =>
      ic.writeSnapshot(nodeTable, "kg_nodes", s"$runTag/nodes")
      val id = ic.writeSnapshot(allTriples, "kg_edges", s"$runTag/edges")
      // diagnostics flushed AFTER the snapshot actions populate accumulators
      metrics.write(s"${ic.root}/kg_edges/metrics/$id.json")
      id
    }

    Result(allTriples, nodeTable, top, snapId, metrics)
  }

  /** Pipeline without icelite materialization — pure DataFrame (for bench/verify). */
  def triples(spark: SparkSession, transcripts: DataFrame,
              ontologyJsonPath: String): DataFrame =
    run(spark, transcripts, ontologyJsonPath).triples
}
