package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph closures (SURVEY T2, J3) as driver-coordinated loops of
 * DataFrame joins — deliberately NOT a single Catalyst plan (recursion isn't
 * plan-expressible) and deliberately NOT GraphX (RDD-based, unavailable
 * benefit at ontology scale).
 *
 * Scale note: these run on ONTOLOGY-sized edge lists (≤ millions of rows),
 * never on the 10^12-turn corpus, so each iteration is a small broadcast-able
 * join; `localCheckpoint` every iteration cuts the exponential lineage that
 * would otherwise blow up the plan at depth ~20.
 */
object Closure {

  /**
   * T2 descendant closure, networkx `nx.ancestors` semantics on a
   * child→parent digraph — the UNION of per-seed `nx.ancestors(G, seed)`
   * exactly as ner.py:141-143 computes it: all nodes with a directed path TO
   * any seed. A seed never appears merely for being a seed (ancestors(s)
   * excludes s), but a seed NESTED UNDER ANOTHER SEED is a genuine member of
   * the union and IS included — anti-joining all seeds out (round-1 behavior)
   * silently dropped those nested terms' literal mappings from the subset.
   *
   * @param childParent edges with columns (subj, obj) = (child, parent)
   * @param seeds       one column `curie` of seed (ancestor) CURIEs
   * @return one column `curie` of descendant CURIEs
   */
  def descendants(childParent: DataFrame, seeds: DataFrame): DataFrame = {
    val spark = childParent.sparkSession
    val edges = childParent.select(col("subj").as("child"), col("obj").as("parent"))
      .localCheckpoint(true)

    // frontier = nodes whose descendants we still need to pull in; `acc`
    // collects ONLY nodes reached via ≥1 edge step (so a seed enters the
    // result exactly when some other seed reaches it)
    var frontier = seeds.select(col("curie")).distinct().localCheckpoint(true)
    var acc = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      frontier.schema)

    // emptiness probe, not a full count — saves one full pass per iteration
    var nonEmpty = frontier.limit(1).count() > 0
    while (nonEmpty) {
      val next = edges.join(broadcast(frontier), edges("parent") === frontier("curie"))
        .select(col("child").as("curie")).distinct()
        // only genuinely new nodes continue (cycle-safe, termination guaranteed)
        .join(acc, Seq("curie"), "left_anti")
        .localCheckpoint(true)
      acc = acc.unionByName(next).localCheckpoint(true)
      frontier = next
      nonEmpty = frontier.limit(1).count() > 0
    }
    acc.distinct()
  }

  /**
   * J3 connected components over an undirected edge list, for xref-based
   * entity merging: nodes connected through `oboInOwl:hasDbXref` links
   * collapse to one canonical entity (min CURIE in the component).
   *
   * Algorithm: large-star/small-star-style label propagation — iterate
   * `label(x) = min(label(x), min(label(neighbors)))` to fixpoint. Ontology
   * xref graphs are shallow (diameter ≤ ~10), so few iterations.
   *
   * @param edges columns (a, b) — undirected pairs of CURIEs
   * @return (curie, component) — component = min CURIE reachable
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)

    var labels = sym.select(col("a").as("curie"))
      .distinct()
      .withColumn("component", col("curie"))
      .localCheckpoint(true)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate = min over {own label} ∪ {labels of neighbors}
      val neighborLabels = sym
        .join(labels.withColumnRenamed("curie", "b_curie"), sym("b") === col("b_curie"))
        .select(col("a").as("curie"), col("component"))
      val updated = labels.select(col("curie"), col("component"))
        .unionByName(neighborLabels)
        .groupBy("curie").agg(min("component").as("component"))
        .localCheckpoint(true)
      changed = updated.alias("u")
        .join(labels.alias("l"), Seq("curie"))
        .filter(col("u.component") =!= col("l.component"))
        .limit(1).count()
      labels = updated
      iter += 1
    }
    labels
  }
}
