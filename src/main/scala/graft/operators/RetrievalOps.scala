package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text retrieval over `documents(doc_id, text)`: a distributed
 * inverted index + Okapi BM25 top-k scoring — the lookup primitive a
 * training-data pipeline needs beyond dedup (find the corpus documents
 * matching an eval probe, a licensing string, a quality exemplar) without
 * shipping the corpus to an external search system.
 *
 * 100 TB design, stage by stage:
 *  - postings: one codegen'd scan; tokens leave the scan only as 64-bit
 *    term hashes — the groupBy carries narrow (doc_id, dl, th, tf) rows
 *    with full map-side combine (a document's repeated terms collapse
 *    before the exchange). Term-hash equality stands in for term equality
 *    (the fingerprint collision-freeness convention).
 *  - document frequency: a second narrow groupBy on th alone — vocabulary-
 *    sized output, corpus-sized input collapsed map-side.
 *  - query side: queries are human-scale (10⁰–10⁵ rows) → their exploded
 *    term hashes BROADCAST twice: once to look up df in the vocabulary
 *    table, once to probe the postings scan. Only postings matching a
 *    query term — sparse by construction — reach the per-(query, doc)
 *    scoring aggregation.
 *  - top-k: ranking window per query_id; Spark's WindowGroupLimit pushes
 *    the partial top-k below the exchange (the q_domain_cap plan shape),
 *    so a query matching half the corpus still only shuffles k·partitions
 *    candidate rows.
 *
 * Scoring is ORACLE-EXACT by construction: each per-term BM25 contribution
 * is one fixed-association double expression (identical on the DuckDB
 * side), cast to DECIMAL(28,8) BEFORE the sum — the decimal sum is exact
 * and order-independent, so distributed aggregation order can never flip a
 * rank (the q1_agg decimal-then-double convention applied to floats that
 * are COMPUTED, not stored).
 */
object RetrievalOps {

  /**
   * Inverted-index postings: (doc_id, dl, th, tf) — one row per distinct
   * term per document, dl = document token length carried denormalized so
   * scoring never joins a corpus-sized doc-length table.
   */
  def postings(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), split(DedupOps.normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .select(col("doc_id"), col("dl"), xxhash64(col("term")).as("th"))
      .groupBy("doc_id", "dl", "th")
      .agg(count(lit(1)).as("tf"))

  /**
   * Okapi BM25 top-k: for each query row (query_id, qtext), the k highest-
   * scoring documents as (query_id, doc_id, score, rank).
   *
   * idf uses the always-positive `ln(1 + (N - df + 0.5)/(df + 0.5))` form;
   * query terms are DISTINCT (bag-of-words probe, not weighted query);
   * terms absent from the corpus contribute nothing. Ties on the rounded
   * score break on doc_id ascending — deterministic on any engine.
   */
  def bm25TopK(documents: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val post = postings(documents)
    // corpus constants: ONE bounded driver action (a single aggregate row);
    // sums are exact longs so the derived avgdl double is reproducible
    val stats = documents
      .select(size(split(DedupOps.normText(col("text")), " ")).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs

    val qterms = queries
      .select(col("query_id"),
        array_distinct(split(DedupOps.normText(col("qtext")), " ")).as("qtoks"))
      .select(col("query_id"), explode(col("qtoks")).as("term"))
      .select(col("query_id"), xxhash64(col("term")).as("th"))
    // vocabulary df looked up via a broadcast probe of the tiny query side —
    // the vocabulary table itself is corpus-derived and never broadcast
    val qdf = post.groupBy("th").agg(count(lit(1)).as("df"))
      .join(broadcast(qterms), Seq("th"))

    // fixed-association contribution; every paren mirrored in the oracle SQL
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    post.join(broadcast(qdf), Seq("th"))
      .select(col("query_id"), col("doc_id"),
        contrib.cast("decimal(28,8)").as("w"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("w")).cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }
}
