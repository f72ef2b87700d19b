package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`embeddings(vec_id,
 * embedding: array<float>, label)`).
 *
 *  - [[bruteForceTopK]]: exact cosine top-k of the corpus against a SMALL
 *    broadcast query set — the correctness baseline. O(corpus × queries) dot
 *    products, all inside codegen (`zip_with`/`aggregate`), one window.
 *  - [[annTopK]]: hyperplane-LSH bucketed approximate variant — the scale
 *    path. Corpus is bucketed once (16-byte rows shuffle, not vectors);
 *    queries probe only their own bucket, so cost per query is
 *    corpus/2^planes. Recall is tunable via `planes`.
 */
object SimilarityOps {

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed; public so
    * oracle SQL can inline the exact same plane literals for DuckDB). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit bucket id of `v` under `nPlanes` fixed hyperplanes — native
    * expression (graft.functions.HyperplaneBucket): the Catalyst-HOF
    * composition creates an nPlanes×dim literal tree with seconds of janino
    * compile time per plan. */
  def hyperplaneBucket(v: Column, nPlanes: Int = 8, dim: Int = 64): Column =
    graft.functions.HyperplaneBucket(v,
      planes(nPlanes, dim).map(_.toArray).toArray)

  /** Exact cosine between two vector columns. */
  def cosine(a: Column, b: Column): Column = DedupOps.cosine(a, b)

  /**
   * Exact top-k: every (query, corpus) cosine, ranked per query.
   * `queries(query_id, qvec)` must be small — it is broadcast; the corpus is
   * scanned once, never shuffled (the only exchange is the per-query window,
   * partitioned by query_id — #queries × k rows).
   */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * ANN top-k: corpus bucketed by hyperplane LSH; each query MULTI-PROBES its
   * own bucket plus every 1-bit-flip neighbor (the standard recall lever —
   * points near a hyperplane land on either side), then exact re-rank. At
   * 100 TB the bucketed corpus is written partitioned by bucket → each probe
   * is a partition-pruned scan; probes × queries stays broadcast-small.
   */
  def annTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
              nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val corpus = embeddings.withColumn("bucket", hyperplaneBucket(col("embedding"), nPlanes, dim))
    val probes = (0 until nPlanes).map(i => col("bucket0").bitwiseXOR(lit(1L << i)))
    val qs = queries
      .withColumn("bucket0", hyperplaneBucket(col("qvec"), nPlanes, dim))
      .withColumn("bucket", explode(array(col("bucket0") +: probes: _*)))
      .drop("bucket0")
    val scored = corpus.join(broadcast(qs), "bucket")
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("qvec")), 6).as("cos"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
