package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * N-gram language-model quality scoring over `documents(doc_id, text)` —
 * the CCNet-style perplexity filter: score each document by its average
 * per-transition log-probability under an add-α smoothed bigram model
 * trained on the corpus itself (or any reference corpus). Under a
 * reference-trained model, junk sits far below the mean; under the
 * self-trained model, memorized degenerate repetition also shows up far
 * ABOVE it — either way the score is a FEATURE for a filter stage
 * (distance from the corpus distribution), not a hard-coded cut.
 *
 * 100 TB design:
 *  - counts: unigram and bigram tables are narrow groupBys over 64-bit
 *    hashes (term-hash equality stands in for term equality — the
 *    fingerprint collision-freeness convention); full map-side combine, so
 *    corpus-sized input collapses to vocabulary-sized output before any
 *    exchange. Bigram pairs are built INSIDE the token array (a
 *    `transform` over indices on a projection-staged attribute — the
 *    HOF-CSE rule) and leave the scan already hashed: text never crosses
 *    an exchange.
 *  - scoring: transitions join the two count tables on their hash keys
 *    (vocabulary-sized right sides; AQE picks broadcast when they fit),
 *    then one per-doc aggregation.
 *  - vocabulary size V is ONE bounded driver action (a single count row),
 *    inlined as a literal so both engines fold the same constant.
 *
 * ORACLE-EXACT by the BM25 convention: each transition's
 * `ln((c2 + α) / (c1 + α·V))` is one fixed-association double expression,
 * cast to DECIMAL(28,8) BEFORE the sum — distributed aggregation order can
 * never change a score. Documents with fewer than 2 tokens have no
 * transitions and are excluded (their quality signal belongs to the length
 * filters, not the LM).
 */
object NgramLm {

  private def tokensOf(documents: DataFrame): DataFrame = documents
    .select(col("doc_id"), split(DedupOps.normText(col("text")), " ").as("toks"))

  /** Per-transition (doc_id, h1, h12) rows — bigrams assembled inside the
    * staged token array and hashed before leaving the projection. */
  private def transitions(documents: DataFrame): DataFrame = tokensOf(documents)
    .filter(size(col("toks")) >= 2)
    .select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("bg"))
    .select(col("doc_id"),
      xxhash64(col("bg.w1")).as("h1"),
      xxhash64(col("bg.w1"), col("bg.w2")).as("h12"))

  /** Self-trained scoring: the model's counts come from `documents`
    * itself, so every transition is attested (the oracle-gated form —
    * both anomaly directions are signal: far BELOW the corpus mean =
    * unattested junk, far ABOVE = degenerate repetition the model
    * memorized). (doc_id, n_trans, avg_logprob), docs with ≥ 2 tokens. */
  def bigramLogProb(documents: DataFrame, alpha: Double = 0.5): DataFrame =
    bigramLogProbVs(documents, documents, alpha)

  /** Reference-trained scoring — the production CCNet shape: counts and
    * vocabulary from `reference` (a high-quality corpus), scores for
    * `target`. Transitions unseen in the reference fall back to the
    * smoothing mass: c2 → 0, and an unseen predecessor token also c1 → 0
    * (⇒ ln(α/(α·V)) = −ln V, the uniform floor). Identical to the
    * self-trained form when target eq reference (every bigram attested),
    * pinned by test. */
  def bigramLogProbVs(target: DataFrame, reference: DataFrame,
                      alpha: Double = 0.5): DataFrame = {
    val uni = tokensOf(reference)
      .select(explode(col("toks")).as("t"))
      .select(xxhash64(col("t")).as("h1"))
    val c1 = uni.groupBy("h1").agg(count(lit(1)).as("c1"))
    // vocabulary size: one bounded driver action, inlined as a literal
    val v = uni.agg(count_distinct(col("h1"))).head().getLong(0)
    require(v > 0,
      "bigram LM trained on an EMPTY reference corpus — every smoothed " +
        "probability would divide by zero; train on a non-empty corpus")
    val pairs = transitions(target)
    val c2 = transitions(reference).groupBy("h12").agg(count(lit(1)).as("c2"))

    // fixed-association transition log-prob; every paren mirrored in the
    // oracle SQL; decimal cast BEFORE the sum = order-independent total
    val contrib = log((coalesce(col("c2"), lit(0L)) + lit(alpha)) /
      (coalesce(col("c1"), lit(0L)) + lit(alpha) * lit(v.toDouble)))
    pairs
      .join(c2, Seq("h12"), "left")
      .join(c1, Seq("h1"), "left")
      .select(col("doc_id"), contrib.cast("decimal(28,8)").as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"),
        (sum(col("w")).cast("double") / count(lit(1))).as("avg_logprob"))
  }
}
