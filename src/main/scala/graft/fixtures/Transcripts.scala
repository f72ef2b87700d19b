package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic transcripts `(conv_id, turn_idx, role, text, tool,
 * ts)` — the target corpus shape from BASELINE.json `input_hint`. Two
 * generators:
 *
 *  1. [[fromDocuments]] — derives a transcript table from the driver-provided
 *     `documents.parquet` with SQL-expressible arithmetic only, so the exact
 *     same table can be reconstructed inside DuckDB for oracle checks.
 *
 *  2. [[synthetic]] — arbitrary-scale generator built ENTIRELY from Catalyst
 *     expressions over `spark.range` (xxhash64-seeded word choice, sequence +
 *     posexplode for turns), so generation itself is distributed,
 *     deterministic for a fixed seed, and never materializes on the driver.
 *     Includes a heavy-tail conversation-length distribution to exercise
 *     skew/salting (SURVEY J4).
 */
object Transcripts {

  /** Fixed vocabulary; overlaps MiniOntology labels/synonyms (planted mentions). */
  val vocab: Seq[String] = Seq(
    "the", "a", "data", "table", "row", "column", "value", "key", "line",
    "fast", "slow", "small", "big", "quality", "merge", "sort", "join",
    "filter", "scan", "window", "query", "stream", "batch", "group",
    "spark", "hash", "order", "part", "customer", "agg", "vector", "dup",
    "quick", "large", "little", "huge", "trait", "velocity", "noise", "x7")

  /**
   * DuckDB-reproducible transcripts from documents:
   *   conv_id  = 'c' || (doc_id % 97)
   *   turn_idx = doc_id // 97
   *   role     = user/assistant/tool by doc_id % 3
   *   tool     = 'search' when role='tool' else NULL
   *   ts       = epoch + doc_id seconds
   */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        concat(lit("c"), (col("doc_id") % 97).cast("string")).as("conv_id"),
        (col("doc_id") / 97).cast("int").as("turn_idx"),
        element_at(array(lit("user"), lit("assistant"), lit("tool")),
          (col("doc_id") % 3).cast("int") + 1).as("role"),
        col("text"),
        when(col("doc_id") % 3 === 2, lit("search")).otherwise(lit(null).cast("string")).as("tool"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
  }

  /** Matching DuckDB SQL for [[fromDocuments]] (oracle side). */
  val fromDocumentsSql: String =
    """SELECT 'c' || CAST(doc_id % 97 AS VARCHAR) AS conv_id,
      |       CAST(doc_id // 97 AS INT) AS turn_idx,
      |       CASE doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
      |       text,
      |       CASE WHEN doc_id % 3 = 2 THEN 'search' END AS tool,
      |       to_timestamp(1700000000 + doc_id) AS ts
      |FROM documents""".stripMargin

  /**
   * Distributed deterministic generator. `nConvs` conversations; turns per
   * conversation = 4 + h%12, except every 1000th conversation gets a
   * `skewFactor`× longer tail (a single multi-thousand-turn conversation must
   * not serialize a task — SURVEY §7.5.3).
   */
  def synthetic(spark: SparkSession, nConvs: Long, seed: Long = 42L,
                wordsPerTurn: Int = 24, skewFactor: Int = 50): DataFrame = {
    val vocabArr = array(vocab.map(lit): _*)
    val nWords = vocab.size

    spark.range(nConvs)
      .select(
        concat(lit("conv"), col("id")).as("conv_id"),
        col("id").as("cid"),
        when(col("id") % 1000 === 0,
          (lit(4) + pmod(xxhash64(col("id"), lit(seed)), lit(12))) * skewFactor)
          .otherwise(lit(4) + pmod(xxhash64(col("id"), lit(seed)), lit(12)))
          .cast("int").as("n_turns"))
      .select(col("conv_id"), col("cid"),
        posexplode(sequence(lit(0), col("n_turns") - 1)).as(Seq("turn_idx", "_t")))
      .select(
        col("conv_id"),
        col("turn_idx"),
        element_at(array(lit("user"), lit("assistant"), lit("tool")),
          pmod(col("turn_idx"), lit(3)).cast("int") + 1).as("role"),
        // text: wordsPerTurn words chosen by a per-(conv,turn,i) hash
        concat_ws(" ",
          transform(sequence(lit(0), lit(wordsPerTurn - 1)),
            i => element_at(vocabArr,
              pmod(xxhash64(col("cid"), col("turn_idx"), i, lit(seed)), lit(nWords)).cast("int") + 1))).as("text"),
        when(pmod(col("turn_idx"), lit(3)) === 2, lit("search"))
          .otherwise(lit(null).cast("string")).as("tool"),
        timestamp_seconds(lit(1700000000L) + col("cid") * 10000 + col("turn_idx")).as("ts"))
  }
}
