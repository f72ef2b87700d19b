package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines, applied to
 * the `documents(doc_id, text, lang, source, n_chars)` table (and transcript
 * turns). All pure Catalyst expressions — codegen'd end to end, no UDFs — so
 * every operator scans at parquet-reader speed and pushes projection/filters
 * down (only `text` + key columns are read).
 */
object TextOps {

  /** Whitespace token count (empty text → 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Stopword lists per language — fixed, tiny, inlined as literals. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"))

  /** Count word-boundary occurrences of any of `words` (non-overlapping regex scan). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(text, lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /**
   * n-gram-heuristic language ID: argmax of per-language stopword hit counts,
   * deterministic tie-break on language code, "und" (undetermined) when no
   * list hits at all.
   */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(text, words).as("hits"), lit(lang).as("lang"))
    }
    // struct comparison = (hits, lang) lexicographic → ties break to the
    // lexicographically-LAST language code; deterministic and oracle-replicable
    val top = array_max(array(scored: _*))
    // NULL text → NULL guess (without the guard, every per-language hits
    // field is null, the struct max tie-breaks on lang alone, and the
    // `hits === 0` test is null → the otherwise-branch emits a LANGUAGE)
    when(text.isNull, lit(null).cast("string"))
      .when(top.getField("hits") === 0, lit("und")).otherwise(top.getField("lang"))
  }

  /**
   * Document quality score in [0,1] — length, punctuation-ratio and
   * stopword-ratio components (the standard pretraining-filter trio).
   * Deterministic, SQL-expressible (oracle-checkable in DuckDB).
   */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nTokens = tokenCount(text)
    val allStops = stopwords.values.flatten.toSeq.distinct
    val stops = stopwordHits(text, allStops)
    val punct = size(regexp_extract_all(text, lit("[\\.,;:!\\?]"), lit(0)))
    val lenScore = least(nChars.cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stops.cast("double") * lit(5.0) / greatest(nTokens, lit(1)).cast("double"), lit(1.0))
    val punctPenalty = least(punct.cast("double") * lit(10.0) / greatest(nChars, lit(1)).cast("double"), lit(1.0))
    round((lenScore + stopScore + (lit(1.0) - punctPenalty)) / lit(3.0), 4)
  }

  /**
   * Token-count via a BPE-ish regex (word pieces + digits + punctuation
   * runs) — the standard cheap token estimator when no tokenizer model ships
   * with the engine.
   */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /**
   * Deterministic 64-bit document fingerprint: xxhash64 over the
   * whitespace-normalized, casefolded text. Content-defined (whitespace runs
   * collapse), so trivial formatting changes don't change the fingerprint.
   */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** documents table → per-doc text metrics frame (one scan, all codegen). */
  def metrics(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      bpeishTokenCount(col("text")).as("n_bpeish"),
      langId(col("text")).as("lang_guess"),
      qualityScore(col("text")).as("quality"),
      fingerprint(col("text")).as("fingerprint"))
}
