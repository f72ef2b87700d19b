package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ground.Grounder
import graft.model.Turn

/**
 * Stateful streaming operators over the transcript stream (SURVEY §2.8 /
 * builder contract: "watermarks + windowed aggs; mapGroupsWithState /
 * flatMapGroupsWithState for custom state").
 *
 * Pattern at 10^12-turn scale: the stateless per-turn work (mention counting
 * via the broadcast automaton) happens map-side BEFORE any state, so the
 * keyed state store only ever carries one small summary row per OPEN
 * conversation — never text. Watermarks bound the store: a conversation idle
 * past the gap times out, emits its final summary, and frees its state.
 */
object StatefulOps {

  /** Map-side per-turn mention counts (stateless; text never reaches state). */
  final case class TurnMentions(conv_id: String, turn_idx: Int, n_mentions: Int,
                                ts: java.sql.Timestamp)

  /** Closed-conversation summary emitted when a conversation goes idle. */
  final case class ConvSummary(conv_id: String, n_turns: Long, n_mentions: Long,
                               max_turn_idx: Int)

  /** Per-conversation state: summary so far + last event time seen. */
  final case class ConvState(summary: ConvSummary, lastEventMs: Long)

  /** Stateless stage: count automaton matches per turn (works on both batch
    * and streaming Datasets — Structured Streaming's unified Dataset API). */
  def mentionCounts(turns: Dataset[Turn], grounder: Broadcast[Grounder]): Dataset[TurnMentions] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
      val g = grounder.value
      it.map { t =>
        var n = 0
        if (t.text != null && t.text.nonEmpty)
          g.automaton.findAllInto(graft.ground.AhoCorasick.normalize(t.text), (_, _, _) => n += 1)
        TurnMentions(t.conv_id, t.turn_idx, n, t.ts)
      }
    }
  }

  /**
   * Session-style conversation summaries via `flatMapGroupsWithState`:
   * accumulate (turns, mentions, max turn) per conversation; when the
   * watermark passes `idleGapMs` beyond the conversation's last event, the
   * state times out and the FINAL summary is emitted (append-mode semantics —
   * one row per closed conversation, exactly once).
   */
  def conversationSummaries(turnMentions: Dataset[TurnMentions],
                            watermarkDelay: String = "10 minutes",
                            idleGapMs: Long = 30L * 60 * 1000): Dataset[ConvSummary] = {
    val spark = turnMentions.sparkSession
    import spark.implicits._
    turnMentions
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (convId: String, rows: Iterator[TurnMentions], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val out = state.get.summary
            state.remove()
            Iterator.single(out)
          } else {
            val prev = state.getOption.getOrElse(
              ConvState(ConvSummary(convId, 0L, 0L, -1), Long.MinValue))
            var nTurns = prev.summary.n_turns
            var nMentions = prev.summary.n_mentions
            var maxIdx = prev.summary.max_turn_idx
            var lastMs = prev.lastEventMs
            rows.foreach { r =>
              nTurns += 1
              nMentions += r.n_mentions
              if (r.turn_idx > maxIdx) maxIdx = r.turn_idx
              if (r.ts != null && r.ts.getTime > lastMs) lastMs = r.ts.getTime
            }
            state.update(ConvState(ConvSummary(convId, nTurns, nMentions, maxIdx), lastMs))
            // close when the watermark passes last activity + gap (must stay
            // strictly ahead of the current watermark or Spark rejects it)
            state.setTimeoutTimestamp(
              math.max(lastMs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /**
   * Streaming exact dedup with BOUNDED state: drop any document whose
   * normalized-text fingerprint was already seen within the watermark
   * horizon (`dropDuplicatesWithinWatermark` — the state store evicts
   * fingerprints older than the watermark, so an unbounded stream never
   * accumulates unbounded dedup state; the batch `exactDedup` is the
   * full-history counterpart).
   *
   * @param docs streaming Dataset with (doc_id, text, ts) columns
   */
  def streamingExactDedup(docs: DataFrame,
                          watermarkDelay: String = "1 hour"): DataFrame =
    docs
      // SAME fingerprint as the batch path (TextOps.fingerprint =
      // xxhash64 ∘ DedupOps.normText) — batch and streaming dedup must never
      // disagree on what counts as a duplicate
      .withColumn("fp", graft.operators.TextOps.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /**
   * Watermarked tumbling-window mention-volume aggregation: late events past
   * `watermarkDelay` are dropped and windows finalize exactly once (append
   * mode). The streaming counterpart of the batch `q_events_hourly` shape.
   */
  def mentionsPerWindow(turnMentions: Dataset[TurnMentions],
                        windowLength: String = "1 hour",
                        watermarkDelay: String = "2 hours"): DataFrame =
    turnMentions
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength))
      .agg(count(lit(1)).as("n_turns"), sum(col("n_mentions")).as("n_mentions"))
      .select(col("window.start").as("window_start"), col("n_turns"), col("n_mentions"))
}
