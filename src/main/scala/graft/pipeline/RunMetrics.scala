package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/**
 * Run diagnostics (SURVEY S10/A3/A4 — robot.py GETTER_MESSAGES +
 * write_getter_warnings, and the north rule's per-partition lineage +
 * triple-count metrics): every lenient skip in the reference becomes an
 * accumulator bump here, flushed to a JSON file next to the outputs. Spark
 * accumulators aggregate across all executors with no extra job.
 */
final class RunMetrics(spark: SparkSession) extends Serializable {
  val turnsProcessed: LongAccumulator = spark.sparkContext.longAccumulator("graft.turns_processed")
  val mentionsEmitted: LongAccumulator = spark.sparkContext.longAccumulator("graft.mentions_emitted")
  val emptyTurns: LongAccumulator = spark.sparkContext.longAccumulator("graft.empty_turns")
  val skippedNodes: LongAccumulator = spark.sparkContext.longAccumulator("graft.skipped_nodes")
  val failedSources: LongAccumulator = spark.sparkContext.longAccumulator("graft.failed_sources")
  private val messages = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def addMessage(m: String): Unit = messages.add(m)

  def toJson: String = {
    val msgs = new scala.collection.mutable.ArrayBuffer[String]
    messages.forEach(m => msgs += m)
    // dedup mega-bucket guard (no silent caps): session-cumulative counts
    val (gb, gm) = graft.operators.DedupOps.bucketGuardCounts(spark)
    val msgJson = msgs.map(m => "\"" + m.replaceAll("[\"\\\\\\n\\r]", "_") + "\"").mkString("[", ",", "]")
    s"""{"turns_processed":${turnsProcessed.value},"mentions_emitted":${mentionsEmitted.value},""" +
      s""""empty_turns":${emptyTurns.value},"skipped_nodes":${skippedNodes.value},""" +
      s""""failed_sources":${failedSources.value},""" +
      s""""dedup_dropped_buckets":$gb,"dedup_dropped_bucket_members":$gm,""" +
      s""""messages":$msgJson}"""
  }

  /** Flush to a file (write_getter_warnings analogue, robot.py:371-374). */
  def write(path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, toJson.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
