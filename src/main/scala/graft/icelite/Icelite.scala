package graft.icelite

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * `icelite` — a minimal Iceberg-shaped snapshot/manifest table layer over
 * partitioned Parquet (SURVEY §7.1: no Iceberg runtime jar exists in this
 * sandbox, so the engine implements the subset of table-format semantics the
 * north rule needs: snapshot isolation, per-partition lineage + triple-count
 * metrics, and checkpoint-resume). The API is shaped so a real Iceberg
 * catalog (`df.writeTo(...)`) can be swapped in without touching pipeline
 * code.
 *
 * Layout:
 *   root/<table>/data/snap-<id>/part-*.parquet    immutable snapshot data
 *   root/<table>/snapshots/<id>.json              manifest: row count, per-partition counts, parent, tag
 *   root/<table>/current                          pointer file: latest snapshot id
 *
 * Writes are atomic-enough for a single driver: data first, manifest second,
 * pointer last — a crashed write leaves the previous snapshot current, which
 * is exactly the resume contract (kill after stage k → rerun reuses every
 * stage whose manifest landed; BASELINE.md resumability row).
 */
final class Icelite(rootDir: String) extends Serializable {

  def root: String = rootDir

  private def tableDir(table: String): Path = Paths.get(rootDir, table)

  def currentSnapshotId(table: String): Option[Long] = {
    val p = tableDir(table).resolve("current")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong) else None
  }

  /** Tags are stored JSON-safe; probe and store MUST sanitize identically or
    * a tag containing a quote/backslash/newline would never resume. */
  private def sanitizeTag(tag: String): String = tag.replaceAll("[\"\\\\\\n\\r]", "_")

  /** Find an existing snapshot carrying `tag` (tag = content key for resume). */
  def findByTag(table: String, tag: String): Option[Long] = {
    val snaps = tableDir(table).resolve("snapshots")
    if (!Files.exists(snaps)) return None
    val stream = Files.list(snaps) // Files.list holds a directory fd until closed
    try {
      stream.iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .flatMap { mf =>
          val txt = new String(Files.readAllBytes(mf), "UTF-8")
          // manifest is flat JSON written by us; a contains-check on the exact
          // (sanitized, like writeSnapshot stores it) tag field is safe
          if (txt.contains(s""""tag":"${sanitizeTag(tag)}"""")) {
            Some(mf.getFileName.toString.stripSuffix(".json").toLong)
          } else None
        }.toList.sorted.lastOption
    } finally stream.close()
  }

  /**
   * Write `df` as the next snapshot of `table`. Collects per-partition row
   * counts (lineage metrics, north-rule requirement) in the same pass via a
   * pre-shuffle `spark_partition_id` aggregation.
   *
   * @param tag content key for checkpoint-resume (e.g. "stage=dedup/input=snap-3")
   * @return snapshot id
   */
  def writeSnapshot(df: DataFrame, table: String, tag: String = "",
                    partitionBy: Seq[String] = Nil): Long = {
    val dir = tableDir(table)
    Files.createDirectories(dir.resolve("snapshots"))
    val id = currentSnapshotId(table).getOrElse(0L) + 1L
    val dataPath = dir.resolve(s"data/snap-$id")

    val persisted = df.persist()
    try {
      val writer = persisted.write.mode("overwrite")
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(dataPath.toString)

      val partCounts = persisted
        .groupBy(spark_partition_id().as("partition_id")).count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val rowCount = partCounts.map(_._2).sum

      val safeTag = sanitizeTag(tag)
      val manifest =
        s"""{"snapshot_id":$id,"parent_id":${currentSnapshotId(table).getOrElse(-1L)},""" +
          s""""row_count":$rowCount,"tag":"$safeTag","data_path":"$dataPath",""" +
          s""""partition_counts":{${partCounts.map { case (p, c) => s""""$p":$c""" }.mkString(",")}}}"""
      Files.write(dir.resolve(s"snapshots/$id.json"), manifest.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.write(dir.resolve("current"), id.toString.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      id
    } finally persisted.unpersist()
  }

  def readSnapshot(spark: SparkSession, table: String, id: Option[Long] = None): DataFrame = {
    val sid = id.orElse(currentSnapshotId(table))
      .getOrElse(throw new IllegalStateException(s"icelite table $table has no snapshots"))
    spark.read.parquet(tableDir(table).resolve(s"data/snap-$sid").toString)
  }

  /**
   * Checkpoint-resume helper: if a snapshot tagged `tag` already exists,
   * read it back; otherwise compute, write, and read back. Reading back (not
   * reusing the in-memory df) guarantees a resumed run and a fresh run see
   * byte-identical inputs for every downstream stage.
   */
  def materialize(spark: SparkSession, table: String, tag: String)(compute: => DataFrame): DataFrame =
    findByTag(table, tag) match {
      case Some(id) => readSnapshot(spark, table, Some(id))
      case None =>
        val id = writeSnapshot(compute, table, tag)
        readSnapshot(spark, table, Some(id))
    }

  def manifestJson(table: String, id: Long): String =
    new String(Files.readAllBytes(tableDir(table).resolve(s"snapshots/$id.json")), "UTF-8")
}
