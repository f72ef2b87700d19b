package graft.icelite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/**
 * Bucketed EXTERNAL parquet tables over a plain directory — the storage
 * layout that lets a steady-state ingest join against corpus-sized state
 * WITHOUT re-shuffling that state on every batch.
 *
 * Spark only exposes hash-bucketed layouts through the catalog
 * (`bucketBy(...).saveAsTable`), and only trusts the bucketing of a scan
 * that goes through `spark.table(...)`. This helper hides both halves:
 *
 *  - [[write]] writes `df` bucket-hashed on `spec.cols` into exactly
 *    `spec.numBuckets` files under `path` (via a throwaway external-table
 *    name; dropping an external table keeps its files), after clearing the
 *    target dir — so a replayed/retried write REWRITES instead of
 *    appending (the [[graft.streaming.IncrementalKg]] idempotence pattern).
 *  - [[read]] registers (once per session) an external bucketed table over
 *    `path` and returns `spark.table(...)`, whose scan reports
 *    `HashPartitioning(cols, numBuckets)`. A join or groupBy keyed on
 *    `spec.cols` therefore needs NO exchange on this side — only the other
 *    (batch-sized) side shuffles — and an `IN`/`=` filter on the bucket
 *    columns prunes whole bucket FILES at the scan
 *    (`SelectedBucketsCount` in the plan), i.e. point lookups.
 *
 * Bucket-file naming (`..._00003.c000...`) carries the bucket id, so a
 * FRESH session (new process, no catalog state) re-registers the same
 * directory with the same spec and gets the same shuffle-free reads —
 * the catalog entry is derived state, the directory is the truth.
 */
object BucketedTables {

  /** numBuckets + bucket/sort columns. At 100 TB size numBuckets so one
    * bucket's rows fit an executor (store rows are ~16 B each). */
  final case class BucketSpec(numBuckets: Int, cols: Seq[String]) {
    require(numBuckets > 0 && cols.nonEmpty, s"bad bucket spec: $this")
  }

  private def absPath(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.makeQualified(p).toString
  }

  /** Deterministic session-catalog name for (path, spec): same inputs →
    * same name, so repeated reads reuse one registration; a different spec
    * over the same path gets a different name instead of a silent mismatch. */
  private[icelite] def tableName(qualifiedPath: String, spec: BucketSpec): String = {
    val key = s"$qualifiedPath|${spec.numBuckets}|${spec.cols.mkString(",")}"
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    s"graft_bkt_$h"
  }

  /** Drop this session's reader registration over `path` (no-op when none).
    * r7 (ADVICE): compaction DELETES folded batch dirs, and a long-lived
    * ingest session would otherwise accumulate catalog entries pointing at
    * dead locations — harmless but unbounded, and a confusing surface in
    * spark.catalog listings. Callers that fold dirs away clean up here. */
  def dropRegistration(spark: SparkSession, path: String, spec: BucketSpec): Unit = {
    val name = tableName(absPath(spark, path), spec)
    if (spark.catalog.tableExists(name)) {
      spark.sql(s"DROP TABLE IF EXISTS `$name`"); ()
    }
  }

  /**
   * Write `df` as a bucketed parquet directory at `path` (target cleared
   * first — idempotent under replay). One file per bucket: the pre-write
   * `repartition(numBuckets, cols)` uses the SAME murmur3 hash as the
   * bucketing, so each task holds exactly one bucket's rows.
   */
  def write(df: DataFrame, path: String, spec: BucketSpec): Unit = {
    val spark = df.sparkSession
    val qualified = absPath(spark, path)
    val hp = new org.apache.hadoop.fs.Path(qualified)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hp)) fs.delete(hp, true)
    // throwaway EXTERNAL table name: saveAsTable is the only bucketed-write
    // API; dropping the external entry afterwards keeps the files and leaves
    // the catalog clean (readers register their own deterministic name)
    val tmp = s"graft_bkt_w_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    try {
      df.repartition(spec.numBuckets, spec.cols.map(col): _*)
        .write.mode("overwrite")
        .option("path", qualified)
        .bucketBy(spec.numBuckets, spec.cols.head, spec.cols.tail: _*)
        .sortBy(spec.cols.head, spec.cols.tail: _*)
        .format("parquet")
        .saveAsTable(tmp)
    } finally {
      if (spark.catalog.tableExists(tmp)) spark.sql(s"DROP TABLE `$tmp`")
    }
    // LOUD guard on the one-file-per-bucket contract: the pre-write
    // repartition can be legitimately planned away when the input is a
    // single scan of an identically-bucketed table (already one task per
    // bucket — still ≤ numBuckets files), but a UNION of such scans
    // spuriously satisfies the same requirement and would silently write
    // one file per SOURCE partition (callers must stage unions through
    // plain scans — see StreamingDedup.compactHistory)
    val written = fs.listStatus(hp).count(_.getPath.getName.endsWith(".parquet"))
    require(written <= spec.numBuckets,
      s"bucketed write to $path produced $written files for ${spec.numBuckets} " +
        "buckets — the bucket-aligning repartition was planned away " +
        "(union-of-bucketed-scans input?); stage through a plain scan")
    // invalidate any reader registration over this path: the catalog caches
    // the table's file listing, and a rewrite (batch replay) would otherwise
    // serve the OLD files to an already-registered reader in this session
    val reader = tableName(qualified, spec)
    if (spark.catalog.tableExists(reader)) spark.catalog.refreshTable(reader)
  }

  /**
   * Read the bucketed directory back through the catalog (registering an
   * external table on first use in this session), so the scan carries
   * `HashPartitioning(cols, numBuckets)` and bucket-prunes on filters.
   *
   * @param schema explicit schema (required when the directory can be empty
   *   — parquet inference throws on a dir with no data files); inferred
   *   from the parquet footers when absent
   */
  def read(spark: SparkSession, path: String, spec: BucketSpec,
           schema: Option[StructType] = None): DataFrame = {
    val qualified = absPath(spark, path)
    val name = tableName(qualified, spec)
    if (!spark.catalog.tableExists(name)) {
      val ddlSchema = schema.getOrElse(spark.read.parquet(qualified).schema).toDDL
      val colList = spec.cols.map(c => s"`$c`").mkString(", ")
      try {
        spark.sql(
          s"""CREATE TABLE `$name` ($ddlSchema)
             |USING PARQUET
             |CLUSTERED BY ($colList) SORTED BY ($colList)
             |INTO ${spec.numBuckets} BUCKETS
             |LOCATION '$qualified'""".stripMargin)
      } catch {
        // two threads of one session racing on first registration: the
        // loser's CREATE throws table-exists — the winner's entry is
        // identical (name is content-derived), so just read it
        case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException => ()
      }
    } else {
      // a replayed write may have rewritten the files since registration
      spark.catalog.refreshTable(name)
    }
    spark.table(name)
  }
}
