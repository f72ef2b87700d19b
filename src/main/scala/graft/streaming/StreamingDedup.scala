package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.icelite.Icelite
import graft.operators.DedupOps

/**
 * Streaming INGEST dedup — the steady-state corpus pipeline as a Structured
 * Streaming stage: each micro-batch of newly-crawled documents is
 * deduplicated (exactly and near — identical texts have identical minhash
 * signatures, so the minhash path subsumes exact dedup at any threshold
 * ≤ 1.0) against the signature store accumulated from every previous batch,
 * survivors append to the retained corpus, and the updated store becomes
 * the next batch's state.
 *
 * State lives in ICELITE SNAPSHOTS, not executor memory: the band-signature
 * store is bands × 16 bytes per retained document
 * ([[DedupOps.bandedSignatures]]), so a crash/restart loses nothing and
 * state never pressures the streaming runtime (contrast
 * `dropDuplicatesWithinWatermark`, whose state must fit the watermark
 * horizon — this stage's horizon is the whole corpus history).
 *
 * Exactly-once by idempotence: foreachBatch is at-least-once, so each batch
 * commits in a replay-safe order —
 *   1. survivors overwrite their own `batch_id=N` output partition (a
 *      replay rewrites, never appends — the [[IncrementalKg.writeBatch]]
 *      pattern);
 *   2. the updated store lands as an icelite snapshot TAGGED with the batch
 *      id, LAST — so a replayed batch whose tag already resolves skips all
 *      recomputation, and a crash before the tag landed recomputes from the
 *      previous store (the output rewrite in step 1 is idempotent).
 */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType)))

  val StoreTable = "dedup_store"

  private def emptyStore(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("band_idx", IntegerType, nullable = false),
        StructField("band_hash", LongType, nullable = false))))

  private def emptyHistory(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)

  /**
   * Process every not-yet-seen document file under `inputDir`
   * (Trigger.AvailableNow — the cron-driven snapshot-delta shape), appending
   * deduplicated survivors to `outDir` and maintaining the signature store
   * in `ic`. Returns the number of micro-batches run.
   *
   * Doc ids must be unique across the whole ingest history (the crawler's
   * contract; re-crawls carry NEW ids and are dropped by content).
   */
  def processAvailable(spark: SparkSession, inputDir: String, ic: Icelite,
                       outDir: String, checkpointDir: String,
                       threshold: Double = 0.8, k: Int = 16,
                       bands: Int = 4): Long = {
    val stream = spark.readStream.schema(docSchema).parquet(inputDir)
    var batches = 0L
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batches += 1
        val tag = s"ingest/batch=$batchId"
        if (ic.findByTag(StoreTable, tag).isEmpty) {
          val store = ic.currentSnapshotId(StoreTable)
            .map(id => ic.readSnapshot(spark, StoreTable, Some(id)))
            .getOrElse(emptyStore(spark))
          // the retained corpus IS the history the verify stage consults
          // (candidate ids only — a near-dup-sized semi-join, not a rescan).
          // History = the COMMITTED batch partitions, enumerated explicitly:
          //  - the batch's OWN partition is excluded (a crash-replay would
          //    otherwise read its half-written previous attempt as "history"
          //    and drop the whole batch as duplicates of itself);
          //  - a bare directory-exists check would wedge restarts forever
          //    after a first-batch crash (outDir holds only _temporary, and
          //    schema inference throws on every replay) — enumerating
          //    batch_id= dirs with an explicit schema reads exactly the
          //    completed partitions and nothing else.
          val committed = Option(new java.io.File(outDir).listFiles()).toSeq.flatten
            .filter(f => f.isDirectory && f.getName.startsWith("batch_id=") &&
              f.getName != s"batch_id=$batchId")
            .map(_.getAbsolutePath)
          val history =
            if (committed.isEmpty) emptyHistory(spark)
            else spark.read.schema(docSchema).parquet(committed: _*)
              .select("doc_id", "text")
          val (survivors, updatedStore) = DedupOps.incrementalMinhashDedup(
            batch, store, history, threshold, k, bands)
          // output first (idempotent overwrite), store tag LAST — see object doc
          survivors.select("doc_id", "text")
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          ic.writeSnapshot(updatedStore, StoreTable, tag)
          // retention: each batch persists the FULL cumulative store — without
          // expiry a long-running ingest accumulates O(batches) complete
          // copies (quadratic bytes). keepLast=2 is replay-safe: batch N can
          // only replay while its checkpoint is uncommitted, i.e. before
          // batch N+1 ever starts, so an expired older tag is never probed.
          ic.expireSnapshots(StoreTable, keepLast = 2)
          ()
        }
      }
      .start()
    q.awaitTermination()
    batches
  }
}
