package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.fixtures.{MiniOntology, Transcripts}
import graft.icelite.Icelite

/** Smoke driver: full KG pipeline on the mini ontology + synthetic transcripts. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.SparkDefaults.ExcludedRulesKey, graft.SparkDefaults.ExcludedRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ontPath = MiniOntology.writeTo("target/fixtures")
    val transcripts = Transcripts.synthetic(spark, nConvs = 200, seed = 42)
    val ic = new Icelite("target/icelite_demo")
    val t0 = System.nanoTime()
    val res = KgPipeline.run(spark, transcripts, ontPath, icelite = Some(ic))
    val n = res.triples.count()
    println(f"TRIPLES=$n  elapsed=${(System.nanoTime()-t0)/1e9}%.1fs  snapshot=${res.snapshotId}")
    res.triples.orderBy("subj", "pred", "obj").show(15, false)
    println("--- ontology edges in output:")
    res.triples.filter(org.apache.spark.sql.functions.col("pred") === "rdfs:subClassOf").show(30, false)
    println("--- kg_edges manifest:")
    println(ic.manifestJson("kg_edges", ic.currentSnapshotId("kg_edges").get))
    // dedup family smoke + guard visibility (no silent caps): run minhash
    // near-dup over the turn texts and surface the mega-bucket guard counts
    import org.apache.spark.sql.functions._
    val docs = transcripts.select(
      xxhash64(col("conv_id"), col("turn_idx")).as("doc_id"), col("text"))
    val nd = graft.operators.DedupOps.minhashNearDuplicates(docs, threshold = 0.8).count()
    val (gb, gm) = graft.operators.DedupOps.bucketGuardCounts(spark)
    println(s"DEDUP near_dup_pairs=$nd dropped_buckets=$gb dropped_members=$gm")
    // incremental-ingest smoke (the steady-state corpus shape): day-1 docs
    // seed the minhash signature STORE as an icelite snapshot — the only
    // state carried between batches — then the day-2 batch dedups against
    // the read-back store and writes the updated store as the next snapshot.
    // Split by id RANGE, not parity: incrementalMinhashDedup's survivor rule
    // equals full-corpus minhashSurvivors only when historical doc_ids
    // precede batch doc_ids — the demo must model the steady-state shape
    // under that documented precondition (doc_id is a signed xxhash64, so
    // the sign split is an id-range split with both halves populated)
    val day1 = docs.filter(col("doc_id") < 0)
    val day2 = docs.filter(col("doc_id") >= 0)
    val storeId = ic.writeSnapshot(
      graft.operators.DedupOps.bandedSignatures(day1), "minhash_store", tag = "day1")
    val (surv, updatedStore) = graft.operators.DedupOps.incrementalMinhashDedup(
      day2, ic.readSnapshot(spark, "minhash_store", Some(storeId)), day1, threshold = 0.8)
    val storeId2 = ic.writeSnapshot(updatedStore, "minhash_store", tag = "day1+day2")
    println(s"INCREMENTAL batch=${day2.count()} survivors=${surv.count()} " +
      s"store_rows=${ic.readSnapshot(spark, "minhash_store", Some(storeId2)).count()} " +
      s"store_snapshots=$storeId->$storeId2")
    // retention vacuum: repeated Demo runs accumulate one kg_edges/kg_nodes
    // snapshot each — expire all but the last two, keeping the mentions
    // snapshot's resume tag intact (re-runs must still reuse the stage)
    val expired = Seq("kg_edges", "kg_nodes", "minhash_store")
      .map(t => t -> ic.expireSnapshots(t, keepLast = 2))
    // mentions_top IS vacuumed too, protected only by its keepTags entry —
    // so the mentions_reusable flag genuinely exercises the tag-preservation
    // contract (keepLast=1 alone would also keep it today; the tag is the
    // load-bearing guard once more snapshots exist)
    ic.expireSnapshots("mentions_top", keepLast = 1, keepTags = Seq("run/mentions"))
    println(s"VACUUM ${expired.map { case (t, ids) => s"$t=${ids.size}" }.mkString(" ")} " +
      s"current=${ic.currentSnapshotId("kg_edges").getOrElse(-1L)} " +
      s"mentions_reusable=${ic.findByTag("mentions_top", "run/mentions").isDefined}")
    spark.stop()
  }
}
