package graft

import org.apache.spark.sql.SparkSession

import graft.fixtures.{MiniOntology, Transcripts}
import graft.pipeline.KgPipeline

/**
 * Benchmark main. Prints EXACTLY ONE JSON line on stdout:
 * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
 *  "scaling":{...}}
 *
 * Two parts:
 *  1. the north-rule N-vs-4N scaling protocol: the SAME KG-pipeline job on
 *     the SAME conv_id-bucketed parquet corpus at local[2], local[8] and
 *     local[32] (parallelism levels stand in for cluster sizes — no real
 *     cluster in this sandbox), reporting turns/sec at each level plus the
 *     scaling efficiencies (thr_8/thr_2)/4 (headline; per-core DRAM
 *     bandwidth constant) and (thr_32/thr_8)/4 (single-box shared-DRAM
 *     regime);
 *  2. per-query wall time (min of 2) of every SparkEntry query at
 *     SPARK_GRAFT_SF_DIR on a local[SPARK_GRAFT_CPUS] session.
 */
object Bench {

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // task-per-file on the bucketed corpus (files are the bucket unit; a
      // conversation never splits across tasks, and both parallelism levels
      // see identical fine-grained task sets)
      .config("spark.sql.files.openCostInBytes", (128L * 1024 * 1024).toString)
      // shuffle spill to tmpfs: the sandbox measures CPU scaling, not the
      // sandbox's single virtio disk (a real cluster has per-node disks)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config(graft.SparkDefaults.ExcludedRulesKey, graft.SparkDefaults.ExcludedRules)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Corpus storage layout of the north star: conv_id-bucketed files (the
    * Iceberg `bucket(conv_id)` layout), written ONCE outside every timed
    * region. 4 buckets/core at the high level → fine-grained, identical task
    * sets at both parallelism levels. */
  val CorpusPath = "/dev/shm/graft-bench-corpus"
  val CorpusBuckets = 128

  private def writeCorpus(nConvs: Long): Unit = {
    val s = newSession(32)
    val df = Transcripts.synthetic(s, nConvs)
    df.repartition(CorpusBuckets, org.apache.spark.sql.functions.col("conv_id"))
      // zstd over snappy: measured (CodecProbe, round 3) 551→328 MB corpus,
      // 2.45→2.17 s at local[32] and eff_8_32 0.70→0.80 — in the saturated
      // shared-DRAM band, fewer bytes through the memory controller beats
      // cheaper per-byte decode (and zstd is the common Iceberg table codec)
      .write.mode("overwrite").option("compression", "zstd").parquet(CorpusPath)
    s.stop()
  }

  /**
   * Pipeline passes at one parallelism level: ontology context prepared once
   * (amortized at 10^12-turn scale — rebuilding the automaton per batch
   * would serialize the cluster on the driver), then full corpus passes,
   * each wall-timed.
   *
   * Reads the conv_id-bucketed parquet corpus (Iceberg-layout storage; the
   * zero-shuffle deployment shape). The salted-repartition un-bucketed path
   * is exercised by the test suite and ScalingProbe, not timed here.
   */
  private def pipelineRun(spark: SparkSession, reps: Int,
                          maxReps: Int): (Long, Long, Long, Seq[Double]) = {
    val input = spark.read.parquet(CorpusPath)
    val nTurns = input.count() // warm page cache outside timing
    val ontPath = MiniOntology.writeTo("target/fixtures")
    // 250k two-token synonyms ≈ a mid-size production lexicon (Bioregistry
    // aggregates 10^5-10^6 literal mappings; UMLS ~4M). The 50k round-1
    // automaton understated per-byte matching work enough that the bench
    // measured the memory subsystem, not the engine.
    val ctx = KgPipeline.prepare(spark, ontPath,
      extraLexicon = Some(Transcripts.bigLexicon(spark, pairTerms = 250000)))
    var triples = 0L
    var sig = 0L
    // run to plateau: per-thread row volume differs between levels, so C2
    // warm-up needs a different number of passes per level — fixed rep
    // counts under-warm whichever level has more threads. Stop when the
    // running min hasn't improved >3% for two consecutive passes (capped —
    // low-thread levels pay tens of seconds per pass).
    val times = scala.collection.mutable.ArrayBuffer[Double]()
    var staleness = 0
    while (times.size < reps || (staleness < 2 && times.size < maxReps)) {
      import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}
      val t0 = System.nanoTime()
      // count + order-invariant content signature in ONE pass: a cross-level
      // nondeterminism that swapped triple A for B while keeping the count
      // equal would otherwise still report identical_output. XOR, not sum —
      // sum overflows Long and ANSI mode (Spark 4 default) turns that into a
      // task failure; XOR is commutative and overflow-free, and the triple
      // set is globally distinct so entries cannot self-cancel
      val r = KgPipeline.runPrepared(spark, input, ctx, inputConvPartitioned = true)
        .triples
        .agg(count(lit(1)).as("n"),
          bit_xor(xxhash64(col("subj"), col("pred"), col("obj"))).as("sig"))
        .collect()(0)
      triples = r.getLong(0)
      sig = if (r.isNullAt(1)) 0L else r.getLong(1)
      val sec = (System.nanoTime() - t0) / 1e9
      val prevMin = if (times.isEmpty) Double.MaxValue else times.min
      times += sec
      staleness = if (sec < prevMin * 0.97) 0 else staleness + 1
    }
    (nTurns, triples, sig, times.toSeq)
  }

  def main(args: Array[String]): Unit = {
    // the contract stdout line is parsed as JSON: the f"" interpolator uses
    // the default locale, and a comma-decimal locale (de_DE…) would print
    // {"q":1,234} — pin the whole bench process to ROOT
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "300000").toLong

    // ---- part A (run FIRST, in fresh JVM sessions): N vs 4N scaling -------
    // measured before the 31-query sweep so JVM churn (codegen classes,
    // GC history from heterogeneous plans) cannot degrade the measurement.
    //
    // Protocol (north rule; no real cluster in this sandbox, so two
    // parallelism levels stand in for two cluster sizes):
    //  - corpus written ONCE as conv_id-bucketed parquet (Iceberg layout);
    //  - THREE interleaved levels — local[2], local[8], local[32] — fresh
    //    sessions, multiple passes each, min-of-all-passes per level
    //    (interleaving removes level-order JIT bias; this shared VM scatters
    //    single measurements ±15-40%);
    //  - headline N-vs-4N efficiency = local[2] → local[8]: per-core memory
    //    bandwidth stays constant, which is what actually happens when a
    //    cluster grows from N to 4N EXECUTORS (each node brings its own
    //    DRAM/NICs). local[8] → local[32] on ONE box drives the single
    //    shared memory controller into saturation — that ceiling is the
    //    hardware's, not the pipeline's, and is reported alongside as
    //    efficiency_8_32 with the roofline decomposition in BASELINE.md
    //    (a pure cache-scan "pipeline" measures ~0.6 on the same box);
    //  - extra rounds until the efficiency estimate is stable within 2%
    //    twice in a row (capped), so the reported point sits inside the
    //    observed band rather than on a cold tail (round-1 lesson).
    writeCorpus(benchConvs)
    val levels = Seq(2, 8, 32)
    val maxRepsFor = Map(2 -> 3, 8 -> 5, 32 -> 8) // low levels pay ~25s/pass
    val times = scala.collection.mutable.Map[Int, Seq[Double]]().withDefaultValue(Seq.empty)
    val turns = scala.collection.mutable.Map[Int, Long]()
    val triples = scala.collection.mutable.Map[Int, Long]()
    val sigs = scala.collection.mutable.Map[Int, Long]()
    def oneRound(reps: Int): Unit = for (cpus <- levels) {
      val s = newSession(cpus)
      val (t, tr, sg, ts) = pipelineRun(s, reps, maxRepsFor(cpus))
      turns(cpus) = t; triples(cpus) = tr; sigs(cpus) = sg; times(cpus) = times(cpus) ++ ts
      s.stop()
    }
    def effNow: Double = times(2).min / times(8).min / 4.0
    oneRound(reps = 2)
    oneRound(reps = 2)
    var stable = 0
    var prevEff = effNow
    var extra = 0
    while (stable < 2 && extra < 3) {
      oneRound(reps = 2)
      val e = effNow
      stable = if (math.abs(e - prevEff) <= 0.02 * prevEff) stable + 1 else 0
      prevEff = e
      extra += 1
    }
    val sec2 = times(2).min
    val sec8 = times(8).min
    val sec32 = times(32).min
    val thr2 = turns(2) / sec2
    val thr8 = turns(8) / sec8
    val thr32 = turns(32) / sec32
    val eff = (thr8 / thr2) / 4.0
    val eff832 = (thr32 / thr8) / 4.0
    val identical = triples(2) == triples(8) && triples(8) == triples(32) &&
      sigs(2) == sigs(8) && sigs(8) == sigs(32)

    // ---- part B: per-query timings --------------------------------------
    val spark1 = newSession(cpus)
    // session warm-up so the alphabetically-first query doesn't absorb
    // one-time JIT/codegen/FS costs
    try spark1.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect() catch { case _: Throwable => }
    // min of two runs per query: single-shot numbers on this shared VM carry
    // JIT/GC/codegen noise of up to 3x (q_closure measured 4s and 13s across
    // otherwise-identical rounds)
    // a crashing query must NOT be timed as a fast success (a regression
    // could masquerade as a speedup): its entry carries an "err" marker and
    // is excluded from the total
    final case class QStat(name: String, min: Double, max: Double, n: Int,
                           err: Option[String])
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { fn(spark1, sfDir).count(); None }
          catch { case t: Throwable => Some(t.toString) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val reps = scala.collection.mutable.ArrayBuffer(once(), once())
      def oks = reps.collect { case (t, None) => t }
      // adjudication rep: when the two clean samples spread > 25%, take a
      // third — per-query (min,max,n) then lets the round artifact
      // distinguish host drift from a real regression (round-3 verdict:
      // q_xref_merge +62% was unanswerable from min-of-2 alone)
      if (oks.size == reps.size && (oks.max - oks.min) > 0.25 * oks.min) reps += once()
      if (oks.nonEmpty)
        // a transient single-rep failure (GC/OOM blip) must not hide a clean
        // timing: err is carried ONLY when every rep failed
        QStat(name, oks.min, oks.max, oks.size, None)
      else {
        val ts = reps.map(_._1)
        QStat(name, ts.min, ts.max, 0, reps.head._2)
      }
    }
    spark1.stop()

    // strips EVERY control char (not just \n\r\t): a raw 0x00-0x1F anywhere in
    // an exception message would make the single contract stdout line invalid JSON
    def jsonSafe(s: String): String =
      s.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
    val qs = results.map {
      case QStat(k, v, _, _, None) => f""""$k":$v%.3f"""
      case QStat(k, v, _, _, Some(e)) => f""""$k":{"sec":$v%.3f,"err":"${jsonSafe(e)}"}"""
    }.mkString("{", ",", "}")
    // per-query variance alongside the headline min: (min, max, n clean reps)
    // — the drift-vs-regression adjudication data the round artifact lacked
    val qStats = results.map { r =>
      f""""${r.name}":{"min":${r.min}%.3f,"max":${r.max}%.3f,"n":${r.n}}"""
    }.mkString("{", ",", "}")
    val nErrs = results.count(_.err.isDefined)
    val total = results.collect { case QStat(_, v, _, _, None) => v }.sum
    def scaling(protocol: String) =
      f"""{"protocol":"$protocol",""" +
        f""""n_turns":${turns(8)},"n_triples":${triples(8)},""" +
        f""""sec_2":$sec2%.2f,"sec_8":$sec8%.2f,"sec_32":$sec32%.2f,""" +
        f""""turns_per_sec_2":$thr2%.0f,"turns_per_sec_8":$thr8%.0f,"turns_per_sec_32":$thr32%.0f,""" +
        f""""triples_per_sec_32":${triples(32) / sec32}%.0f,""" +
        f""""efficiency":$eff%.3f,""" +
        f""""efficiency_8_32":$eff832%.3f,""" +
        f""""identical_output":$identical}"""
    // the stdout CONTRACT line stays minimal: round-4's line grew to ~4.2 KB
    // (the query_stats map) and the driver's tail-window parser dropped it
    // (BENCH_r04 parsed:null) — per-query {min,max,n} detail and the full
    // protocol prose live ONLY in target/bench.json from round 5 on
    val shortProtocol = "N-vs-4N cores: local[2]/[8]/[32] interleaved fresh " +
      "sessions, min of passes; headline eff = 2 to 8; details in BASELINE.md"
    val longProtocol = "N vs 4N cores on the same seed-fixed conv_id-bucketed " +
      "parquet corpus (Iceberg layout, written once outside timing): headline = " +
      "local[2] vs local[8] (per-core DRAM bandwidth constant, as when a cluster " +
      "adds executors); local[8] vs local[32] saturates the single box's shared " +
      "memory controller and is reported as efficiency_8_32 (roofline " +
      "decomposition in BASELINE.md). Interleaved fresh-session rounds, min of " +
      "passes, stability-terminated"
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""query_errors":$nErrs,"sf":"$sfDir","scaling":${scaling(shortProtocol)}}"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""query_stats":$qStats,"query_errors":$nErrs,"sf":"$sfDir","scaling":${scaling(longProtocol)}}"""
    // belt and braces FIRST: the driver parses stdout, but sbt log decoration
    // has eaten the line before (round-1 parsed:null) — persist the full
    // detail to a well-known file BEFORE the size handling below, so the
    // signal always lands even when the stdout line must degrade.
    val benchFile = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(benchFile.getParent)
    java.nio.file.Files.write(benchFile, fullJson.getBytes("UTF-8"))
    // hard bound on the stdout contract line (round-4's 4.2 KB line fell out
    // of the driver's tail window). Normally ~1.7 KB, but per-query err
    // payloads (a jsonSafe'd exception each) can push past it — DEGRADE to a
    // minimal line (totals + scaling, no per-query map) instead of throwing:
    // a throw after all measurement work would destroy the entire bench
    // signal, the exact failure this bound exists to prevent.
    val out =
      if (json.length <= 2048) json
      else {
        System.err.println(s"bench stdout line ${json.length} B > 2048 - " +
          "emitting minimal line; full detail in target/bench.json")
        s"""{"metric":"total","value":$total,"unit":"sec","queries":{},""" +
          s""""query_errors":$nErrs,"sf":"$sfDir","scaling":${scaling(shortProtocol)}}"""
      }
    println(out)
  }
}
