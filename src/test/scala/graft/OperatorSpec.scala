package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class OperatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---------------- TextOps ----------------

  test("tokenCount: empty, single, multi, messy whitespace") {
    val df = Seq("", "one", "a b c", "  x   y  ").toDF("text")
      .select(TextOps.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 3, 2))
  }

  test("langId: stopword heuristics with deterministic tie-break") {
    val df = Seq(
      "the cat of the hat",         // en
      "el gato de la casa que",     // es
      "der hund und die katze ist", // de
      "le chat et les chiens",      // fr
      "xyzzy plugh")                // no stopwords -> und
      .toDF("text").select(TextOps.langId(col("text")).as("lang"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "es", "de", "fr", "und"))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq("Hello  World", "hello world", "hello worlds").toDF("text")
      .select(TextOps.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  // ---------------- DedupOps ----------------

  test("exact dedup: normalized duplicates collapse to min doc_id") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val groups = DedupOps.exactDuplicates(df).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((1L, 2L), (3L, 1L))) // (keep_id, n_dups)
    assert(DedupOps.exactDedup(df).count() == 2)
  }

  test("minhash near-dup finds the planted near-duplicate pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val near = base.replace("kappa", "kappa2") // high shingle overlap
    val far = "completely different words entirely unrelated to the others at all here"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDuplicates(df, threshold = 0.3, k = 16, bands = 8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical texts distance 0; near texts within small Hamming") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumped over a lazy dog again and again"),
      (4L, "entirely unrelated content about spark partitions and shuffles"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDuplicates(df, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val exact = pairs.find(p => p._1 == 1 && p._2 == 2)
    assert(exact.exists(_._3 == 0))
    assert(!pairs.exists(p => p._2 == 4 || p._1 == 4))
  }

  test("jaccard: exact token-set semantics") {
    val df = Seq(("a b c d", "c d e f")).toDF("x", "y")
      .select(DedupOps.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.collect()(0).getDouble(0) - 2.0 / 6.0) < 1e-6)
  }

  test("cosine: known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b").select(round(DedupOps.cosine(col("a"), col("b")), 6).as("c"))
    val c = df.collect().map(_.getDouble(0))
    assert(c(0) == 0.0 && c(1) == 1.0)
  }

  test("winnowing: shared substring >= k+w-1 guarantees a shared fingerprint") {
    import graft.functions.WinnowingSketch
    val shared = "the quick brown fox jumped over everything in sight today"
    val a = "AAA " + shared + " BBB"
    val b = "CCCCC " + shared + " DDDD"
    val sa = WinnowingSketch.sketch(a.toLowerCase, 8, 4).toSet
    val sb = WinnowingSketch.sketch(b.toLowerCase, 8, 4).toSet
    assert((sa & sb).nonEmpty) // SIGMOD'03 winnowing guarantee
    // no 8-char substring overlap with `shared` (first attempt used
    // "nothing in common", which really does share "hing in " with
    // "everything in sight" — the sketch caught it; that's the feature)
    val unrelated = WinnowingSketch.sketch("zzz qqq www rrr kkk mmm ppp lll", 8, 4).toSet
    assert((sa & unrelated).isEmpty)
    // determinism + short-text path
    assert(WinnowingSketch.sketch("tiny", 8, 4).toSeq == WinnowingSketch.sketch("tiny", 8, 4).toSeq)
  }

  test("winnowing near-dup operator finds the planted overlap pair") {
    val shared = "spark shuffles are dominated by exchange write and read amplification costs"
    val df = Seq(
      (1L, "intro words " + shared + " trailing one"),
      (2L, "other prefix " + shared + " suffix two"),
      (3L, "totally unrelated content about cooking pasta with tomatoes and basil"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.winnowingNearDuplicates(df, minShared = 2)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  // ---------------- plan quality (the 100 TB story) ----------------

  test("parquet scan prunes columns and pushes filters for text metrics") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("lang") === "en")
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan)
    // ReadSchema must NOT include source/n_chars — only needed columns
    assert(plan.contains("doc_id") && plan.contains("text"))
    assert(!plan.contains("n_chars"))
  }

  test("mention token join broadcasts the lexicon (no corpus-side shuffle)") {
    val q = SparkEntry.queries("q_mention_tokens")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("curie expressions stay inside whole-stage codegen") {
    val q = SparkEntry.queries("q_compress_iri")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // "*(n)" prefix = WholeStageCodegen span
    // and produce correct values through the generated path
    val row = q.filter(col("doc_id") === 4).collect()(0)
    assert(row.getString(1) == "EXD:4")
  }

  // ---------------- Multimodal ----------------

  test("multimodal: deterministic features, schema and frame sampling") {
    val media = MultimodalOps.syntheticMedia(spark, 60)
    val feats = MultimodalOps.extractFeatures(media).collect()
    assert(feats.length == 60)
    assert(feats.forall(_.features.length == 16))
    // unit-ish norm
    assert(feats.forall(f => math.abs(f.features.map(x => x * x).sum - 1.0f) < 1e-3))
    val frames = MultimodalOps.sampleFrames(media.toDF())
    assert(frames.count() > 0)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_hash"))
  }
}
