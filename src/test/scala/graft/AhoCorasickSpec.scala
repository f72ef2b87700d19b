package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ground.AhoCorasick

class AhoCorasickSpec extends AnyFunSuite {

  test("normalize: casefold + whitespace/dash/underscore folding (F5)") {
    assert(AhoCorasick.normalize("Hash  Join") == "hash join")
    assert(AhoCorasick.normalize("hash-join") == "hash join")
    assert(AhoCorasick.normalize("  Hash_JOIN  ") == "hash join")
    assert(AhoCorasick.normalize(null) == "")
  }

  test("single pattern, multiple occurrences") {
    val ac = AhoCorasick.build(Seq("join"))
    val m = ac.findAll("join the join club join")
    assert(m.map(x => (x._1, x._2)) == Seq((0, 4), (9, 13), (19, 23)))
  }

  test("word boundaries: no substring-inside-word matches") {
    val ac = AhoCorasick.build(Seq("join", "sort"))
    assert(ac.findAll("joining resorts").isEmpty)
    assert(ac.findAll("join, sort!").size == 2)
    assert(ac.findAll("rejoin").isEmpty)
  }

  test("astral-plane boundary golden: supplementary letters do NOT block a match (per-UTF-16-unit semantics)") {
    // DOCUMENTED ENGINE SEMANTICS (SparkEntry q_pipeline_triples oracle note):
    // word boundaries are judged per UTF-16 UNIT via Character.isLetterOrDigit
    // (Char). A supplementary-plane letter like 𝕏 (U+1D54F, MATHEMATICAL
    // DOUBLE-STRUCK CAPITAL X) is two surrogate units, each of category Cs —
    // NOT letter-or-digit — so, unlike a BMP letter, it counts as a word
    // BOUNDARY. Full-codepoint semantics would suppress these matches; this
    // golden pins the engine's own choice so the documented limitation
    // cannot silently drift (round-3 verdict item 8).
    val ac = AhoCorasick.build(Seq("cell"))
    val astral = "𝕏" // 𝕏
    // BMP letter adjacency suppresses (the boundary rule working as intended)
    assert(ac.findAll("xcell").isEmpty)
    assert(ac.findAll("cellx").isEmpty)
    // astral letter adjacency does NOT suppress — and the span coordinates
    // are UTF-16 (astral prefix occupies TWO units)
    assert(ac.findAll(astral + "cell").map(m => (m._1, m._2)) == Seq((2, 6)))
    assert(ac.findAll("cell" + astral).map(m => (m._1, m._2)) == Seq((0, 4)))
    assert(ac.findAll(astral + "cell" + astral).map(m => (m._1, m._2)) == Seq((2, 6)))
    // the fused byte scanner agrees with the materializing path on the same input
    val hits = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    ac.newScanner().scan(
      org.apache.spark.unsafe.types.UTF8String.fromString(astral + "cell" + astral),
      (s, e, p) => hits += ((s, e, p)))
    assert(hits.map(m => (m._1, m._2)).toSeq == Seq((2, 6)))
  }

  test("multi-word pattern and overlapping patterns all emitted") {
    val ac = AhoCorasick.build(Seq("hash join", "join", "hash"))
    val m = ac.findAll("a hash join b")
    val pats = m.map(x => ac.patterns(x._3)).sorted
    assert(pats == Seq("hash", "hash join", "join"))
  }

  test("pattern that is a suffix of another still found via failure links") {
    val ac = AhoCorasick.build(Seq("table scan", "scan"))
    val m = ac.findAll("full table scan")
    assert(m.map(x => ac.patterns(x._3)).toSet == Set("table scan", "scan"))
  }

  test("10k patterns scale sanity") {
    val pats = (0 until 10000).map(i => s"term$i")
    val ac = AhoCorasick.build(pats)
    val m = ac.findAll("term42 and term9999 but not term10000x")
    assert(m.map(x => ac.patterns(x._3)) == Seq("term42", "term9999"))
  }
}
