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
