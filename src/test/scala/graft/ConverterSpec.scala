package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.curie.Converter
import graft.fixtures.MiniOntology
import graft.model.{PrefixRecord, Ref}

/**
 * Ported curies/normalization semantics units (SURVEY §5 engine-test-plan #1;
 * reference behavior: curies.Converter compress/expand invoked at ner.py:71,
 * bioregistry.normalize_prefix at robot.py:132).
 */
class ConverterSpec extends AnyFunSuite {

  val conv: Converter = MiniOntology.converter

  test("compress: basic IRI → CURIE") {
    assert(conv.compressToCurie("http://purl.obolibrary.org/obo/PATO_0000001") == "PATO:0000001")
    assert(conv.compressToCurie("http://purl.obolibrary.org/obo/CHEBI_15377") == "CHEBI:15377")
  }

  test("compress: longest prefix wins on overlapping uri prefixes (SURVEY §7.5.1)") {
    // EX = http://example.org/e/ ; EXD = http://example.org/e/d/
    assert(conv.compressToCurie("http://example.org/e/d/42") == "EXD:42")
    assert(conv.compressToCurie("http://example.org/e/42") == "EX:42")
    // OBO stem vs PATO_: PATO_ is longer → wins
    assert(conv.compressToCurie("http://purl.obolibrary.org/obo/PATO_7") == "PATO:7")
    // an OBO id that is NOT a known long prefix falls back to the shorter stem
    assert(conv.compressToCurie("http://purl.obolibrary.org/obo/ZFA_0000001") == "OBO:ZFA_0000001")
  }

  test("compress: unmatched IRI → null (lenient, ner.py:72-73)") {
    assert(conv.compressToCurie("http://unknown.example/xyz") == null)
    assert(conv.compressToCurie("not an iri") == null)
  }

  test("compress: IRI equal to a bare prefix (empty local id) → null") {
    assert(conv.compressToCurie("http://example.org/e/") == null)
  }

  test("expand: CURIE → IRI and unknown prefix → null") {
    assert(conv.expandOrNull("PATO:0000001") == "http://purl.obolibrary.org/obo/PATO_0000001")
    assert(conv.expandOrNull("NOPE:1") == null)
    assert(conv.expandOrNull("notacurie") == null)
  }

  test("normalizePrefix: synonyms and case variants (F1)") {
    assert(conv.normalizePrefixOrNull("PATO") == "PATO")
    assert(conv.normalizePrefixOrNull("pato") == "PATO")
    assert(conv.normalizePrefixOrNull("PaTo") == "PATO")
    assert(conv.normalizePrefixOrNull("gomf") == null)
  }

  test("predicate normalization table (F4, consumed at ner.py:137)") {
    assert(Converter.normalizePredicate("is_a", conv) == "rdfs:subClassOf")
    assert(Converter.normalizePredicate("http://www.w3.org/2000/01/rdf-schema#subClassOf", conv) == "rdfs:subClassOf")
    assert(Converter.normalizePredicate("http://purl.obolibrary.org/obo/BFO_0000050", conv) == "BFO:0000050")
    assert(Converter.normalizePredicate("hasExactSynonym", conv) == "oboInOwl:hasExactSynonym")
    // unknown predicates pass through unchanged (lenient)
    assert(Converter.normalizePredicate("someRandomPred", conv) == "someRandomPred")
  }

  test("Ref.fromCurie splits on first colon only") {
    assert(Ref.fromCurie("GO:0008150").contains(Ref("GO", "0008150")))
    assert(Ref.fromCurie("EX:a:b:c").contains(Ref("EX", "a:b:c")))
    assert(Ref.fromCurie("nocolon").isEmpty)
    assert(Ref.fromCurie(":leading").isEmpty)
    assert(Ref.fromCurie("trailing:").isEmpty)
  }

  test("property: expand ∘ compress = identity on generated PATO ids (seeded sweep)") {
    val rng = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val id = math.abs(rng.nextLong())
      val iri = s"http://purl.obolibrary.org/obo/PATO_$id"
      val curie = conv.compressToCurie(iri)
      assert(curie == s"PATO:$id")
      assert(conv.expandOrNull(curie) == iri)
    }
  }

  test("standardizeId: IRI vs CURIE-shaped inputs") {
    assert(conv.standardizeId("http://purl.obolibrary.org/obo/PATO_1").contains("PATO:1"))
    assert(conv.standardizeId("pato:1").contains("PATO:1"))
    assert(conv.standardizeId("OTHER:123").isEmpty) // unknown prefix → None (lenient)
    assert(conv.standardizeId(null).isEmpty)
  }

  test("trie handles thousands of prefixes without collision") {
    val recs = (0 until 3000).map(i => PrefixRecord(s"P$i", s"http://x.org/ns$i/"))
    val big = new Converter(recs)
    assert(big.compressToCurie("http://x.org/ns1234/abc") == "P1234:abc")
    assert(big.compressToCurie("http://x.org/ns299/9") == "P299:9")
  }
}
