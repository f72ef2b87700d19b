package graft.fixtures

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.curie.Converter
import graft.model.PrefixRecord

/**
 * Deterministic PATO-shaped OBO Graph JSON fixture (FIXTURES.md §2).
 *
 * Golden header values mirror the reference's single integration test
 * (tests/test_api.py:20-22): graph lbl, hasDefaultNamespace=quality, root
 * PATO:0000001. Node labels/synonyms intentionally overlap the synthetic
 * corpus vocabulary ("fast", "slow", "merge", "hash join", ...) so mention
 * detection has planted hits.
 *
 * Exercises every lenient path of the reference (SURVEY §2.9): a node with no
 * lbl (synonym-only), a node with no meta, a foreign-prefix node (CHEBI), an
 * unparseable IRI, a deprecated node, a ≥3-level is_a chain (closure-
 * excludes-seed case), raw-edge spelling variants (`is_a` AND the full
 * subClassOf IRI for the same logical edge → dedup must collapse them), and a
 * part-of edge via the BFO IRI.
 */
object MiniOntology {

  val P = "http://purl.obolibrary.org/obo/PATO_"
  val C = "http://purl.obolibrary.org/obo/CHEBI_"

  /** Fixture prefix map; overlapping uri_prefixes pin longest-match-wins (SURVEY §7.5.1). */
  val prefixRecords: Seq[PrefixRecord] = Seq(
    PrefixRecord("PATO", P, Seq("pato")),
    PrefixRecord("CHEBI", C, Seq("chebi")),
    PrefixRecord("OBO", "http://purl.obolibrary.org/obo/", Nil), // shorter overlap of PATO/CHEBI stems
    PrefixRecord("BFO", "http://purl.obolibrary.org/obo/BFO_", Nil),
    PrefixRecord("RO", "http://purl.obolibrary.org/obo/RO_", Nil),
    PrefixRecord("oboInOwl", "http://www.geneontology.org/formats/oboInOwl#", Nil),
    PrefixRecord("rdfs", "http://www.w3.org/2000/01/rdf-schema#", Nil),
    PrefixRecord("EX", "http://example.org/e/", Nil),
    PrefixRecord("EXD", "http://example.org/e/d/", Nil)) // longest-match fixture pair

  def converter: Converter = new Converter(prefixRecords)

  private def node(num: Int, lbl: String, syns: Seq[(String, String)] = Nil,
                   xrefs: Seq[String] = Nil, deprecated: Boolean = false,
                   noMeta: Boolean = false, id: String = null): String = {
    val idNum = f"$num%07d"
    val theId = if (id != null) id else P + idNum
    val lblPart = if (lbl == null) "" else s""""lbl": "$lbl", """
    val synJson = syns.map { case (t, p) =>
      s"""{"val": "$t", "pred": "$p", "xrefs": ["PATO:$idNum"]}"""
    }.mkString("[", ",", "]")
    val xrefJson = xrefs.map(x => s"""{"val": "$x"}""").mkString("[", ",", "]")
    val meta = if (noMeta) ""
      else s""", "meta": {"synonyms": $synJson, "xrefs": $xrefJson, "deprecated": $deprecated}"""
    s"""{"id": "$theId", $lblPart"type": "CLASS"$meta}"""
  }

  private def edge(sub: String, pred: String, obj: String): String =
    s"""{"sub": "$sub", "pred": "$pred", "obj": "$obj"}"""

  /** The document JSON (one line, multiLine-readable either way). */
  def json: String = {
    val nodes = Seq(
      node(1, "quality", Seq(("trait", "hasExactSynonym"))),
      node(117, "size", Seq(("size quality", "hasRelatedSynonym"))),
      node(118, "big", Seq(("large", "hasExactSynonym"), ("huge", "hasRelatedSynonym")),
        // one unknown-prefix xref (lenient null) + one known-prefix xref that
        // actually drives the J3 entity merge
        xrefs = Seq("OTHER:123", "CHEBI:0000118")),
      node(119, "small", Seq(("little", "hasExactSynonym"))),
      node(120, "fast", Seq(("quick", "hasExactSynonym"))),
      node(121, "slow"),
      node(122, "speed", Seq(("velocity", "hasRelatedSynonym"))),
      // label-less node: synonym-only emission (ner.py:98 skip of the label row)
      node(123, null, Seq(("spark", "hasExactSynonym"))),
      // no-meta node: label row only (ner.py:105 skip)
      node(124, "merge", noMeta = true),
      // process-quality subtree — labels overlap the corpus vocabulary
      node(200, "process quality"),
      node(201, "sort", Seq(("ordering", "hasRelatedSynonym"))),
      node(202, "join", Seq(("hash join", "hasExactSynonym"))),
      node(203, "filter"),
      node(204, "scan", Seq(("table scan", "hasExactSynonym"))),
      node(205, "window"),
      node(206, "query"),
      node(207, "stream", Seq(("streaming", "hasRelatedSynonym"))),
      node(208, "batch"),
      // deprecated node: still emitted, flag carried (reference keeps deprecated in meta)
      node(209, "group", deprecated = true),
      // foreign-prefix node → dropped by prefix gate P6
      node(300, "water", id = C + "0000300"),
      // unparseable IRI → compression null → lenient skip (ner.py:72-73)
      node(301, "mystery", id = "http://unknown.example/xyz"))

    val edges = Seq(
      // 3-level chain: big/small → size → quality ; fast/slow → speed → quality
      edge(P + "0000118", "is_a", P + "0000117"),
      edge(P + "0000119", "is_a", P + "0000117"),
      edge(P + "0000117", "is_a", P + "0000001"),
      edge(P + "0000120", "is_a", P + "0000122"),
      edge(P + "0000121", "is_a", P + "0000122"),
      edge(P + "0000122", "is_a", P + "0000001"),
      // same logical edge spelled as full IRI → must dedup with the is_a above (A2)
      edge(P + "0000117", "http://www.w3.org/2000/01/rdf-schema#subClassOf", P + "0000001"),
      // process subtree
      edge(P + "0000201", "is_a", P + "0000200"),
      edge(P + "0000202", "is_a", P + "0000200"),
      edge(P + "0000203", "is_a", P + "0000200"),
      edge(P + "0000204", "is_a", P + "0000200"),
      edge(P + "0000205", "is_a", P + "0000200"),
      edge(P + "0000206", "is_a", P + "0000200"),
      edge(P + "0000207", "is_a", P + "0000200"),
      edge(P + "0000208", "is_a", P + "0000200"),
      edge(P + "0000200", "is_a", P + "0000001"),
      // a non-hierarchy edge through the BFO part-of IRI (predicate compresses to BFO:0000050)
      edge(P + "0000123", "http://purl.obolibrary.org/obo/BFO_0000050", P + "0000122"),
      // synonym-only and deprecated nodes hang off the tree too
      edge(P + "0000123", "is_a", P + "0000200"),
      edge(P + "0000209", "is_a", P + "0000200"))

    s"""{"graphs": [{
       |  "id": "http://purl.obolibrary.org/obo/pato.owl",
       |  "lbl": "PATO - the Phenotype And Trait Ontology",
       |  "meta": {"version": "http://purl.obolibrary.org/obo/pato/releases/2026-01-01/pato.owl",
       |           "basicPropertyValues": [
       |             {"pred": "http://www.geneontology.org/formats/oboInOwl#hasDefaultNamespace",
       |              "val": "quality"}]},
       |  "nodes": [${nodes.mkString(",\n    ")}],
       |  "edges": [${edges.mkString(",\n    ")}],
       |  "equivalentNodesSets": [
       |    {"nodeIds": ["${P}0000120", "${C}0000777"]}]
       |}]}""".stripMargin
  }

  /**
   * GOLDEN: the complete literal-mapping lexicon (text → CURIE) this fixture
   * must produce under reference semantics (ner.py:85-113). Hand-derived:
   * every PATO node's label + synonyms; CHEBI node dropped by the prefix gate
   * (P6), unparseable-IRI node dropped (ner.py:72-73), label-less node 123
   * contributes only "spark", no-meta node 124 contributes only "merge".
   * A unit test asserts the engine's LiteralMappings output equals this list;
   * the DuckDB oracle SQL embeds it as VALUES — keeping engine and oracle in
   * lockstep. INVARIANT (asserted in tests): each text maps to exactly ONE
   * reference, so top-1 candidate selection never changes the triple set.
   */
  val expectedLexicon: Seq[(String, String)] = Seq(
    "quality" -> "PATO:0000001", "trait" -> "PATO:0000001",
    "size" -> "PATO:0000117", "size quality" -> "PATO:0000117",
    "big" -> "PATO:0000118", "large" -> "PATO:0000118", "huge" -> "PATO:0000118",
    "small" -> "PATO:0000119", "little" -> "PATO:0000119",
    "fast" -> "PATO:0000120", "quick" -> "PATO:0000120",
    "slow" -> "PATO:0000121",
    "speed" -> "PATO:0000122", "velocity" -> "PATO:0000122",
    "spark" -> "PATO:0000123",
    "merge" -> "PATO:0000124",
    "process quality" -> "PATO:0000200",
    "sort" -> "PATO:0000201", "ordering" -> "PATO:0000201",
    "join" -> "PATO:0000202", "hash join" -> "PATO:0000202",
    "filter" -> "PATO:0000203",
    "scan" -> "PATO:0000204", "table scan" -> "PATO:0000204",
    "window" -> "PATO:0000205",
    "query" -> "PATO:0000206",
    "stream" -> "PATO:0000207", "streaming" -> "PATO:0000207",
    "batch" -> "PATO:0000208",
    "group" -> "PATO:0000209")

  /**
   * GOLDEN: the standardized, deduplicated ontology edge set — 18 triples
   * (17 raw subClassOf-ish edges + BFO part-of; the is_a/IRI-spelled duplicate
   * of 117→1 collapses). Asserted against GraphStandardizer output in tests
   * and embedded in the pipeline oracle SQL.
   */
  val expectedOntologyTriples: Seq[(String, String, String)] = Seq(
    ("PATO:0000118", "rdfs:subClassOf", "PATO:0000117"),
    ("PATO:0000119", "rdfs:subClassOf", "PATO:0000117"),
    ("PATO:0000117", "rdfs:subClassOf", "PATO:0000001"),
    ("PATO:0000120", "rdfs:subClassOf", "PATO:0000122"),
    ("PATO:0000121", "rdfs:subClassOf", "PATO:0000122"),
    ("PATO:0000122", "rdfs:subClassOf", "PATO:0000001"),
    ("PATO:0000201", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000202", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000203", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000204", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000205", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000206", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000207", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000208", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000200", "rdfs:subClassOf", "PATO:0000001"),
    ("PATO:0000123", "BFO:0000050", "PATO:0000122"),
    ("PATO:0000123", "rdfs:subClassOf", "PATO:0000200"),
    ("PATO:0000209", "rdfs:subClassOf", "PATO:0000200"))

  /** Write the fixture to a temp-ish path (idempotent) and return the path. */
  def writeTo(dir: String): String = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val p = d.resolve("mini_ontology.json")
    Files.write(p, json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    p.toString
  }
}
