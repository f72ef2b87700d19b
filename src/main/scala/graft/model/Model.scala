package graft.model

/**
 * Core data model of the KG-construction engine.
 *
 * Mirrors the reference's abstractions (biopragmatics/bioontologies @ /root/reference):
 *  - `Ref` ≅ curies.Reference (prefix, identifier) — the join key everywhere
 *    (reference: ner.py:92-96 NamableReference, robot.py standardization).
 *  - `StdNode`/`StdEdge` ≅ obographs StandardizedNode / standardized edge triple
 *    consumed at ner.py:132-138.
 *  - `LiteralMapping` ≅ ssslm.LiteralMapping rows built at ner.py:99-113.
 *  - `Turn` = the target corpus row (BASELINE.json input_hint).
 *  - `Mention` = per-turn detected entity mention (north_star G4 stage).
 *  - `Triple` = final deduplicated (subj, pred, obj) output row.
 *
 * All types are flat case classes so Spark product encoders apply and columns
 * stay prunable; `Ref` is stored as two flat string columns (prefix, id) in
 * tables for shuffle/join efficiency rather than as a struct.
 */
final case class Ref(prefix: String, id: String) {
  def curie: String = s"$prefix:$id"
}

object Ref {
  /** Parse "PREFIX:id" — splits on the FIRST colon (CURIE local ids may contain colons). */
  def fromCurie(curie: String): Option[Ref] = {
    val i = curie.indexOf(':')
    if (i <= 0 || i == curie.length - 1) None
    else Some(Ref(curie.substring(0, i), curie.substring(i + 1)))
  }
}

/** One record of the extended prefix map (curies/Bioregistry-shaped). */
final case class PrefixRecord(
    prefix: String,          // canonical prefix, e.g. "PATO"
    uriPrefix: String,       // primary URI prefix, e.g. "http://purl.obolibrary.org/obo/PATO_"
    prefixSynonyms: Seq[String] = Nil,  // alternate spellings, e.g. "pato"
    uriPrefixSynonyms: Seq[String] = Nil) // alternate URI stems

/** Standardized node: every IRI compressed to a CURIE. Flat for encoder friendliness. */
final case class StdNode(
    prefix: String,
    id: String,
    label: Option[String],
    deprecated: Boolean,
    synonyms: Seq[StdSynonym],
    xrefs: Seq[String])      // CURIEs of cross-references (drive xref entity-merge)

final case class StdSynonym(
    text: String,
    predicate: String,       // e.g. "oboInOwl:hasExactSynonym"
    xrefs: Seq[String])

/** Standardized edge triple (CURIE strings). ner.py:132-138 consumes exactly this shape. */
final case class StdEdge(subj: String, pred: String, obj: String)

/** One lexicon row (reference: ner.py:99-113). */
final case class LiteralMapping(
    prefix: String,
    id: String,
    name: Option[String],    // the node label, if any
    predicate: String,       // rdfs:label for label rows, synonym scope otherwise
    text: String,            // the surface text to match
    source: String,          // ontology prefix
    provenance: Seq[String])

/** One transcript turn (BASELINE.json input_hint schema). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

/** One detected mention with its top candidate(s) resolved downstream. */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    start: Int,
    end: Int,
    surface: String,
    prefix: String,
    id: String,
    name: String,
    predicate: String,
    score: Double)

/** Final KG row. */
final case class Triple(subj: String, pred: String, obj: String)

object Vocab {
  // canonical predicate CURIEs (public OBO Graph JSON / RDFS vocabulary)
  val SubClassOf = "rdfs:subClassOf"
  val Label = "rdfs:label"
  val HasExactSynonym = "oboInOwl:hasExactSynonym"
  val HasRelatedSynonym = "oboInOwl:hasRelatedSynonym"
  val HasBroadSynonym = "oboInOwl:hasBroadSynonym"
  val HasNarrowSynonym = "oboInOwl:hasNarrowSynonym"
  val HasDbXref = "oboInOwl:hasDbXref"
  val Mentions = "ex:mentions"   // transcript-turn → concept edge emitted by the pipeline
  val RdfType = "rdf:type"
}
