package graft.curie

import graft.model.{PrefixRecord, Ref}

/**
 * Byte-level longest-prefix trie mapping URI prefixes → canonical prefix.
 *
 * Reproduces curies.Converter.compress semantics (reference delegates at
 * ner.py:71 and robot.py squeeze(standardize=True); see SURVEY §2.4 F2):
 * longest URI-prefix match wins when prefixes overlap (e.g. two OBO PURL
 * namespaces sharing a stem — SURVEY §7.5.1).
 *
 * Immutable after construction, Serializable, small (Bioregistry ≈ 3k
 * prefixes) — safe to capture inside a Catalyst Expression or broadcast.
 */
final class PrefixTrie private (
    // flattened trie: child lookup via open-addressed arrays would be overkill
    // at 3k entries; a per-node HashMap is fine and still O(|iri|) per lookup.
    root: PrefixTrie.Node) extends Serializable {

  /** Longest match: returns (canonicalPrefix, matchedUriPrefixLength) or null. */
  def longestMatch(s: String): (String, Int) = {
    var node = root
    var best: String = null
    var bestLen = 0
    var i = 0
    val n = s.length
    while (node != null) {
      if (node.value != null) { best = node.value; bestLen = i }
      if (i >= n) node = null
      else { node = node.children.getOrElse(s.charAt(i), null); i += 1 }
    }
    if (best == null) null else (best, bestLen)
  }
}

object PrefixTrie {
  private[curie] final class Node extends Serializable {
    var value: String = null
    val children = new scala.collection.mutable.HashMap[Char, Node]
  }

  def apply(entries: Iterable[(String, String)]): PrefixTrie = { // (uriPrefix, canonicalPrefix)
    val root = new Node
    entries.foreach { case (uriPrefix, prefix) =>
      var node = root
      var i = 0
      while (i < uriPrefix.length) {
        node = node.children.getOrElseUpdate(uriPrefix.charAt(i), new Node)
        i += 1
      }
      node.value = prefix
    }
    new PrefixTrie(root)
  }
}

/**
 * CURIE converter: IRI↔CURIE compression/expansion plus prefix-spelling
 * canonicalization (bioregistry.normalize_prefix, robot.py:132 — SURVEY F1).
 *
 * `strict = false` (the reference default, ner.py:32) maps unparseable IRIs to
 * None/null; `strict = true` raises — the engine surfaces that as a null plus
 * a caller-side assertion, never a task failure.
 */
final class Converter(val records: Seq[PrefixRecord]) extends Serializable {

  private val trie: PrefixTrie = PrefixTrie(records.flatMap { r =>
    (r.uriPrefix +: r.uriPrefixSynonyms).map(u => (u, r.prefix))
  })

  // synonym spelling (casefolded) → canonical prefix. Canonical spelling and
  // its own casefold always included.
  private val prefixSynonymMap: Map[String, String] = records.flatMap { r =>
    (r.prefix +: r.prefix.toLowerCase +: r.prefixSynonyms.flatMap(s => Seq(s, s.toLowerCase)))
      .map(_ -> r.prefix)
  }.toMap

  private val expandMap: Map[String, String] = records.map(r => r.prefix -> r.uriPrefix).toMap

  /** IRI → Ref via longest-prefix match; null-semantics for no match. */
  def compress(iri: String): Option[Ref] = {
    if (iri == null) return None
    val m = trie.longestMatch(iri)
    if (m == null || m._2 >= iri.length) None
    else Some(Ref(m._1, iri.substring(m._2)))
  }

  def compressToCurie(iri: String): String =
    compress(iri).map(_.curie).orNull

  /** CURIE → IRI; null when prefix unknown or input not a CURIE. */
  def expand(curie: String): Option[String] =
    Option(curie).flatMap(Ref.fromCurie).flatMap(r => expandMap.get(r.prefix).map(_ + r.id))

  def expandOrNull(curie: String): String = expand(curie).orNull

  /** Arbitrary prefix spelling → canonical prefix (F1). Case-insensitive on synonyms. */
  def normalizePrefix(p: String): Option[String] =
    Option(p).flatMap(s => prefixSynonymMap.get(s).orElse(prefixSynonymMap.get(s.toLowerCase)))

  def normalizePrefixOrNull(p: String): String = normalizePrefix(p).orNull

  /**
   * Standardize an id that may be an IRI or a CURIE into a canonical CURIE.
   * IRIs compress via the trie; CURIE-shaped inputs canonicalize their prefix.
   */
  def standardizeId(s: String): Option[String] = {
    if (s == null) None
    else if (s.startsWith("http://") || s.startsWith("https://")) compress(s).map(_.curie)
    else Ref.fromCurie(s).flatMap(r => normalizePrefix(r.prefix).map(p => s"$p:${r.id}"))
  }
}

object Converter {

  /**
   * Predicate normalization table (SURVEY F4): OBO-format shorthand and raw
   * property IRIs → canonical CURIEs, so downstream equality tests like
   * `pred == "rdfs:subClassOf"` (ner.py:137) hold on ROBOT-style raw edges.
   * Public RDFS/OWL/oboInOwl/BFO/RO vocabulary only.
   */
  val predicateMap: Map[String, String] = Map(
    "is_a" -> "rdfs:subClassOf",
    "subPropertyOf" -> "rdfs:subPropertyOf",
    "type" -> "rdf:type",
    "inverseOf" -> "owl:inverseOf",
    "http://www.w3.org/2000/01/rdf-schema#subClassOf" -> "rdfs:subClassOf",
    "http://www.w3.org/2000/01/rdf-schema#subPropertyOf" -> "rdfs:subPropertyOf",
    "http://www.w3.org/2000/01/rdf-schema#label" -> "rdfs:label",
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" -> "rdf:type",
    "http://purl.obolibrary.org/obo/BFO_0000050" -> "BFO:0000050", // part_of
    "http://purl.obolibrary.org/obo/BFO_0000051" -> "BFO:0000051", // has_part
    "http://purl.obolibrary.org/obo/RO_0002202" -> "RO:0002202",   // develops_from
    "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym" -> "oboInOwl:hasExactSynonym",
    "http://www.geneontology.org/formats/oboInOwl#hasRelatedSynonym" -> "oboInOwl:hasRelatedSynonym",
    "http://www.geneontology.org/formats/oboInOwl#hasBroadSynonym" -> "oboInOwl:hasBroadSynonym",
    "http://www.geneontology.org/formats/oboInOwl#hasNarrowSynonym" -> "oboInOwl:hasNarrowSynonym",
    "http://www.geneontology.org/formats/oboInOwl#hasDbXref" -> "oboInOwl:hasDbXref",
    "hasExactSynonym" -> "oboInOwl:hasExactSynonym",
    "hasRelatedSynonym" -> "oboInOwl:hasRelatedSynonym",
    "hasBroadSynonym" -> "oboInOwl:hasBroadSynonym",
    "hasNarrowSynonym" -> "oboInOwl:hasNarrowSynonym",
    "hasDbXref" -> "oboInOwl:hasDbXref")

  /** Normalize a predicate: table first, then IRI compression, else passthrough. */
  def normalizePredicate(pred: String, converter: Converter): String = {
    if (pred == null) null
    else predicateMap.getOrElse(pred,
      if (pred.startsWith("http://") || pred.startsWith("https://"))
        converter.compressToCurie(pred) match { case null => pred; case c => c }
      else pred)
  }
}
