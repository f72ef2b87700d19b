package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.MiniOntology
import graft.operators.{Closure, GraphStandardizer, LiteralMappings}
import graft.sources.OboGraphReader

/**
 * Golden end-to-end semantics on the mini ontology fixture (SURVEY §5 plan #2;
 * golden header values from reference tests/test_api.py:20-22).
 */
class StandardizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  lazy val fixturePath = MiniOntology.writeTo("target/fixtures")
  lazy val graphs = OboGraphReader.readGraphs(spark, fixturePath).cache()
  lazy val conv = MiniOntology.converter
  lazy val nodes = GraphStandardizer.standardizeNodes(graphs, conv, Some("PATO")).cache()
  lazy val edges = GraphStandardizer.standardizeEdges(graphs, conv).cache()

  test("golden header: graph lbl / default namespace / version (test_api.py:20-22)") {
    val g = graphs.select("graph_id", "graph_lbl", "meta.basicPropertyValues").collect()(0)
    assert(g.getString(0) == "http://purl.obolibrary.org/obo/pato.owl")
    assert(g.getString(1) == "PATO - the Phenotype And Trait Ontology")
    val ns = graphs.select(explode(col("meta.basicPropertyValues")).as("b"))
      .filter(col("b.pred").contains("hasDefaultNamespace"))
      .select("b.val").collect()(0).getString(0)
    assert(ns == "quality")
  }

  test("node gatekeeping P6: foreign-prefix and unparseable-IRI nodes dropped") {
    val curies = nodes.select("curie").collect().map(_.getString(0)).toSet
    assert(!curies.exists(_.startsWith("CHEBI:")))
    assert(curies.contains("PATO:0000001"))
    // unparseable http://unknown.example/xyz never shows up
    assert(curies.forall(_.startsWith("PATO:")))
  }

  test("edge standardization: is_a upgrade + IRI-spelled duplicate collapses (F4 + A2)") {
    val subClass = edges.filter(col("pred") === "rdfs:subClassOf")
      .select("subj", "obj").collect().map(r => (r.getString(0), r.getString(1)))
    // the size→quality edge appears once despite is_a + full-IRI raw duplicates
    assert(subClass.count(_ == ("PATO:0000117", "PATO:0000001")) == 1)
    // part-of via BFO IRI normalized to BFO:0000050
    assert(edges.filter(col("pred") === "BFO:0000050").count() == 1)
    // no raw "is_a" survives
    assert(edges.filter(col("pred") === "is_a").count() == 0)
  }

  test("roots T3: quality is the sole root of the subClassOf DAG") {
    val roots = GraphStandardizer.roots(nodes, edges)
      .select("curie").collect().map(_.getString(0)).toSet
    assert(roots.contains("PATO:0000001"))
    assert(!roots.contains("PATO:0000118"))
  }

  test("literal mappings G2: label + synonym emission incl. lenient skips") {
    val lms = LiteralMappings.fromNodes(nodes, "PATO").cache()
    val byText = lms.select("text", "predicate").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // label row
    assert(byText.contains(("quality", "rdfs:label")))
    // synonym row with normalized scope predicate
    assert(byText.contains(("trait", "oboInOwl:hasExactSynonym")))
    // label-less node contributes ONLY its synonym (ner.py:98 skip)
    assert(byText.contains(("spark", "oboInOwl:hasExactSynonym")))
    assert(lms.filter(col("id") === "0000123" && col("predicate") === "rdfs:label").count() == 0)
    // no-meta node contributes ONLY its label (ner.py:105 skip)
    assert(byText.contains(("merge", "rdfs:label")))
    assert(lms.filter(col("id") === "0000124").count() == 1)
    // provenance = synonym xrefs (ner.py:112)
    val prov = lms.filter(col("text") === "trait").select("provenance").collect()(0).getSeq[String](0)
    assert(prov == Seq("PATO:0000001"))
  }

  test("closure T2: descendants exclude the seed (networkx nx.ancestors semantics)") {
    val dag = GraphStandardizer.subClassOfEdges(edges)
    val seeds = spark.createDataFrame(Seq(Tuple1("PATO:0000117"))).toDF("curie")
    val desc = Closure.descendants(dag, seeds).collect().map(_.getString(0)).toSet
    assert(desc == Set("PATO:0000118", "PATO:0000119")) // big, small — NOT size itself
  }

  test("closure from root covers everything below, still excluding seed") {
    val dag = GraphStandardizer.subClassOfEdges(edges)
    val seeds = spark.createDataFrame(Seq(Tuple1("PATO:0000001"))).toDF("curie")
    val desc = Closure.descendants(dag, seeds).collect().map(_.getString(0)).toSet
    assert(!desc.contains("PATO:0000001"))
    assert(desc.contains("PATO:0000118")) // two levels down
    assert(desc.contains("PATO:0000200")) // one level down
    assert(desc.size >= 13)
  }

  test("subset filter J1: lexicon restricted to closure") {
    val lms = LiteralMappings.fromNodes(nodes, "PATO")
    val dag = GraphStandardizer.subClassOfEdges(edges)
    val seeds = spark.createDataFrame(Seq(Tuple1("PATO:0000117"))).toDF("curie")
    val closure = Closure.descendants(dag, seeds)
      .withColumn("prefix", lit("PATO"))
      .withColumn("id", expr("substring(curie, 6)"))
    val subset = LiteralMappings.subset(lms, closure)
    val texts = subset.select("text").collect().map(_.getString(0)).toSet
    assert(texts == Set("big", "large", "huge", "small", "little"))
  }

  test("closure T2: a seed NESTED under another seed IS in the union (per-seed nx.ancestors)") {
    val dag = GraphStandardizer.subClassOfEdges(edges)
    // PATO:0000117 (size) is a descendant of the root PATO:0000001, so with
    // both as seeds the union of per-seed ancestors must CONTAIN 0000117
    // (round-1 anti-joined all seeds out and silently dropped it)
    val seeds = spark.createDataFrame(Seq(
      Tuple1("PATO:0000001"), Tuple1("PATO:0000117"))).toDF("curie")
    val desc = Closure.descendants(dag, seeds).collect().map(_.getString(0)).toSet
    assert(desc.contains("PATO:0000117"), "nested seed must be included")
    assert(!desc.contains("PATO:0000001"), "root seed reached by nobody stays excluded")
    assert(desc.contains("PATO:0000118"))
  }

  private def writeGraphDoc(name: String, json: String): String = {
    val p = java.nio.file.Paths.get(s"target/fixtures/$name")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    p.toString
  }

  test("P2 primary-graph guess: canonical PURL beats substring order (robot.py:71-75)") {
    // the import graph comes FIRST and its id CONTAINS 'pato' — a substring
    // guess picks it; the canonical-IRI guess must pick pato.owl
    val path = writeGraphDoc("multi_graph.json",
      """{"graphs":[
        |{"id":"http://purl.obolibrary.org/obo/pato/imports/pato-import.owl","lbl":"import","nodes":[],"edges":[]},
        |{"id":"http://purl.obolibrary.org/obo/pato.owl","lbl":"primary","nodes":[],"edges":[]}]}""".stripMargin)
    val gs = OboGraphReader.readGraphs(spark, path)
    val chosen = OboGraphReader.squeezeGraph(gs, Some("pato")).select("graph_id").collect()(0).getString(0)
    assert(chosen == "http://purl.obolibrary.org/obo/pato.owl")
    // no canonical match → lenient substring fallback still works
    val chosen2 = OboGraphReader.squeezeGraph(gs, Some("pato-import")).select("graph_id").collect()(0).getString(0)
    assert(chosen2.contains("pato-import"))
  }

  test("P4: sole graph missing id hard-errors without a source IRI (robot.py:345)") {
    val path = writeGraphDoc("missing_id.json",
      """{"graphs":[{"lbl":"anonymous","nodes":[],"edges":[]}]}""")
    val e = intercept[IllegalArgumentException] {
      OboGraphReader.readGraphs(spark, path).collect()
    }
    assert(e.getMessage.contains("robot.py:345"))
    // with a source IRI the same document repairs
    val repaired = OboGraphReader.readGraphs(spark, path, Some("http://x.org/onto.json"))
      .select("graph_id").collect()(0).getString(0)
    assert(repaired == "http://x.org/onto.json")
  }

  test("strict mode: unparseable values surface as typed errors; assert throws (ner.py:32)") {
    // the fixture deliberately carries an unparseable node IRI (P6 test above)
    val errs = GraphStandardizer.standardizationErrors(graphs, conv)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(errs.exists { case (kind, raw) => kind == "node_id" && raw.contains("unknown.example") })
    val ex = intercept[IllegalStateException] {
      GraphStandardizer.assertStandardizable(graphs, conv)
    }
    assert(ex.getMessage.contains("strict"))
    // a fully-standardizable document passes the assertion
    val cleanPath = writeGraphDoc("clean_graph.json",
      """{"graphs":[{"id":"http://purl.obolibrary.org/obo/pato.owl",
        |"nodes":[{"id":"http://purl.obolibrary.org/obo/PATO_0000001","lbl":"quality"}],
        |"edges":[{"sub":"http://purl.obolibrary.org/obo/PATO_0000118","pred":"is_a",
        |          "obj":"http://purl.obolibrary.org/obo/PATO_0000001"}]}]}""".stripMargin)
    GraphStandardizer.assertStandardizable(OboGraphReader.readGraphs(spark, cleanPath), conv)
    // edge_pred strict failure = a predicate IRI the converter cannot
    // compress (normalize_predicate passes it through, so the lenient path
    // ships the raw string — strict mode must SEE it)
    val badPredPath = writeGraphDoc("bad_pred_graph.json",
      """{"graphs":[{"id":"http://purl.obolibrary.org/obo/pato.owl",
        |"nodes":[{"id":"http://purl.obolibrary.org/obo/PATO_0000001","lbl":"quality"}],
        |"edges":[{"sub":"http://purl.obolibrary.org/obo/PATO_0000118",
        |          "pred":"http://unknown.example/bogusPredicate",
        |          "obj":"http://purl.obolibrary.org/obo/PATO_0000001"}]}]}""".stripMargin)
    val predErrs = GraphStandardizer.standardizationErrors(
        OboGraphReader.readGraphs(spark, badPredPath), conv)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(predErrs.contains(("edge_pred", "http://unknown.example/bogusPredicate")), predErrs.toSeq)
    // shorthand predicates stay lenient in both modes
    assert(!predErrs.exists(_._2 == "is_a"))
  }

  test("equivalentNodesSets: sets far beyond the old 10k cap merge every member") {
    val n = 10500
    val ids = (0 until n)
      .map(i => f""""http://purl.obolibrary.org/obo/PATO_$i%07d"""").mkString(",")
    val p = writeGraphDoc("big_ens_graph.json",
      s"""{"graphs":[{"id":"http://purl.obolibrary.org/obo/pato.owl",
         |"nodes":[],"edges":[],
         |"equivalentNodesSets":[{"nodeIds":[$ids]}]}]}""".stripMargin)
    val edges = GraphStandardizer.equivalentNodeEdges(OboGraphReader.readGraphs(spark, p), conv)
    // star topology: one edge per non-first member — nothing silently dropped
    assert(edges.count() == (n - 1).toLong)
  }

  test("connected components J3: xref links collapse to min curie") {
    val xrefEdges = spark.createDataFrame(Seq(
      ("PATO:0000118", "OTHER:123"),
      ("OTHER:123", "ZZZ:9"),
      ("AAA:1", "BBB:2"))).toDF("a", "b")
    val cc = Closure.connectedComponents(xrefEdges)
    val m = cc.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("ZZZ:9") == "OTHER:123")
    assert(m("PATO:0000118") == "OTHER:123")
    assert(m("BBB:2") == "AAA:1")
  }

  test("P5 raw-document correction: value-for-val, synonymType, edge meta, logicalDefinitionAxioms") {
    val json =
      """{"graphs":[{"id":"http://purl.obolibrary.org/obo/pato.owl",
        |  "meta":{"basicPropertyValues":[
        |    {"pred":"http://www.w3.org/2002/07/owl#versionIRI",
        |     "value":"http://purl.obolibrary.org/obo/pato/releases/2099-01-01/pato.owl"}]},
        |  "nodes":[
        |    {"id":"http://purl.obolibrary.org/obo/PATO_0000001","lbl":"quality",
        |     "meta":{"xrefs":[{"value":"PATO:0000999"}],
        |             "synonyms":[{"val":"trait","pred":"hasExactSynonym",
        |                          "synonymType":"http://purl.obolibrary.org/obo/OMO_0003000"}]}}],
        |  "edges":[
        |    {"sub":"http://purl.obolibrary.org/obo/PATO_0000001","pred":"is_a",
        |     "obj":"http://purl.obolibrary.org/obo/PATO_0000002","meta":null},
        |    {"sub":"http://purl.obolibrary.org/obo/PATO_0000003","pred":"is_a",
        |     "obj":"http://purl.obolibrary.org/obo/PATO_0000001",
        |     "meta":{"basicPropertyValues":[{"pred":"source","value":"curated"}]}}],
        |  "logicalDefinitionAxioms":[
        |    {"definedClassId":"http://purl.obolibrary.org/obo/PATO_0000003",
        |     "genusIds":["http://purl.obolibrary.org/obo/PATO_0000001"],
        |     "restrictions":[{"propertyId":"http://purl.obolibrary.org/obo/RO_1",
        |                      "fillerId":"http://purl.obolibrary.org/obo/PATO_0000002"}]}]}]}
        |""".stripMargin
    val p = java.nio.file.Paths.get("target/fixtures/p5_deviations.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    val g = OboGraphReader.readGraphs(spark, p.toString)

    // versionIRI property value spelled `value` still yields the version
    val ver = g.select(OboGraphReader.versionColumn.as("v")).collect()(0).getString(0)
    assert(ver.contains("2099-01-01"))

    val n = GraphStandardizer.standardizeNodes(g, conv, Some("PATO")).collect()(0)
    // xref spelled `value` standardized like `val`
    assert(n.getSeq[String](n.fieldIndex("xrefs")) == Seq("PATO:0000999"))
    // synonymType passes through into the standardized synonym struct
    val syn = n.getSeq[org.apache.spark.sql.Row](n.fieldIndex("synonyms")).head
    assert(syn.getAs[String]("text") == "trait")
    assert(syn.getAs[String]("synonymType") == "http://purl.obolibrary.org/obo/OMO_0003000")

    // edges with null or populated meta standardize identically (meta carried, unconsumed)
    val e = GraphStandardizer.standardizeEdges(g, conv)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(e == Set(
      ("PATO:0000001", graft.model.Vocab.SubClassOf, "PATO:0000002"),
      ("PATO:0000003", graft.model.Vocab.SubClassOf, "PATO:0000001")))

    // logicalDefinitionAxioms parsed and carried on the graph row
    val lda = g.select(explode(col("logicalDefinitionAxioms")).as("l"))
      .select(col("l.definedClassId"), col("l.genusIds"), col("l.restrictions"))
      .collect()(0)
    assert(lda.getString(0).endsWith("PATO_0000003"))
    assert(lda.getSeq[String](1).head.endsWith("PATO_0000001"))
  }

  test("connected components: >50-diameter chain converges (O(log n) star rounds)") {
    // a 400-node path — plain min-label propagation needs ~400 rounds and
    // would have returned silently-truncated labels at maxIter=50 (round-2
    // verdict item 1); large-star/small-star contracts it in ~log2(400) rounds
    val n = 400
    val chain = spark.createDataFrame(
      (0 until n - 1).map(i => (f"N$i%05d", f"N${i + 1}%05d"))).toDF("a", "b")
    val labels = Closure.connectedComponents(chain, driverLimit = 0)
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(labels.length == n)
    assert(labels.forall(_._2 == "N00000"), labels.filter(_._2 != "N00000").take(3).mkString(","))
    // isolated self-loop node keeps membership with itself as the component
    val selfOnly = Closure.connectedComponents(
      spark.createDataFrame(Seq(("X:1", "X:1"), ("A:1", "B:2"))).toDF("a", "b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(selfOnly == Map("X:1" -> "X:1", "A:1" -> "A:1", "B:2" -> "A:1"))
  }

  test("connected components: star algorithm == driver union-find on random graphs") {
    for (seed <- Seq(1, 7, 42)) {
      val rng = new scala.util.Random(seed)
      val n = 800
      val edges = (0 until 1200).map { _ =>
        (f"V${rng.nextInt(n)}%04d", f"V${rng.nextInt(n)}%04d")
      }
      val got = Closure.connectedComponents(
          spark.createDataFrame(edges).toDF("a", "b"), driverLimit = 0)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val want = graft.operators.DriverUnionFind.components(edges.iterator)(
        (x: String, y: String) => if (x <= y) x else y)
      assert(got == want, s"seed=$seed mismatch: ${(got.toSet -- want.toSet).take(3)}")
    }
  }

  test("connected components: superseded per-round checkpoints are released") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = spark.createDataFrame(
      (0 until 120).map(i => (f"C$i%05d", f"C${i + 1}%05d"))).toDF("a", "b")
    val labels = Closure.connectedComponents(chain, driverLimit = 0).collect()
    assert(labels.forall(_.getString(1) == "C00000"))
    // only the result-backing checkpoints may remain (node set + final star
    // forest); every per-round large/next snapshot must have been unpersisted
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 2, s"leaked ${leaked.size} checkpointed RDDs across CC rounds")
  }

  test("connected components: non-convergence fails loudly, never wrong labels") {
    val chain = spark.createDataFrame(
      (0 until 64).map(i => (f"N$i%05d", f"N${i + 1}%05d"))).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Closure.connectedComponents(chain, maxIter = 1, driverLimit = 0).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("closure cost-switch: driver branches == distributed branches (r7)") {
    // descendants: driver BFS (default limit) vs the iterative join loop
    // (forced via driverLimit = 0) on a DAG with a diamond and a nested seed
    val dag = spark.createDataFrame(Seq(
      ("B", "A"), ("C", "A"), ("D", "B"), ("D", "C"), ("E", "D"),
      ("G", "F"), ("A", "R"))).toDF("subj", "obj")
    val seeds = spark.createDataFrame(Seq(Tuple1("A"), Tuple1("R"))).toDF("curie")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getString(0)).toSet
    val drv = set(Closure.descendants(dag, seeds))
    val dst = set(Closure.descendants(dag, seeds, driverLimit = 0))
    assert(drv == dst, s"descendants driver/distributed diverge: $drv vs $dst")
    assert(drv == Set("A", "B", "C", "D", "E")) // nested seed A included; F/G/R not

    // connected components: driver union-find (default) vs star contraction
    // (forced) on a mixed graph incl. an isolated self-loop
    val ccEdges = spark.createDataFrame(Seq(
      ("N2", "N1"), ("N3", "N2"), ("X", "X"), ("Q", "P"))).toDF("a", "b")
    def ccMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val ccDrv = ccMap(Closure.connectedComponents(ccEdges))
    val ccDst = ccMap(Closure.connectedComponents(ccEdges, driverLimit = 0))
    assert(ccDrv == ccDst, s"CC driver/distributed diverge: $ccDrv vs $ccDst")
    assert(ccDrv == Map("N1" -> "N1", "N2" -> "N1", "N3" -> "N1",
      "X" -> "X", "P" -> "P", "Q" -> "P"))
  }
}
