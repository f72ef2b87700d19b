package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface test: the scalar family must work from plain spark.sql. */
class ExtensionsSpec extends AnyFunSuite {

  test("functions registered via SparkSessionExtensions work from SQL") {
    // extensions bind at session BUILD — getOrCreate would silently return
    // the shared test session, so detach it first and restore after
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions(graft.fixtures.MiniOntology.converter))
      .config(graft.SparkDefaults.ExcludedRulesKey, graft.SparkDefaults.ExcludedRules)
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT compress_iri('http://purl.obolibrary.org/obo/PATO_77') AS c,
          |       expand_curie('PATO:77') AS e,
          |       normalize_prefix('pato') AS p,
          |       normalize_predicate('is_a') AS pr,
          |       standardize_id('pato:9') AS sid,
          |       simhash64(array('a','b')) = simhash64(array('a','b')) AS stable
          |""".stripMargin).collect()(0)
      assert(r.getString(0) == "PATO:77")
      assert(r.getString(1) == "http://purl.obolibrary.org/obo/PATO_77")
      assert(r.getString(2) == "PATO")
      assert(r.getString(3) == "rdfs:subClassOf")
      assert(r.getString(4) == "PATO:9")
      assert(r.getBoolean(5))
      // null-in → null-out through SQL
      assert(s.sql("SELECT compress_iri(CAST(NULL AS STRING))").collect()(0).isNullAt(0))
      // sketch family + foldable int args
      val w = s.sql(
        """SELECT size(winnowing_sketch('the quick brown fox jumps', 8, 4)) AS n,
          |       winnowing_sketch('abc') = winnowing_sketch('abc') AS st,
          |       simhash64_from_hashes(array(1L, 2L, 3L)) =
          |         simhash64_from_hashes(array(1L, 2L, 3L)) AS sh
          |""".stripMargin).collect()(0)
      assert(w.getInt(0) > 0 && w.getBoolean(1) && w.getBoolean(2))
      // the custom operator strategy is injected too: construct the logical
      // node DIRECTLY (bypassing detectTriples' ensureRegistered fallback) —
      // planning succeeds only via the extension-injected strategy
      assert(s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental.extraStrategies.isEmpty, "test precondition: no manual registration")
      val tr = graft.fixtures.Transcripts.synthetic(s, 20)
      val ctx = graft.pipeline.KgPipeline.prepare(s,
        graft.fixtures.MiniOntology.writeTo("target/fixtures"))
      import org.apache.spark.sql.graftshim.InternalRowShim
      val node = graft.plans.DetectTriplesNode(
        InternalRowShim.logicalPlan(
          tr.select(org.apache.spark.sql.functions.col("conv_id"),
            org.apache.spark.sql.functions.col("turn_idx"),
            org.apache.spark.sql.functions.col("text"))),
        ctx.grounder, None)
      assert(InternalRowShim.logicalDf(s, node).count() > 0)
      assert(s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental.extraStrategies.isEmpty, "planning must not have needed the fallback")

      // analysis-time typing: a mistyped call fails ANALYSIS, not every task
      intercept[org.apache.spark.sql.AnalysisException](
        s.sql("SELECT simhash64(42)").collect())
      intercept[Exception]( // arity validated at resolution
        s.sql("SELECT simhash64()").collect())
      // friendly implicit casts for the string family, like built-ins
      assert(s.sql("SELECT compress_iri(42)").collect()(0).isNullAt(0))

      // converter binding is PER INSTANCE: constructing another extensions
      // object (different converter) must not swap this session's functions
      new graft.plans.GraftExtensions(new graft.curie.Converter(
        Seq(graft.model.PrefixRecord("ZZZ", "http://zzz.example/"))))
      assert(s.sql("SELECT compress_iri('http://purl.obolibrary.org/obo/PATO_77')")
        .collect()(0).getString(0) == "PATO:77")
    } finally {
      // do NOT stop the context (shared JVM); just restore the prior session
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
