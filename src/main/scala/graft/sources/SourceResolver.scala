package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Cascading multi-format source resolution (SURVEY S6 — robot.py:122-188):
 * given an ordered list of candidate sources for an ontology, try each in
 * order, first success wins; every failure is RECORDED (never thrown) and the
 * overall result may be empty. Preserves the reference's cost-based access
 * path: JSON (cheap native parse) before any converted format.
 *
 * Driver-side by design — ontology documents are tiny next to the corpus
 * (robot.py's ROBOT-subprocess conversion path is out of engine scope per
 * SURVEY S3; an OWL source here would be pre-converted upstream).
 */
object SourceResolver {

  sealed trait SourceSpec { def path: String; def kind: String }
  final case class JsonSource(path: String) extends SourceSpec { val kind = "obograph-json" }
  /** Placeholder for formats needing driver-side pre-conversion (OWL/OBO). */
  final case class UnsupportedSource(path: String, kind: String) extends SourceSpec

  final case class Resolution(
      graphs: Option[DataFrame],
      resolvedFrom: Option[SourceSpec],
      messages: Seq[String]) // ParseResults.messages analogue (robot.py:44-47)

  def resolve(spark: SparkSession, sources: Seq[SourceSpec],
              sourceIri: Option[String] = None): Resolution = {
    val messages = scala.collection.mutable.ArrayBuffer[String]()
    sources.foreach {
      case s @ JsonSource(path) =>
        try {
          val df = OboGraphReader.readGraphs(spark, path, sourceIri)
          if (df.limit(1).count() > 0) return Resolution(Some(df), Some(s), messages.toSeq)
          messages += s"[${s.kind}] $path parsed but contained no graphs"
        } catch {
          case e: Exception =>
            // fallback-and-record, never fail (robot.py:138-147 semantics)
            messages += s"[${s.kind}] $path failed: ${e.getMessage}"
        }
      case s: UnsupportedSource =>
        messages += s"[${s.kind}] ${s.path} skipped: format requires driver-side pre-conversion"
    }
    Resolution(None, None, messages.toSeq) // empty result, diagnostics kept (robot.py:188)
  }
}
